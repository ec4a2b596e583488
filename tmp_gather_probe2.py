import numpy as np, jax, jax.numpy as jnp, traceback
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_variant(name, S, K, L, fn, axis0=True):
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = fn(src_ref[:], idx_ref[:])
    rng = np.random.RandomState(0)
    if axis0:
        src = jnp.asarray(rng.rand(S, L).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, S, (K, L)).astype(np.int32))
        out_shape = (K, L)
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=0)
    else:
        src = jnp.asarray(rng.rand(L, S).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, S, (L, K)).astype(np.int32))
        out_shape = (L, K)
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, src.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
        ok = np.allclose(np.asarray(out), ref)
        print(f"{name}: OK correct={ok}")
        return True
    except Exception as e:
        msg = traceback.format_exc().strip().split("\n")
        tail = [l for l in msg if l.strip()][-3:]
        print(f"{name}: FAIL {' | '.join(t.strip()[:120] for t in tail)}")
        return False

taa0 = lambda s, i: jnp.take_along_axis(s, i, axis=0)
taa1 = lambda s, i: jnp.take_along_axis(s, i, axis=1)

# sublane gather, varying sublane count
for S in (8, 32, 256, 1024, 26624):
    try_variant(f"axis0 take_along_axis S={S} K=256", S, 256, 128, taa0)
# lane gather
for S in (128, 832, 1024):
    try_variant(f"axis1(lane) take_along_axis S={S} K={S}", S, S, 8, taa1, axis0=False)
