import sys, numpy as np, jax, jax.numpy as jnp, traceback
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
mode, S, K, L = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
rng = np.random.RandomState(0)
if mode == "ax0":
    src = jnp.asarray(rng.rand(S, L).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, S, (K, L)).astype(np.int32))
    fn = lambda s, i: jnp.take_along_axis(s, i, axis=0)
    out_shape = (K, L)
    ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=0)
else:
    src = jnp.asarray(rng.rand(L, S).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, S, (L, K)).astype(np.int32))
    fn = lambda s, i: jnp.take_along_axis(s, i, axis=1)
    out_shape = (L, K)
    ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
def kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = fn(src_ref[:], idx_ref[:])
try:
    out = pl.pallas_call(kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, src.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(src, idx)
    print(f"{mode} S={S} K={K} L={L}: OK correct={np.allclose(np.asarray(out), ref)}", flush=True)
except Exception:
    lines = [l for l in traceback.format_exc().strip().split("\n") if l.strip()]
    print(f"{mode} S={S} K={K} L={L}: FAIL  {lines[-1][:300]}", flush=True)
