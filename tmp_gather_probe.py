import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, K, L = 26624, 6656, 128   # band*W sublanes, out pixels per block, lanes

def kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)

@jax.jit
def gather_pallas(src, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, L), src.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)

rng = np.random.RandomState(0)
src = jnp.asarray(rng.rand(S, L).astype(np.float32))
idx = jnp.asarray(rng.randint(0, S, (K, L)).astype(np.int32))

ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=0)
try:
    out = gather_pallas(src, idx)
    ok = np.allclose(np.asarray(out), ref)
    print("take_along_axis axis=0 in pallas: COMPILES, correct =", ok)
    # timing: chain many gathers, fetch scalar
    @jax.jit
    def chain(src, idx, n):
        def body(i, acc):
            g = gather_pallas(src, (idx + i) % S)
            return acc + g[0, 0]
        return jax.lax.fori_loop(0, n, body, 0.0)
    for n in (10, 100, 1000):
        t0 = time.perf_counter()
        v = float(chain(src, idx, n))
        dt = time.perf_counter() - t0
        print(f"n={n}: {dt:.3f}s -> {dt/n*1e6:.1f} us/gather-call ({K*L} vals)")
except Exception as e:
    print("take_along_axis axis=0 FAILED:", type(e).__name__, str(e)[:500])
