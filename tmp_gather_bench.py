"""Measure gather formulations honestly (chained, scalar fetch, slope)."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 832
PB = 16          # pair-batch (2N*B)
C = 4            # rgb + depth
L = PB * C       # 64 lanes
N = H * W        # out pixels per pair-batch elem

rng = np.random.RandomState(0)

def timed(name, fn, *args, n_small=2, n_big=12):
    """Chained calls, scalar fetch; slope between n_small and n_big."""
    f = jax.jit(fn)
    out = f(*args)
    s0 = jnp.asarray(out).ravel()[0]  # force one exec (compile)
    float(s0)
    def chain(n):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        a = args[0]
        for i in range(n):
            o = f(a + acc.astype(a.dtype) * 0, *args[1:])   # chain dependence
            acc = acc + jnp.asarray(o).ravel()[0].astype(jnp.float32)
        float(acc)
        return time.perf_counter() - t0
    t_small, t_big = chain(n_small), chain(n_big)
    per = (t_big - t_small) / (n_big - n_small)
    print(f"{name}: {per*1e3:8.3f} ms/call", flush=True)
    return per

which = sys.argv[1] if len(sys.argv) > 1 else "all"

# ---- 1. current flat per-pair gather (what grid_sample does today) ----
if which in ("all", "flat"):
    img = jnp.asarray(rng.rand(PB, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (PB, N, 1)).astype(np.int32))
    timed("flat  taa [PB,N,C] idx [PB,N,1]", lambda a, i: jnp.take_along_axis(a, i, axis=1), img, idx)

# ---- 2. XLA columnar gather: [S, 64] lanes ----
if which in ("all", "col"):
    src = jnp.asarray(rng.rand(N, L).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (N, L)).astype(np.int32))
    timed("xla columnar taa [S,64] idx [S,64]", lambda a, i: jnp.take_along_axis(a, i, axis=0), src, idx)

# ---- 3. pallas equal-shape ax0 gather, S sweep ----
def pallas_gather_ax0(S, lanes=128):
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)
    def call(s, i):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((S, lanes), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i)
    return call

if which in ("all", "pallas"):
    for S in (256, 1024, 4096, 16384):
        src = jnp.asarray(rng.rand(S, 128).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, S, (S, 128)).astype(np.int32))
        per = timed(f"pallas ax0 S={S:5d} [S,128]", pallas_gather_ax0(S), src, idx)
        vals = S * 128
        print(f"      -> {vals/per/1e9:.2f} G gathered vals/s", flush=True)
