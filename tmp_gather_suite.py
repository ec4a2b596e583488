"""All gather variants, one process, safe ordering, flushed prints."""
import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 832
N = H * W
rng = np.random.RandomState(0)

def timed(name, make_loop):
    try:
        f2 = jax.jit(functools.partial(make_loop, 2))
        t0 = time.perf_counter(); v = float(f2()); t_compile = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2()); t2 = time.perf_counter() - t0
        # choose n_big so the run costs ~5-20s of device time
        est = max(t2 / 2, 1e-4)
        n_big = int(max(8, min(128, 12.0 / est)))
        fb = jax.jit(functools.partial(make_loop, n_big))
        float(fb())  # compile
        t0 = time.perf_counter(); float(fb()); tb = time.perf_counter() - t0
        per = (tb - t2) / (n_big - 2)
        print(f"[{name}] {per*1e3:9.3f} ms/call  (n_big={n_big}, t2={t2:.2f}s tb={tb:.2f}s compile={t_compile:.0f}s)", flush=True)
        return per
    except Exception as e:
        print(f"[{name}] FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None

# 1. XLA columnar taa [N, 64]
src = jnp.asarray(rng.rand(N, 64).astype(np.float32))
idx0 = jnp.asarray(rng.randint(0, N, (N, 64)).astype(np.int32))
def loop_col(n):
    def body(k, acc):
        g = jnp.take_along_axis(src, (idx0 + k) % N, axis=0)
        return acc + g[0, 0]
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))
per = timed("xla columnar [N,64]", loop_col)
if per: print(f"    -> {N*64/per/1e9:.2f} G vals/s", flush=True)

# 2-4. pallas ax0 gathers
def pallas_ax0(S):
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)
    def call(s, i):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i)
    s_ = jnp.asarray(rng.rand(S, 128).astype(np.float32))
    i_ = jnp.asarray(rng.randint(0, S, (S, 128)).astype(np.int32))
    def loop(n):
        def body(k, acc):
            g = call(s_, (i_ + k) % S)
            return acc + g[0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return loop

for S in (1024, 4096, 13312):
    per = timed(f"pallas ax0 [S={S},128]", pallas_ax0(S))
    if per: print(f"    -> {S*128/per/1e9:.2f} G vals/s", flush=True)

# 5. pallas ax1 lane gather [128, 832]
def pallas_ax1(S):
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)
    def call(s, i):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((128, S), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i)
    s_ = jnp.asarray(rng.rand(128, S).astype(np.float32))
    i_ = jnp.asarray(rng.randint(0, S, (128, S)).astype(np.int32))
    def loop(n):
        def body(k, acc):
            g = call(s_, (i_ + k) % S)
            return acc + g[0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return loop
per = timed("pallas ax1 [128,S=832]", pallas_ax1(832))
if per: print(f"    -> {832*128/per/1e9:.2f} G vals/s", flush=True)

# 6. flat baseline (slowest — last)
img = jnp.asarray(rng.rand(16, N, 1).astype(np.float32))
fidx = jnp.asarray(rng.randint(0, N, (16, N, 1)).astype(np.int32))
def loop_flat(n):
    def body(k, acc):
        g = jnp.take_along_axis(img, (fidx + k) % N, axis=1)
        return acc + g[0, 0, 0]
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))
per = timed("flat taa [16,N,1]", loop_flat)
if per: print(f"    -> {16*N/per/1e9:.3f} G vals/s", flush=True)
print("SUITE DONE", flush=True)
