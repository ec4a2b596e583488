"""Honest gather timings: in-graph fori_loop chains, scalar output, slope."""
import sys, time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 832
N = H * W
rng = np.random.RandomState(0)

def timed(name, make_loop, reps=(4, 32)):
    fs = {n: jax.jit(functools.partial(make_loop, n)) for n in reps}
    for n, f in fs.items():
        float(f())  # compile + settle
    t = {}
    for n, f in fs.items():
        t0 = time.perf_counter(); float(f()); t[n] = time.perf_counter() - t0
    n0, n1 = reps
    per = (t[n1] - t[n0]) / (n1 - n0)
    print(f"{name}: {per*1e3:9.3f} ms/call  (totals {t[n0]:.2f}s/{t[n1]:.2f}s)", flush=True)
    return per

which = sys.argv[1]

if which == "flat":
    img = jnp.asarray(rng.rand(16, N, 1).astype(np.float32))
    idx0 = jnp.asarray(rng.randint(0, N, (16, N, 1)).astype(np.int32))
    def loop(n):
        def body(k, acc):
            i = (idx0 + k) % N
            g = jnp.take_along_axis(img, i, axis=1)
            return acc + g[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    timed("flat taa [16,N,1] 1ch", loop)
elif which == "col":
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    src = jnp.asarray(rng.rand(N, L).astype(np.float32))
    idx0 = jnp.asarray(rng.randint(0, N, (N, L)).astype(np.int32))
    def loop(n):
        def body(k, acc):
            i = (idx0 + k) % N
            g = jnp.take_along_axis(src, i, axis=0)
            return acc + g[0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    timed(f"xla columnar taa [N,{L}]", loop)
elif which == "pallas":
    S = int(sys.argv[2])
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)
    def call(s, i):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i)
    src = jnp.asarray(rng.rand(S, 128).astype(np.float32))
    idx0 = jnp.asarray(rng.randint(0, S, (S, 128)).astype(np.int32))
    def loop(n):
        def body(k, acc):
            g = call(src, (idx0 + k) % S)
            return acc + g[0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    per = timed(f"pallas ax0 [S={S},128]", loop)
    print(f"      -> {S*128/per/1e9:.2f} G vals/s", flush=True)
elif which == "pallas_lane":
    S = int(sys.argv[2])  # lanes dimension gathered along axis=1, src [128, S]
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)
    def call(s, i):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((128, S), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i)
    src = jnp.asarray(rng.rand(128, S).astype(np.float32))
    idx0 = jnp.asarray(rng.randint(0, S, (128, S)).astype(np.int32))
    def loop(n):
        def body(k, acc):
            g = call(src, (idx0 + k) % S)
            return acc + g[0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    per = timed(f"pallas ax1 [128,S={S}]", loop)
    print(f"      -> {S*128/per/1e9:.2f} G vals/s", flush=True)
