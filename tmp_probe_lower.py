import numpy as np, jax, jax.numpy as jnp, traceback
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, S, K, L, fn, ax0=True, idx_dtype=np.int32):
    if ax0:
        src = jax.ShapeDtypeStruct((S, L), jnp.float32)
        idx = jax.ShapeDtypeStruct((K, L), idx_dtype)
        out_shape = (K, L)
    else:
        src = jax.ShapeDtypeStruct((L, S), jnp.float32)
        idx = jax.ShapeDtypeStruct((L, K), idx_dtype)
        out_shape = (L, K)
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = fn(src_ref[:], idx_ref[:])
    call = lambda s, i: pl.pallas_call(kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i)
    try:
        jax.jit(call).lower(src, idx)
        print(f"LOWER-OK   {name}")
    except Exception:
        lines = [l for l in traceback.format_exc().strip().split("\n") if l.strip()]
        # find the most informative line
        info = ""
        for l in reversed(lines):
            if "NotImplemented" in l or "Assertion" in l or "Unsupported" in l or "error" in l.lower():
                info = l.strip()[:220]; break
        print(f"LOWER-FAIL {name}: {info or lines[-1][:220]}")

taa0 = lambda s, i: jnp.take_along_axis(s, i, axis=0)
taa1 = lambda s, i: jnp.take_along_axis(s, i, axis=1)

probe("ax0 S=8",      8, 256, 128, taa0)
probe("ax0 S=32",    32, 256, 128, taa0)
probe("ax0 S=256",  256, 256, 128, taa0)
probe("ax0 S=26624", 26624, 6656, 128, taa0)
probe("ax1 S=128 K=128", 128, 128, 8, taa1, ax0=False)
probe("ax1 S=832 K=832", 832, 832, 8, taa1, ax0=False)
probe("ax1 L=256 S=832", 832, 832, 256, taa1, ax0=False)
# 3D batched along leading dim
def taa_mid(s, i):
    return jnp.take_along_axis(s, i, axis=1)
def probe3(name, B, S, K, L):
    src = jax.ShapeDtypeStruct((B, S, L), jnp.float32)
    idx = jax.ShapeDtypeStruct((B, K, L), jnp.int32)
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)
    call = lambda s, i: pl.pallas_call(kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i)
    try:
        jax.jit(call).lower(src, idx)
        print(f"LOWER-OK   {name}")
    except Exception:
        lines = [l for l in traceback.format_exc().strip().split("\n") if l.strip()]
        print(f"LOWER-FAIL {name}: {lines[-1][:220]}")
probe3("3D ax1 B=4 S=256", 4, 256, 256, 128)
