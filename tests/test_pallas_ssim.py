"""Pallas fused-SSIM kernel: interpreter-mode value parity and VJP parity
with the XLA reference implementation (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from sc_sfmlearner_release_tpu.ops.pallas_ssim import (
    _forward,
    _fits_vmem,
    ssim_fused,
)
from sc_sfmlearner_release_tpu.ops.ssim import ssim as ssim_xla


def _pair(b=2, h=16, w=24, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    return x, y


def test_kernel_matches_xla_interpret():
    x, y = _pair()
    got = np.asarray(_forward(x, y, interpret=True))
    want = np.asarray(jax.jit(ssim_xla)(x, y))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_falls_back_off_tpu():
    """On CPU the public entry point must still be exact (XLA path)."""
    x, y = _pair(seed=1)
    got = np.asarray(jax.jit(ssim_fused)(x, y))
    want = np.asarray(jax.jit(ssim_xla)(x, y))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_vjp_matches_xla():
    x, y = _pair(seed=2)
    cot = jnp.asarray(np.random.RandomState(3).rand(*x.shape).astype(np.float32))

    def loss_fused(x, y):
        return jnp.sum(ssim_fused(x, y) * cot)

    def loss_xla(x, y):
        return jnp.sum(ssim_xla(x, y) * cot)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(x, y)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(x, y)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_vmem_budget_guard():
    assert _fits_vmem((16, 256, 832, 3))
    assert not _fits_vmem((1, 4096, 4096, 3))
