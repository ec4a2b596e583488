"""MXU (one-hot contraction) sampler vs the torch-exact gather sampler.

The gather implementation is itself golden-tested against torch CPU
(test_grid_sample.py); here the MXU formulation is held to it in value and
gradient, including out-of-frame coordinates, border padding, the band
fallback path, and odd shapes that exercise chunk padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc_sfmlearner_release_tpu.ops.grid_sample import grid_sample
from sc_sfmlearner_release_tpu.ops.warp_mxu import grid_sample_mxu


def _random_case(seed, b=2, h=24, w=40, c=3, spread=1.3):
    rng = np.random.RandomState(seed)
    img = rng.rand(b, h, w, c).astype(np.float32)
    # coords spanning beyond [-1, 1] to hit invalid taps
    coords = (rng.rand(b, h, w, 2).astype(np.float32) * 2 - 1) * spread
    return jnp.asarray(img), jnp.asarray(coords)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_matches_gather_fp32(padding_mode):
    img, coords = _random_case(0)
    ref = grid_sample(img, coords, padding_mode=padding_mode)
    got = grid_sample_mxu(img, coords, padding_mode=padding_mode,
                          precision="fp32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_mode_close():
    img, coords = _random_case(1)
    ref = grid_sample(img, coords, padding_mode="zeros")
    got = grid_sample_mxu(img, coords, padding_mode="zeros", precision="bf16")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)


def test_band_fallback_exact():
    # coords whose rows are fully scattered over the source height force the
    # full-height fallback inside every chunk.
    img, coords = _random_case(2, h=64, w=64)
    ref = grid_sample(img, coords, padding_mode="zeros")
    got = grid_sample_mxu(img, coords, padding_mode="zeros",
                          band=8, rows_per_chunk=4, precision="fp32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_identity_warp_roundtrip():
    img, _ = _random_case(3)
    b, h, w, _ = img.shape
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2 - 1
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2 - 1
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.broadcast_to(jnp.stack([gx, gy], -1), (b, h, w, 2))
    got = grid_sample_mxu(img, coords, precision="fp32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(img),
                               rtol=1e-5, atol=1e-5)


def test_odd_shapes_chunk_padding():
    # h*w not a multiple of the chunk size exercises the padded tail.
    img, coords = _random_case(4, b=1, h=7, w=13, c=2)
    ref = grid_sample(img, coords, padding_mode="zeros")
    got = grid_sample_mxu(img, coords, padding_mode="zeros",
                          rows_per_chunk=3, precision="fp32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_gradients_match_gather(padding_mode):
    img, coords = _random_case(5, b=1, h=16, w=20, c=1)

    def loss_ref(i, c):
        return jnp.sum(grid_sample(i, c, padding_mode=padding_mode) ** 2)

    def loss_mxu(i, c):
        return jnp.sum(
            grid_sample_mxu(i, c, padding_mode=padding_mode,
                            precision="fp32") ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(img, coords)
    g_mxu = jax.grad(loss_mxu, argnums=(0, 1))(img, coords)
    # operand (image) gradients round to bf16 at the cast boundary (~0.4%,
    # standard bf16-training behavior); coordinate gradients are fp32-tight.
    np.testing.assert_allclose(np.asarray(g_mxu[0]), np.asarray(g_ref[0]),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(g_mxu[1]), np.asarray(g_ref[1]),
                               rtol=1e-3, atol=1e-3)


def test_inverse_warp2_samplers_agree():
    from sc_sfmlearner_release_tpu.ops.geometry import inverse_warp2

    rng = np.random.RandomState(6)
    b, h, w = 2, 16, 24
    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    depth = jnp.asarray(1.0 + rng.rand(b, h, w, 1).astype(np.float32))
    ref_depth = jnp.asarray(1.0 + rng.rand(b, h, w, 1).astype(np.float32))
    pose = jnp.asarray(rng.randn(b, 6).astype(np.float32) * 0.02)
    k = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.broadcast_to(k, (b, 3, 3)).copy())

    out_g = inverse_warp2(img, depth, ref_depth, pose, intr, sampler="gather")
    out_m = inverse_warp2(img, depth, ref_depth, pose, intr, sampler="mxu")
    # image channel: bf16 sampling tolerance; depth channels: fp32-tight
    np.testing.assert_allclose(np.asarray(out_m[0]), np.asarray(out_g[0]),
                               atol=2e-2)
    for i in (1, 2, 3):
        np.testing.assert_allclose(np.asarray(out_m[i]), np.asarray(out_g[i]),
                                   rtol=1e-5, atol=1e-5)
