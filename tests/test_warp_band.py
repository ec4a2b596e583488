"""Banded one-hot-matmul sampler vs the torch-exact gather sampler.

The gather implementation is golden-tested against torch CPU
(test_grid_sample.py); here the banded MXU formulation (ops/warp_band.py)
is held to it. For bf16-representable sources the band path is EXACT
(binary one-hots + fp32 VPU weights); the whole-call gather fallback is
exact by construction; fp32 sources recombine exactly through hi/lo
splitting. Gradients are checked for both the value path (depth) and the
coordinate path (pose/depth geometry).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc_sfmlearner_release_tpu.ops.grid_sample import grid_sample
from sc_sfmlearner_release_tpu.ops.warp_band import (
    grid_sample_band,
    split_hi_lo,
)


def _bf16_img(rng, shape):
    """Random image already exactly representable in bf16."""
    x = rng.rand(*shape).astype(np.float32)
    return jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32)


def _near_identity_coords(rng, b, h, w, dy_px=3.0, dx_px=40.0):
    """Coords displaced from identity by bounded pixel amounts."""
    ys = (np.arange(h, dtype=np.float32) + 0.5) / h * 2 - 1
    xs = (np.arange(w, dtype=np.float32) + 0.5) / w * 2 - 1
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    grid = np.broadcast_to(np.stack([gx, gy], -1), (b, h, w, 2)).copy()
    grid[..., 0] += (rng.rand(b, h, w) * 2 - 1) * (2 * dx_px / w)
    grid[..., 1] += (rng.rand(b, h, w) * 2 - 1) * (2 * dy_px / h)
    return jnp.asarray(grid.astype(np.float32))


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_exact_vs_gather_in_band(padding_mode):
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 32, 48, 3
    img = _bf16_img(rng, (b, h, w, c))
    coords = _near_identity_coords(rng, b, h, w, dy_px=3.0)
    ref = grid_sample(img, coords, padding_mode=padding_mode)
    got = grid_sample_band(img, coords, padding_mode=padding_mode,
                           band=16, rows_per_chunk=4)
    # 1-ulp fp32 association difference: the band path factors the y-weight
    # out of the two x-taps, the gather path multiplies per-tap products.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_out_of_frame_coords_exact():
    # Large displacements push taps out of frame: their weights must zero
    # out identically to the gather path (still in-band vertically thanks
    # to the out-of-frame escape in the guard).
    rng = np.random.RandomState(1)
    b, h, w, c = 2, 24, 40, 2
    img = _bf16_img(rng, (b, h, w, c))
    coords = (jnp.asarray(rng.rand(b, h, w, 2).astype(np.float32)) * 2 - 1)
    coords = coords * jnp.asarray([3.0, 0.05])  # wild x, near-center y
    ref = grid_sample(img, coords, padding_mode="zeros")
    got = grid_sample_band(img, coords, padding_mode="zeros",
                           band=48, rows_per_chunk=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_band_violation_falls_back_exact():
    # Vertically scattered coords violate a narrow band; the cond must
    # route the WHOLE call through the exact gather path.
    rng = np.random.RandomState(2)
    b, h, w, c = 1, 32, 16, 3
    img = _bf16_img(rng, (b, h, w, c))
    coords = jnp.asarray((rng.rand(b, h, w, 2).astype(np.float32) * 2 - 1)
                         * 0.95)
    ref = grid_sample(img, coords, padding_mode="zeros")
    got = grid_sample_band(img, coords, padding_mode="zeros",
                           band=8, rows_per_chunk=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_identity_roundtrip_odd_height():
    # h not a multiple of rows_per_chunk exercises the padded tail rows.
    rng = np.random.RandomState(3)
    b, h, w, c = 1, 29, 33, 2
    img = _bf16_img(rng, (b, h, w, c))
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2 - 1
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2 - 1
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.broadcast_to(jnp.stack([gx, gy], -1), (b, h, w, 2))
    got = grid_sample_band(img, coords, band=16, rows_per_chunk=4)
    # fp32 normalize/unnormalize round-trip leaves ~1e-7 tap weights on
    # the neighbors (the gather path does the same), so compare to both.
    np.testing.assert_allclose(np.asarray(got), np.asarray(img), atol=1e-5)
    ref = grid_sample(img, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_hi_lo_split_recovers_fp32():
    rng = np.random.RandomState(4)
    b, h, w = 1, 16, 24
    depth = jnp.asarray(1.0 + rng.rand(b, h, w, 1).astype(np.float32) * 50)
    coords = _near_identity_coords(rng, b, h, w, dy_px=2.0, dx_px=6.0)
    ref = grid_sample(depth, coords, padding_mode="zeros")
    d2 = grid_sample_band(split_hi_lo(depth), coords, band=16,
                          rows_per_chunk=4)
    got = d2[..., :1] + d2[..., 1:]
    # hi samples exactly; lo (|x| * 2^-9) rounds once more to bf16 in the
    # matmul, so the recombined value carries bf16^2 ~ 4e-6 RELATIVE error.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # ...and is far tighter than sampling the raw fp32 depth in bf16.
    raw = grid_sample_band(depth, coords, band=16, rows_per_chunk=4)
    err_hi_lo = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    err_raw = np.max(np.abs(np.asarray(raw) - np.asarray(ref)))
    assert err_hi_lo < err_raw / 10


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_gradients_match_gather(padding_mode):
    rng = np.random.RandomState(5)
    b, h, w, c = 1, 16, 20, 1
    img = _bf16_img(rng, (b, h, w, c))
    coords = _near_identity_coords(rng, b, h, w, dy_px=2.0, dx_px=4.0)

    def loss_ref(i, co):
        return jnp.sum(grid_sample(i, co, padding_mode=padding_mode) ** 2)

    def loss_band(i, co):
        return jnp.sum(
            grid_sample_band(i, co, padding_mode=padding_mode,
                             band=12, rows_per_chunk=4) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(img, coords)
    g_band = jax.grad(loss_band, argnums=(0, 1))(img, coords)
    # Value gradients transpose through the binary one-hot matmul: the
    # cotangent rounds to bf16 once (standard bf16-training behavior).
    np.testing.assert_allclose(np.asarray(g_band[0]), np.asarray(g_ref[0]),
                               rtol=1e-2, atol=1e-2)
    # Coordinate gradients stay on the fp32 VPU weight path.
    np.testing.assert_allclose(np.asarray(g_band[1]), np.asarray(g_ref[1]),
                               rtol=1e-3, atol=1e-3)


def test_inverse_warp2_band_sampler_agrees():
    from sc_sfmlearner_release_tpu.ops.geometry import inverse_warp2

    rng = np.random.RandomState(6)
    b, h, w = 2, 32, 40
    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    depth = jnp.asarray(2.0 + rng.rand(b, h, w, 1).astype(np.float32))
    ref_depth = jnp.asarray(2.0 + rng.rand(b, h, w, 1).astype(np.float32))
    pose = jnp.asarray(rng.randn(b, 6).astype(np.float32) * 0.02)
    k = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.broadcast_to(k, (b, 3, 3)).copy())

    out_g = inverse_warp2(img, depth, ref_depth, pose, intr, sampler="gather")
    out_b = inverse_warp2(img, depth, ref_depth, pose, intr, sampler="band16")
    # image: one bf16 source rounding; valid/computed: identical math;
    # depth: hi/lo fp32 recombination.
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_g[0]),
                               atol=4e-3)
    np.testing.assert_array_equal(np.asarray(out_b[1]), np.asarray(out_g[1]))
    np.testing.assert_allclose(np.asarray(out_b[2]), np.asarray(out_g[2]),
                               rtol=0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_b[3]), np.asarray(out_g[3]))


def test_pairwise_loss_and_grads_close():
    """Full pairwise loss + pose/depth gradients: band vs gather."""
    from sc_sfmlearner_release_tpu.ops.losses import pairwise_loss

    rng = np.random.RandomState(7)
    b, h, w = 2, 32, 48
    tgt = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    ref = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    k = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.broadcast_to(k, (b, 3, 3)).copy())

    def loss(pose, td, rd, sampler):
        photo, geom = pairwise_loss(tgt, ref, td, rd, pose, intr,
                                    sampler=sampler)
        return photo + 0.5 * geom

    pose = jnp.asarray(rng.randn(b, 6).astype(np.float32) * 0.01)
    td = jnp.asarray(2.0 + rng.rand(b, h, w, 1).astype(np.float32))
    rd = jnp.asarray(2.0 + rng.rand(b, h, w, 1).astype(np.float32))

    for smp in ("band", "band16"):
        lg, gg = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            pose, td, rd, "gather")
        lb, gb = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            pose, td, rd, smp)
        np.testing.assert_allclose(float(lb), float(lg), rtol=2e-3)
        for a, b_ in zip(gg, gb):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=3e-2, atol=3e-4)


# ---- tap-separated packed variant (the production training warp) ----


def test_packed_taps_matches_gather_values():
    from sc_sfmlearner_release_tpu.ops.warp_band import (
        warp_sample_band_packed,
    )

    rng = np.random.RandomState(8)
    b, h, w, c = 2, 32, 48, 4
    img = _bf16_img(rng, (b, h, w, c))
    coords = _near_identity_coords(rng, b, h, w, dy_px=3.0)
    for pm in ("zeros", "border"):
        ref = grid_sample(img, coords, padding_mode=pm)
        got = warp_sample_band_packed(img, coords, padding_mode=pm,
                                      band=16, rows_per_chunk=4,
                                      grad_channels=2)
        # atol 5e-6: under the full-optimization XLA pipeline
        # (SCSFM_TEST_FULL_OPT=1) the fp32 weight combine reassociates,
        # moving a couple of elements ~2 ulp past the 1e-6 the default
        # pipeline stays within.
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=5e-6)


def test_packed_taps_out_of_frame_and_fallback():
    from sc_sfmlearner_release_tpu.ops.warp_band import (
        warp_sample_band_packed,
    )

    rng = np.random.RandomState(9)
    b, h, w, c = 1, 24, 32, 3
    img = _bf16_img(rng, (b, h, w, c))
    # wild x, near-center y: out-of-frame taps must zero identically
    coords = (jnp.asarray(rng.rand(b, h, w, 2).astype(np.float32)) * 2 - 1)
    coords = coords * jnp.asarray([3.0, 0.05])
    ref = grid_sample(img, coords, padding_mode="zeros")
    got = warp_sample_band_packed(img, coords, band=24, rows_per_chunk=4,
                                  grad_channels=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # vertically scattered coords violate the band -> exact gather fallback
    coords2 = jnp.asarray(
        (rng.rand(b, h, w, 2).astype(np.float32) * 2 - 1) * 0.95)
    ref2 = grid_sample(img, coords2, padding_mode="zeros")
    got2 = warp_sample_band_packed(img, coords2, band=8, rows_per_chunk=4,
                                   grad_channels=3)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))


def test_packed_taps_gradients():
    """Value grads (leading grad_channels) + coordinate grads vs gather."""
    from sc_sfmlearner_release_tpu.ops.warp_band import (
        warp_sample_band_packed,
    )

    rng = np.random.RandomState(10)
    b, h, w = 1, 16, 20
    img = _bf16_img(rng, (b, h, w, 3))  # ch0 gets grads; ch1-2 do not
    coords = _near_identity_coords(rng, b, h, w, dy_px=2.0, dx_px=4.0)

    def loss_ref(i, co):
        s = grid_sample(i, co, padding_mode="zeros")
        return jnp.sum(s ** 2)

    def loss_band(i, co):
        s = warp_sample_band_packed(i, co, band=12, rows_per_chunk=4,
                                    grad_channels=1)
        return jnp.sum(s ** 2)

    gi_ref, gc_ref = jax.grad(loss_ref, argnums=(0, 1))(img, coords)
    gi_b, gc_b = jax.grad(loss_band, argnums=(0, 1))(img, coords)
    # channel 0 value-gradient matches the gather transpose
    np.testing.assert_allclose(np.asarray(gi_b[..., 0]),
                               np.asarray(gi_ref[..., 0]),
                               rtol=1e-2, atol=1e-2)
    # channels without grad_channels coverage report zero
    np.testing.assert_array_equal(np.asarray(gi_b[..., 1:]),
                                  np.zeros_like(np.asarray(gi_b[..., 1:])))
    # coordinate gradients flow through the fp32 weight combine
    np.testing.assert_allclose(np.asarray(gc_b), np.asarray(gc_ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_packed_taps_2d_band_matches_gather(padding_mode):
    """Column banding (xband/cols_per_chunk): values exact vs gather."""
    from sc_sfmlearner_release_tpu.ops.warp_band import (
        warp_sample_band_packed,
    )

    rng = np.random.RandomState(12)
    b, h, w, c = 2, 32, 48, 4
    img = _bf16_img(rng, (b, h, w, c))
    coords = _near_identity_coords(rng, b, h, w, dy_px=3.0, dx_px=3.0)
    ref = grid_sample(img, coords, padding_mode=padding_mode)
    got = warp_sample_band_packed(img, coords, padding_mode=padding_mode,
                                  band=16, rows_per_chunk=4,
                                  grad_channels=2, xband=16,
                                  cols_per_chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=5e-6)


def test_packed_taps_2d_band_x_violation_falls_back():
    """x displacements beyond the column margin -> exact gather fallback."""
    from sc_sfmlearner_release_tpu.ops.warp_band import (
        warp_sample_band_packed,
    )

    rng = np.random.RandomState(13)
    b, h, w, c = 1, 24, 32, 3
    img = _bf16_img(rng, (b, h, w, c))
    coords = _near_identity_coords(rng, b, h, w, dy_px=1.0, dx_px=0.0)
    coords = coords + jnp.asarray([2 * 12.0 / w, 0.0])  # +12 px, margin 4
    ref = grid_sample(img, coords, padding_mode="zeros")
    got = warp_sample_band_packed(img, coords, band=16, rows_per_chunk=4,
                                  grad_channels=0, xband=16,
                                  cols_per_chunk=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_packed_taps_2d_band_gradients_and_odd_size():
    """2-D band gradients vs gather; odd h/w exercises both padded tails."""
    from sc_sfmlearner_release_tpu.ops.warp_band import (
        warp_sample_band_packed,
    )

    rng = np.random.RandomState(14)
    b, h, w = 1, 16, 20
    img = _bf16_img(rng, (b, h, w, 3))
    coords = _near_identity_coords(rng, b, h, w, dy_px=2.0, dx_px=2.0)

    def loss_ref(i, co):
        return jnp.sum(grid_sample(i, co, padding_mode="zeros") ** 2)

    def loss_band(i, co):
        return jnp.sum(
            warp_sample_band_packed(i, co, band=12, rows_per_chunk=4,
                                    grad_channels=1, xband=12,
                                    cols_per_chunk=4) ** 2)

    gi_ref, gc_ref = jax.grad(loss_ref, argnums=(0, 1))(img, coords)
    gi_b, gc_b = jax.grad(loss_band, argnums=(0, 1))(img, coords)
    np.testing.assert_allclose(np.asarray(gi_b[..., 0]),
                               np.asarray(gi_ref[..., 0]),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(gi_b[..., 1:]),
                                  np.zeros_like(np.asarray(gi_b[..., 1:])))
    np.testing.assert_allclose(np.asarray(gc_b), np.asarray(gc_ref),
                               rtol=1e-3, atol=1e-3)

    b, h, w, c = 1, 29, 33, 2
    img3 = _bf16_img(rng, (b, h, w, c))
    coords3 = _near_identity_coords(rng, b, h, w, dy_px=2.0, dx_px=2.0)
    ref3 = grid_sample(img3, coords3)
    got3 = warp_sample_band_packed(img3, coords3, band=16, rows_per_chunk=4,
                                   grad_channels=1, xband=12,
                                   cols_per_chunk=8)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref3),
                               rtol=1e-6, atol=5e-6)


def test_inverse_warp2_2d_band_sampler_string():
    """'band<N>x<XB>c<cols>' parses and agrees with gather end-to-end."""
    from sc_sfmlearner_release_tpu.ops.geometry import inverse_warp2

    rng = np.random.RandomState(15)
    b, h, w = 2, 32, 40
    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    depth = jnp.asarray(2.0 + rng.rand(b, h, w, 1).astype(np.float32))
    ref_depth = jnp.asarray(2.0 + rng.rand(b, h, w, 1).astype(np.float32))
    pose = jnp.asarray(rng.randn(b, 6).astype(np.float32) * 0.02)
    k = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.broadcast_to(k, (b, 3, 3)).copy())

    out_g = inverse_warp2(img, depth, ref_depth, pose, intr, sampler="gather")
    out_b = inverse_warp2(img, depth, ref_depth, pose, intr,
                          sampler="band16x24c8")
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_g[0]),
                               atol=4e-3)
    np.testing.assert_array_equal(np.asarray(out_b[1]), np.asarray(out_g[1]))
    np.testing.assert_allclose(np.asarray(out_b[2]), np.asarray(out_g[2]),
                               rtol=0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_b[3]), np.asarray(out_g[3]))


def test_inverse_warp2_band_uses_packed_taps():
    """End-to-end inverse_warp2 band sampler parity (packed taps path)."""
    from sc_sfmlearner_release_tpu.ops.geometry import inverse_warp2

    rng = np.random.RandomState(11)
    b, h, w = 2, 32, 40
    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    depth = jnp.asarray(2.0 + rng.rand(b, h, w, 1).astype(np.float32))
    ref_depth = jnp.asarray(2.0 + rng.rand(b, h, w, 1).astype(np.float32))
    k = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.broadcast_to(k, (b, 3, 3)).copy())

    def loss(pose, sampler):
        o = inverse_warp2(img, depth, ref_depth, pose, intr, sampler=sampler)
        return jnp.sum(o[0]) + jnp.sum(o[2] * o[2])

    pose = jnp.asarray(rng.randn(b, 6).astype(np.float32) * 0.02)
    lg, gg = jax.value_and_grad(loss)(pose, "gather")
    lb, gb = jax.value_and_grad(loss)(pose, "band16")
    np.testing.assert_allclose(float(lb), float(lg), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gg),
                               rtol=2e-2, atol=2e-4)


def test_band_fits_per_element_and_fallback_flags():
    """Per-element fits flags agree with the whole-call fallback guard,
    and the geometry-level band_fallback_flags wrapper matches the actual
    sampler behavior on real projective warps."""
    from sc_sfmlearner_release_tpu.ops.geometry import band_fallback_flags
    from sc_sfmlearner_release_tpu.ops.warp_band import band_fits_per_element

    rng = np.random.RandomState(11)
    b, h, w = 3, 24, 32
    # Element 0: small displacement (fits). Element 1: huge vertical
    # displacement, in-frame (violates). Element 2: small again.
    coords = np.array(_near_identity_coords(rng, b, h, w, dy_px=1.0))
    coords[1, ..., 1] = np.clip(coords[1, ..., 1] + 0.9, -0.99, 0.99)
    coords = jnp.asarray(coords)
    fits = np.asarray(band_fits_per_element(coords, band=8, rows_per_chunk=4))
    assert fits.tolist() == [True, False, True]

    # 2-D banding: big HORIZONTAL displacement violates only the x window.
    coords_x = np.array(_near_identity_coords(rng, b, h, w, dy_px=1.0,
                                              dx_px=1.0))
    coords_x[2, ..., 0] = np.clip(coords_x[2, ..., 0] + 0.8, -0.99, 0.99)
    coords_x = jnp.asarray(coords_x)
    fits_1d = np.asarray(band_fits_per_element(coords_x, band=8,
                                               rows_per_chunk=4))
    assert fits_1d.tolist() == [True, True, True]
    fits_2d = np.asarray(band_fits_per_element(
        coords_x, band=8, rows_per_chunk=4, xband=16, cols_per_chunk=8))
    assert fits_2d.tolist() == [True, True, False]

    # geometry-level wrapper on a real projective warp: identity pose fits,
    # a large-vertical-translation pose (ty shifts everything down in
    # frame) falls back; nf/gather samplers never flag.
    depth = jnp.ones((2, h, w, 1), jnp.float32) * 5.0
    k = jnp.asarray([[[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]]] * 2)
    pose = jnp.asarray([[0, 0, 0, 0, 0, 0],
                        [0, 2.5, 0, 0, 0, 0]], jnp.float32)
    flags = np.asarray(band_fallback_flags(depth, pose, k, "band8r4"))
    assert flags.tolist() == [False, True]
    assert not np.asarray(
        band_fallback_flags(depth, pose, k, "band8r4nf")).any()
    assert not np.asarray(band_fallback_flags(depth, pose, k, "gather")).any()


def test_train_step_band_fallback_metric():
    """The train step reports band_fallback=0.0 for in-band synthetic data
    (tiny pose head outputs -> near-identity warps)."""
    import jax.numpy as jnp

    from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
    from sc_sfmlearner_release_tpu.training import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )

    h, w = 32, 64
    disp = DispNet(num_layers=18)
    pose = PoseNet(num_layers=18)
    tx = make_optimizer(1e-4)
    state = create_train_state(disp, pose, tx, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "tgt": jnp.asarray(rng.rand(2, h, w, 3), jnp.float32),
        "refs": jnp.asarray(rng.rand(2, 2, h, w, 3), jnp.float32),
        "intrinsics": jnp.asarray(
            np.broadcast_to(
                np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                         np.float32), (2, 3, 3)).copy()),
    }
    step = make_train_step(disp, pose, tx, LossConfig(sampler="band64"))
    _, metrics = step(state, batch)
    assert float(metrics["band_fallback"]) == 0.0
    # (the gather sampler's metric-absence is asserted on the shared
    # gather step in tests/test_training.py — no extra compile here)


def test_fallback_ladder_middle_rung_and_gather():
    """The l<LB> ladder: in-primary-band calls take the banded path; calls
    that miss the primary but fit the LB-row full-width band produce the
    exact wide-band result (== gather); calls beyond LB still reach the
    exact gather rung. All three rungs must match the gather oracle."""
    from sc_sfmlearner_release_tpu.ops.warp_band import (
        warp_sample_band_packed,
    )

    rng = np.random.RandomState(13)
    b, h, w, c = 2, 32, 48, 3
    img = _bf16_img(rng, (b, h, w, c))

    def run(coords):
        return warp_sample_band_packed(
            img, coords, band=8, rows_per_chunk=4, grad_channels=1,
            xband=16, cols_per_chunk=8, ladder_band=16,
        )

    # rung 0: tiny displacement, fits band8/x16
    c0 = _near_identity_coords(rng, b, h, w, dy_px=1.0, dx_px=1.0)
    np.testing.assert_allclose(np.asarray(run(c0)), np.asarray(
        grid_sample(img, c0)), rtol=1e-6, atol=5e-6)

    # rung 1: ~5 px vertical displacement — misses band8 (budget 2) but
    # fits the 16-row ladder (budget 6); also test an x-violation (2-D
    # budget 4 cols) rescued by the full-width ladder rung
    c1 = _near_identity_coords(rng, b, h, w, dy_px=5.0, dx_px=1.0)
    np.testing.assert_allclose(np.asarray(run(c1)), np.asarray(
        grid_sample(img, c1)), rtol=1e-6, atol=5e-6)
    c1x = _near_identity_coords(rng, b, h, w, dy_px=1.0, dx_px=6.0)
    np.testing.assert_allclose(np.asarray(run(c1x)), np.asarray(
        grid_sample(img, c1x)), rtol=1e-6, atol=5e-6)

    # rung 2: scattered coords far beyond the middle rung -> the COVER
    # band (window spans the whole image from every chunk, can never
    # miss; band-exact semantics — 1-ulp fp32 association vs gather for
    # bf16 sources)
    c2 = jnp.asarray((rng.rand(b, h, w, 2).astype(np.float32) * 2 - 1) * 0.9)
    np.testing.assert_allclose(np.asarray(run(c2)),
                               np.asarray(grid_sample(img, c2)),
                               rtol=1e-6, atol=5e-6)

    # sampler-string plumbing end to end
    from sc_sfmlearner_release_tpu.ops.geometry import (
        _parse_band, validate_sampler,
    )

    validate_sampler("band64x416c208l128")
    assert _parse_band("band64x416c208l128") == (64, 8, 416, 208, True, 128)
    assert _parse_band("band64l96") == (64, 8, None, None, True, 96)


def test_fallback_ladder_gradients_match_gather():
    """Value + coordinate gradients THROUGH each ladder rung match the
    gather formulation — the middle rung is the production path whenever
    real-data motion exceeds the primary budget, so its backward pass
    (custom VJP inside a lax.switch branch) needs the same guarantee as
    the primary's."""
    from sc_sfmlearner_release_tpu.ops.warp_band import (
        warp_sample_band_packed,
    )

    rng = np.random.RandomState(17)
    b, h, w, c = 1, 24, 32, 2
    img = _bf16_img(rng, (b, h, w, c))

    def loss_band(i, co):
        out = warp_sample_band_packed(
            i, co, band=8, rows_per_chunk=4, grad_channels=c,
            xband=16, cols_per_chunk=8, ladder_band=16,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(i, co):
        return jnp.sum(grid_sample(i, co) ** 2)

    for dy in (1.0, 5.0):  # primary rung / middle rung
        coords = _near_identity_coords(rng, b, h, w, dy_px=dy, dx_px=1.0)
        g_band = jax.grad(loss_band, argnums=(0, 1))(img, coords)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(img, coords)
        np.testing.assert_allclose(
            np.asarray(g_band[0]), np.asarray(g_ref[0]),
            rtol=1e-2, atol=1e-2,  # value grads: one bf16 cotangent round
        )
        np.testing.assert_allclose(
            np.asarray(g_band[1]), np.asarray(g_ref[1]),
            rtol=1e-3, atol=1e-3,  # coordinate grads: fp32 weight path
        )
