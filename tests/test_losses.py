"""Tests for SSIM and the SC-Depth loss stack (ops/ssim.py, ops/losses.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sc_sfmlearner_release_tpu.ops import mean_on_mask
from sc_sfmlearner_release_tpu.ops import pairwise_loss as _pairwise_loss
from sc_sfmlearner_release_tpu.ops import (
    photo_and_geometry_loss as _photo_and_geometry_loss,
)
from sc_sfmlearner_release_tpu.ops import smooth_loss as _smooth_loss
from sc_sfmlearner_release_tpu.ops import ssim as _ssim

# eager per-op dispatch is very slow in this environment; jit everything
ssim = jax.jit(_ssim)
smooth_loss = jax.jit(_smooth_loss)


def pairwise_loss(*args, **kwargs):
    fn = functools.partial(_pairwise_loss, **kwargs)
    return jax.jit(fn)(*args)


def photo_and_geometry_loss(*args, **kwargs):
    fn = functools.partial(_photo_and_geometry_loss, **kwargs)
    return jax.jit(fn)(*args)


def _torch_ssim(x_nhwc, y_nhwc):
    """Independent torch computation of the 3x3 mean-pool SSIM map
    (semantics of /root/reference/loss_functions.py:11-42)."""
    x = torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))
    y = torch.tensor(np.transpose(y_nhwc, (0, 3, 1, 2)))
    x = F.pad(x, (1, 1, 1, 1), mode="reflect")
    y = F.pad(y, (1, 1, 1, 1), mode="reflect")
    pool = lambda t: F.avg_pool2d(t, 3, 1)
    mu_x, mu_y = pool(x), pool(y)
    sx = pool(x * x) - mu_x**2
    sy = pool(y * y) - mu_y**2
    sxy = pool(x * y) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    n = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    d = (mu_x**2 + mu_y**2 + c1) * (sx + sy + c2)
    return torch.clamp((1 - n / d) / 2, 0, 1).numpy().transpose(0, 2, 3, 1)


def test_ssim_identical_images_zero():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 12, 3).astype(np.float32))
    out = np.asarray(ssim(x, x))
    assert out.shape == (2, 8, 12, 3)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_ssim_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 10, 14, 3).astype(np.float32)
    y = rng.rand(2, 10, 14, 3).astype(np.float32)
    got = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    want = _torch_ssim(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mean_on_mask_guard():
    diff = jnp.ones((1, 50, 50, 3))  # 7500 elements < 10000 guard
    mask = jnp.ones((1, 50, 50, 1))
    assert float(mean_on_mask(diff, mask)) == 0.0

    diff = jnp.full((1, 80, 80, 3), 2.0)  # 19200 elements
    mask = jnp.ones((1, 80, 80, 1))
    np.testing.assert_allclose(float(mean_on_mask(diff, mask)), 2.0)


def _snippet(b=2, n=2, h=40, w=96, seed=3):
    rng = np.random.RandomState(seed)
    tgt = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    refs = jnp.asarray(rng.rand(b, n, h, w, 3).astype(np.float32))
    tgt_d = jnp.asarray(2.0 + rng.rand(b, h, w, 1).astype(np.float32))
    ref_d = jnp.asarray(2.0 + rng.rand(b, n, h, w, 1).astype(np.float32))
    poses = jnp.asarray(rng.randn(b, n, 6).astype(np.float32) * 0.01)
    poses_inv = jnp.asarray(rng.randn(b, n, 6).astype(np.float32) * 0.01)
    k = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    k = jnp.asarray(np.broadcast_to(k, (b, 3, 3)))
    return tgt, refs, tgt_d, ref_d, poses, poses_inv, k


def test_batched_loss_matches_per_pair_sum():
    """photo_and_geometry_loss folds 2N directed pairs into one batch; it must
    equal the sum of individual pairwise_loss calls (the reference's loop,
    loss_functions.py:56-92)."""
    tgt, refs, tgt_d, ref_d, poses, poses_inv, k = _snippet()
    n = refs.shape[1]

    for kwargs in (
        dict(with_ssim=True, with_mask=True, with_auto_mask=False),
        dict(with_ssim=True, with_mask=True, with_auto_mask=True),
        dict(with_ssim=False, with_mask=False, with_auto_mask=False),
    ):
        photo_b, geom_b = photo_and_geometry_loss(
            tgt, refs, k, [tgt_d], [ref_d], poses, poses_inv,
            num_scales=1, **kwargs,
        )
        photo_s, geom_s = 0.0, 0.0
        for i in range(n):
            p1, g1 = pairwise_loss(
                tgt, refs[:, i], tgt_d, ref_d[:, i], poses[:, i], k, **kwargs
            )
            p2, g2 = pairwise_loss(
                refs[:, i], tgt, ref_d[:, i], tgt_d, poses_inv[:, i], k, **kwargs
            )
            photo_s += float(p1) + float(p2)
            geom_s += float(g1) + float(g2)

        np.testing.assert_allclose(float(photo_b), photo_s, rtol=1e-4)
        np.testing.assert_allclose(float(geom_b), geom_s, rtol=1e-4)


def test_perfect_reconstruction_near_zero_loss():
    """Identity poses, identical frames, consistent depth: photometric and
    geometry losses should be ~0 (up to the sub-pixel resampling offset on a
    constant image, which is exactly 0)."""
    b, n, h, w = 1, 2, 48, 104
    tgt = jnp.full((b, h, w, 3), 0.5)
    refs = jnp.full((b, n, h, w, 3), 0.5)
    tgt_d = jnp.full((b, h, w, 1), 4.0)
    ref_d = jnp.full((b, n, h, w, 1), 4.0)
    poses = jnp.zeros((b, n, 6))
    k = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]], np.float32)
    k = jnp.asarray(np.broadcast_to(k, (b, 3, 3)))

    # border padding: zeros-padding would darken frame edges under the
    # identity warp (same behavior as the reference).
    photo, geom = photo_and_geometry_loss(
        tgt, refs, k, [tgt_d], [ref_d], poses, poses,
        num_scales=1, with_ssim=True, with_mask=True, padding_mode="border",
    )
    assert float(photo) < 1e-4
    assert float(geom) < 1e-5


def test_multiscale_upsamples_low_res_depth():
    tgt, refs, tgt_d, ref_d, poses, poses_inv, k = _snippet()
    b, n, h, w = refs.shape[0], refs.shape[1], tgt.shape[1], tgt.shape[2]
    tgt_d1 = tgt_d[:, ::2, ::2]
    ref_d1 = ref_d[:, :, ::2, ::2]
    photo, geom = photo_and_geometry_loss(
        tgt, refs, k, [tgt_d, tgt_d1], [ref_d, ref_d1], poses, poses_inv,
        num_scales=4,
    )
    assert np.isfinite(float(photo)) and np.isfinite(float(geom))
    photo1, _ = photo_and_geometry_loss(
        tgt, refs, k, [tgt_d, tgt_d1], [ref_d, ref_d1], poses, poses_inv,
        num_scales=1,
    )
    assert float(photo) > float(photo1)  # second scale adds loss mass


def test_smooth_loss_constant_depth_zero():
    b, n, h, w = 2, 2, 16, 20
    rng = np.random.RandomState(7)
    tgt = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    refs = jnp.asarray(rng.rand(b, n, h, w, 3).astype(np.float32))
    tgt_d = jnp.full((b, h, w, 1), 2.5)
    ref_d = jnp.full((b, n, h, w, 1), 7.0)
    loss = smooth_loss([tgt_d], tgt, [ref_d], refs)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_smooth_loss_matches_torch():
    """Edge-aware smoothness vs an independent torch computation
    (semantics of /root/reference/loss_functions.py:132-159)."""
    b, n, h, w = 2, 1, 12, 18
    rng = np.random.RandomState(8)
    tgt = rng.rand(b, h, w, 3).astype(np.float32)
    refs = rng.rand(b, n, h, w, 3).astype(np.float32)
    tgt_d = (1 + rng.rand(b, h, w, 1)).astype(np.float32)
    ref_d = (1 + rng.rand(b, n, h, w, 1)).astype(np.float32)

    got = float(
        smooth_loss([jnp.asarray(tgt_d)], jnp.asarray(tgt),
                    [jnp.asarray(ref_d)], jnp.asarray(refs))
    )

    def torch_term(d_nhwc, i_nhwc):
        d = torch.tensor(np.transpose(d_nhwc, (0, 3, 1, 2)))
        i = torch.tensor(np.transpose(i_nhwc, (0, 3, 1, 2)))
        d = d / (d.mean(2, True).mean(3, True) + 1e-7)
        gdx = (d[:, :, :, :-1] - d[:, :, :, 1:]).abs()
        gdy = (d[:, :, :-1, :] - d[:, :, 1:, :]).abs()
        gix = (i[:, :, :, :-1] - i[:, :, :, 1:]).abs().mean(1, keepdim=True)
        giy = (i[:, :, :-1, :] - i[:, :, 1:, :]).abs().mean(1, keepdim=True)
        return ((gdx * (-gix).exp()).mean() + (gdy * (-giy).exp()).mean()).item()

    want = torch_term(tgt_d, tgt) + torch_term(ref_d[:, 0], refs[:, 0])
    np.testing.assert_allclose(got, want, rtol=1e-5)
