"""Tests for the projective-geometry core (ops/geometry.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from sc_sfmlearner_release_tpu.ops import (
    cam2pixel,
    euler2mat,
    invert_pose_mat4,
    pixel2cam,
    pose_mat4,
    pose_vec2mat,
    quat2mat,
)
from sc_sfmlearner_release_tpu.ops import inverse_warp2 as _inverse_warp2

inverse_warp2 = jax.jit(
    functools.partial(_inverse_warp2, padding_mode="zeros")
)


def test_euler2mat_matches_scipy():
    rng = np.random.RandomState(0)
    angles = (rng.rand(16, 3).astype(np.float32) - 0.5) * 2.0
    got = np.asarray(euler2mat(jnp.asarray(angles)))
    # R = Rx @ Ry @ Rz == intrinsic rotations about X, then Y, then Z.
    want = Rotation.from_euler("XYZ", angles).as_matrix().astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_euler2mat_orthonormal():
    rng = np.random.RandomState(1)
    angles = (rng.rand(8, 3).astype(np.float32) - 0.5) * 6.0
    r = np.asarray(euler2mat(jnp.asarray(angles)))
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), r.shape)
    np.testing.assert_allclose(r @ np.swapaxes(r, 1, 2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_quat2mat_orthonormal_and_identity():
    rng = np.random.RandomState(2)
    q = rng.randn(8, 3).astype(np.float32) * 0.3
    r = np.asarray(quat2mat(jnp.asarray(q)))
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), r.shape)
    np.testing.assert_allclose(r @ np.swapaxes(r, 1, 2), eye, atol=1e-5)
    r0 = np.asarray(quat2mat(jnp.zeros((1, 3))))
    np.testing.assert_allclose(r0[0], np.eye(3), atol=1e-6)


def test_pose_vec2mat_identity_and_inverse():
    vec = jnp.zeros((2, 6))
    mat = np.asarray(pose_vec2mat(vec))
    np.testing.assert_allclose(mat, np.broadcast_to(np.eye(3, 4), (2, 3, 4)), atol=1e-6)

    rng = np.random.RandomState(3)
    vec = jnp.asarray(rng.randn(4, 6).astype(np.float32) * 0.2)
    m4 = np.asarray(pose_mat4(pose_vec2mat(vec)))
    prod = m4 @ np.asarray(invert_pose_mat4(jnp.asarray(m4)))
    np.testing.assert_allclose(
        prod, np.broadcast_to(np.eye(4, dtype=np.float32), prod.shape), atol=1e-5
    )


def _intrinsics(b, fx=50.0, fy=55.0, cx=16.0, cy=12.0):
    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    return jnp.asarray(np.broadcast_to(k, (b, 3, 3)))


def test_pixel2cam_roundtrip():
    """Backproject then reproject with K recovers the pixel grid."""
    b, h, w = 2, 12, 20
    rng = np.random.RandomState(4)
    depth = jnp.asarray(1.0 + rng.rand(b, h, w).astype(np.float32) * 5)
    k = _intrinsics(b)
    cam = pixel2cam(depth, jnp.linalg.inv(k))
    proj = jnp.concatenate([k, jnp.zeros((b, 3, 1))], axis=2)  # identity pose
    coords, computed = cam2pixel(cam, proj, padding_mode="border")
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xn = (2 * xs / (w - 1) - 1).astype(np.float32)
    yn = (2 * ys / (h - 1) - 1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(coords[..., 0]), np.broadcast_to(xn, (b, h, w)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(coords[..., 1]), np.broadcast_to(yn, (b, h, w)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(computed[..., 0]), np.asarray(depth), rtol=1e-5)


def test_cam2pixel_zeros_padding_pushes_out_of_frame_to_two():
    b, h, w = 1, 8, 8
    depth = jnp.ones((b, h, w))
    k = _intrinsics(b, fx=4.0, fy=4.0, cx=4.0, cy=4.0)
    cam = pixel2cam(depth, jnp.linalg.inv(k))
    # Large translation in x pushes everything off-frame.
    pose = jnp.asarray([[50.0, 0, 0, 0, 0, 0]], jnp.float32)
    proj = k @ pose_vec2mat(pose)
    coords, _ = cam2pixel(cam, proj, padding_mode="zeros")
    assert np.all(np.asarray(coords[..., 0]) == 2.0)


def test_inverse_warp2_identity():
    """Identity pose + consistent depths.

    The reference normalizes projected coordinates by (w-1)/(h-1) but samples
    with align_corners=False (inverse_warp.py:217-218,262), so an identity
    pose resamples pixel x at ``x * w/(w-1) - 0.5`` — a faithful sub-pixel
    offset, exact on linear ramps. Depth outputs are exact for constant depth.
    """
    b, h, w = 2, 16, 24
    ys, xs = np.meshgrid(
        np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
        indexing="ij",
    )
    ramp = xs + 0.5 * ys
    img = jnp.asarray(np.broadcast_to(ramp[None, ..., None], (b, h, w, 3)))
    depth = jnp.full((b, h, w, 1), 3.0)
    pose = jnp.zeros((b, 6))
    k = _intrinsics(b, fx=20.0, fy=20.0, cx=w / 2, cy=h / 2)

    warped, valid, proj_d, comp_d = inverse_warp2(img, depth, depth, pose, k)
    want = (xs * w / (w - 1) - 0.5) + 0.5 * (ys * h / (h - 1) - 0.5)
    interior = np.s_[:, 1 : h - 1, 1 : w - 1]
    np.testing.assert_allclose(
        np.asarray(warped)[..., 0][interior], np.broadcast_to(want, (b, h, w))[interior],
        atol=1e-3,
    )
    # border pixels sit exactly at |x_norm| == 1; fp rounding may flip them
    # either way, so only the interior must be valid.
    np.testing.assert_allclose(np.asarray(valid)[interior], 1.0)
    np.testing.assert_allclose(np.asarray(proj_d)[interior], 3.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp_d), 3.0, rtol=1e-5)


def test_inverse_warp2_known_translation():
    """A +x camera translation with constant depth shifts sampling by
    fx * tx / depth pixels (plus the reference's (w-1) vs align_corners=False
    resampling offset); linear ramps make bilinear sampling exact."""
    b, h, w = 1, 10, 32
    xs = np.broadcast_to(np.arange(w, dtype=np.float32), (b, h, w))
    img = jnp.asarray(np.repeat(xs[..., None], 3, axis=-1))
    depth = jnp.full((b, h, w, 1), 5.0)
    fx = 10.0
    tx = 1.0  # shift = fx * tx / z = 2 pixels
    pose = jnp.asarray([[tx, 0, 0, 0, 0, 0]], jnp.float32)
    k = _intrinsics(b, fx=fx, fy=fx, cx=w / 2, cy=h / 2)

    warped, valid, _, comp_d = inverse_warp2(img, depth, depth, pose, k)
    shift = fx * tx / 5.0
    want = (xs + shift) * w / (w - 1) - 0.5  # exact sampled position
    in_bounds = want <= w - 1
    sl = np.s_[:, 1 : h - 1]
    got = np.asarray(warped)[..., 0]
    np.testing.assert_allclose(
        got[sl][in_bounds[sl]], want[sl][in_bounds[sl]], atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(comp_d[..., 0]), 5.0, rtol=1e-6)
