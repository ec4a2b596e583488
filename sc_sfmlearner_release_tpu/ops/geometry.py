"""Differentiable projective geometry for self-supervised SfM on TPU.

Implements the backproject -> rigid transform -> project -> sample pipeline
of SC-DepthV1 (reference behavior: /root/reference/inverse_warp.py) as pure,
vectorized JAX so the whole warp participates in a single fused XLA program.

Layout conventions (TPU-native, NHWC):
  images      [B, H, W, C]
  depth maps  [B, H, W, 1]
  intrinsics  [B, 3, 3]
  pose vec    [B, 6] = (tx, ty, tz, rx, ry, rz)
  pose mat    [B, 3, 4] (camera-to-camera transform, target -> source)
"""

from __future__ import annotations

import re
from typing import Tuple

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny (3x3 / 3x4) but precision-critical: the default
# matmul precision lowers inputs to bfloat16 on the MXU, which visibly warps
# projection coordinates. Force full fp32 for all geometry contractions.
_HIGHEST = jax.lax.Precision.HIGHEST


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """Homogeneous pixel coordinates ``[H, W, 3]`` with entries (x, y, 1).

    Constant-folded under jit; no caching needed (reference caches a global
    grid, /root/reference/inverse_warp.py:8-17 — unnecessary under XLA).
    """
    ys = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    xs = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    return jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)


def pixel2cam(depth: jax.Array, intrinsics_inv: jax.Array) -> jax.Array:
    """Backproject pixels into the camera frame.

    Args:
      depth: ``[B, H, W]`` depth of the target view.
      intrinsics_inv: ``[B, 3, 3]`` inverse intrinsics.

    Returns:
      ``[B, H, W, 3]`` camera-frame points (reference: inverse_warp.py:29-44).
    """
    b, h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype)  # [H, W, 3]
    rays = jnp.einsum("bij,hwj->bhwi", intrinsics_inv, grid, precision=_HIGHEST)
    return rays * depth[..., None]


def cam2pixel(
    cam_coords: jax.Array,
    proj: jax.Array,
    padding_mode: str = "zeros",
) -> Tuple[jax.Array, jax.Array]:
    """Project camera-frame points into normalized source pixel coordinates.

    Args:
      cam_coords: ``[B, H, W, 3]`` target camera-frame points.
      proj: ``[B, 3, 4]`` combined ``K @ [R|t]`` camera-to-pixel projection.
      padding_mode: ``"zeros"`` pushes out-of-frame coordinates to 2.0 so the
        subsequent zero-padded bilinear sample never blends frame content
        with padding (reference trick: inverse_warp.py:219-224).

    Returns:
      (coords ``[B, H, W, 2]`` normalized (x, y) in [-1, 1],
       computed_depth ``[B, H, W, 1]`` the transformed points' depth).
    """
    b, h, w, _ = cam_coords.shape
    rot, tr = proj[:, :, :3], proj[:, :, 3]
    p = jnp.einsum("bij,bhwj->bhwi", rot, cam_coords, precision=_HIGHEST) + tr[:, None, None, :]
    x, y = p[..., 0], p[..., 1]
    z = jnp.maximum(p[..., 2], 1e-3)

    x_norm = 2.0 * (x / z) / (w - 1.0) - 1.0
    y_norm = 2.0 * (y / z) / (h - 1.0) - 1.0
    if padding_mode == "zeros":
        two = jnp.asarray(2.0, x_norm.dtype)
        x_norm = jnp.where(jnp.abs(x_norm) > 1.0, two, x_norm)
        y_norm = jnp.where(jnp.abs(y_norm) > 1.0, two, y_norm)

    coords = jnp.stack([x_norm, y_norm], axis=-1)
    return coords, z[..., None]


def euler2mat(angle: jax.Array) -> jax.Array:
    """Euler angles (x, y, z, radians) -> rotation matrix ``[B, 3, 3]``.

    Composition order R = Rx @ Ry @ Rz (reference: inverse_warp.py:77-112).
    """
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    zeros = jnp.zeros_like(z)
    ones = jnp.ones_like(z)

    zmat = jnp.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    ymat = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=1
    ).reshape(-1, 3, 3)
    xmat = jnp.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], axis=1
    ).reshape(-1, 3, 3)
    return jnp.matmul(jnp.matmul(xmat, ymat, precision=_HIGHEST), zmat, precision=_HIGHEST)


def quat2mat(quat: jax.Array) -> jax.Array:
    """3-parameter quaternion (x, y, z; w chosen for unit norm via
    normalization of (1, x, y, z)) -> rotation matrix ``[B, 3, 3]``.

    Reference: inverse_warp.py:115-136.
    """
    b = quat.shape[0]
    q = jnp.concatenate([jnp.ones((b, 1), quat.dtype), quat], axis=1)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]

    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z

    return jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=1,
    ).reshape(b, 3, 3)


def pose_vec2mat(vec: jax.Array, rotation_mode: str = "euler") -> jax.Array:
    """6-DoF pose vector -> ``[B, 3, 4]`` transform (reference: inverse_warp.py:139-154)."""
    translation = vec[:, :3, None]
    rot = vec[:, 3:]
    if rotation_mode == "euler":
        rot_mat = euler2mat(rot)
    elif rotation_mode == "quat":
        rot_mat = quat2mat(rot)
    else:
        raise ValueError(f"unknown rotation_mode: {rotation_mode}")
    return jnp.concatenate([rot_mat, translation], axis=2)


def pose_mat4(mat34: jax.Array) -> jax.Array:
    """Lift ``[..., 3, 4]`` to homogeneous ``[..., 4, 4]``."""
    batch = mat34.shape[:-2]
    bottom = jnp.zeros(batch + (1, 4), mat34.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([mat34, bottom], axis=-2)


def invert_pose_mat4(mat4: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid ``[..., 4, 4]`` transform."""
    r = mat4[..., :3, :3]
    t = mat4[..., :3, 3:]
    r_t = jnp.swapaxes(r, -1, -2)
    t_inv = -jnp.matmul(r_t, t, precision=_HIGHEST)
    top = jnp.concatenate([r_t, t_inv], axis=-1)
    return pose_mat4(top)


def inverse_warp(
    img: jax.Array,
    depth: jax.Array,
    pose: jax.Array,
    intrinsics: jax.Array,
    rotation_mode: str = "euler",
    padding_mode: str = "zeros",
) -> Tuple[jax.Array, jax.Array]:
    """Legacy single-output warp (reference: inverse_warp.py:157-191).

    Args:
      img: source image ``[B, H, W, 3]``.
      depth: target depth ``[B, H, W]``.
      pose: ``[B, 6]`` target->source.
      intrinsics: ``[B, 3, 3]``.

    Returns:
      (warped image ``[B, H, W, 3]``, valid mask ``[B, H, W]`` bool).
    """
    from .grid_sample import grid_sample

    cam_coords = pixel2cam(depth, jnp.linalg.inv(intrinsics))
    pose_mat = pose_vec2mat(pose, rotation_mode)
    proj = jnp.matmul(intrinsics, pose_mat, precision=_HIGHEST)
    coords, _ = cam2pixel(cam_coords, proj, padding_mode)
    projected_img = grid_sample(img, coords, padding_mode=padding_mode)
    valid = jnp.max(jnp.abs(coords), axis=-1) <= 1.0
    return projected_img, valid


_SAMPLER_RE = re.compile(
    r"^(gather|mxu|band(?P<band>\d+)?(?P<rows>r\d+)?"
    r"(?:(?P<xband>x\d+)(?P<cols>c\d+)?)?(?P<ladder>l\d+)?(?P<nf>nf)?)$"
)


def validate_sampler(sampler: str) -> None:
    """Fail fast on a malformed sampler string (e.g. 'bands64', 'band_96').

    Without this, a malformed band-width parse only surfaces as an opaque
    ValueError deep inside jit tracing.
    """
    m = _SAMPLER_RE.match(sampler) if isinstance(sampler, str) else None
    if not m:
        raise ValueError(
            f"unknown sampler {sampler!r}: expected 'gather', 'mxu', or "
            "'band[<N>][r<rows>][x<xband>[c<cols>]][l<ladder>][nf]' "
            "(e.g. 'band64', 'band64r16', 'band64x384c256', 'band64l128')"
        )
    if m.group("xband") and m.group("cols"):
        xb, cols = int(m.group("xband")[1:]), int(m.group("cols")[1:])
        if cols > xb or (xb - cols) % 2:
            raise ValueError(
                f"sampler {sampler!r}: c<cols> must be <= x<xband> with an "
                f"even margin (xband - cols = {xb - cols} is "
                f"{'odd' if (xb - cols) % 2 else 'negative'})"
            )
    if m.group("ladder"):
        band = int(m.group("band")) if m.group("band") else 64
        ladder = int(m.group("ladder")[1:])
        if ladder <= band:
            # warp_sample_band_packed only arms the ladder when
            # ladder_band > band; accepting e.g. 'band64l48' would
            # silently compile the plain band-or-gather cond instead
            # (including the verified cond-gather TPU fault construct
            # the l<LB> suffix exists to avoid — train.py guard).
            raise ValueError(
                f"sampler {sampler!r}: ladder rung l{ladder} must be "
                f"wider than the primary band ({band}) to arm the "
                f"fallback ladder"
            )


def _parse_band(sampler: str):
    """'band[<N>][r<rows>][x<XB>[c<cols>]][l<LB>][nf]' ->
    (band, rows_per_chunk, xband, cols_per_chunk, fallback, ladder_band).

    ``x<XB>`` restricts each tile's x contraction to an XB-column window
    (2-D banding; ``c<cols>`` sets the output tile width, default XB//2
    parity-matched). ``l<LB>`` inserts a middle fallback rung: a
    full-width 1-D band of LB rows tried before the exact gather path
    (ops/warp_band.py ladder). The 'nf' suffix disables the exact
    fallback entirely (out-of-band warps clamp to the window edge) — a
    measurement/ablation knob, not a recommended training configuration."""
    m = _SAMPLER_RE.match(sampler)
    band = int(m.group("band")) if m.group("band") else 64
    rows = int(m.group("rows")[1:]) if m.group("rows") else 8
    xband = int(m.group("xband")[1:]) if m.group("xband") else None
    cols = int(m.group("cols")[1:]) if m.group("cols") else None
    ladder = int(m.group("ladder")[1:]) if m.group("ladder") else None
    return band, rows, xband, cols, m.group("nf") is None, ladder


def project_pixel_coords(
    depth: jax.Array,
    pose: jax.Array,
    intrinsics: jax.Array,
    padding_mode: str = "zeros",
) -> Tuple[jax.Array, jax.Array]:
    """The warp's projection front-end: backproject target pixels with
    ``depth`` ``[B, H, W, 1]``, transform by ``pose`` ``[B, 6]``, project
    into the source frame. Returns (normalized coords ``[B, H, W, 2]``,
    computed depth ``[B, H, W, 1]``). Shared by :func:`inverse_warp2` and
    :func:`band_fallback_flags` so the two build identical subgraphs
    (XLA CSEs them when jitted together)."""
    cam_coords = pixel2cam(depth[..., 0], jnp.linalg.inv(intrinsics))
    pose_mat = pose_vec2mat(pose)
    proj = jnp.matmul(intrinsics, pose_mat, precision=_HIGHEST)
    return cam2pixel(cam_coords, proj, padding_mode)


def band_fallback_flags(
    depth: jax.Array,
    pose: jax.Array,
    intrinsics: jax.Array,
    sampler: str,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Per-batch-element fallback flags ``[B]`` bool for a band sampler.

    True where this element's warp leaves the sampler's (row/column) band
    window — i.e. would trigger :func:`ops.warp_band.warp_sample_band_packed`'s
    whole-call exact-gather fallback. The projection subgraph is identical
    to the real warp's, so computing these flags next to the warp inside
    one jitted step costs ~nothing (CSE). Non-band samplers (or ``nf``
    variants, which never fall back) return all-False.
    """
    validate_sampler(sampler)
    b = depth.shape[0]
    if not sampler.startswith("band"):
        return jnp.zeros((b,), bool)
    band, rows, xband, cols, fb, _ladder = _parse_band(sampler)
    if not fb:
        return jnp.zeros((b,), bool)
    from .warp_band import band_fits_per_element

    coords, _ = project_pixel_coords(depth, pose, intrinsics, padding_mode)
    return ~band_fits_per_element(
        coords, padding_mode, band, rows, xband, cols
    )


def inverse_warp2(
    img: jax.Array,
    depth: jax.Array,
    ref_depth: jax.Array,
    pose: jax.Array,
    intrinsics: jax.Array,
    padding_mode: str = "zeros",
    sampler: str = "gather",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Warp a source view (image + depth) into the target frame.

    The core SC-Depth op (reference: inverse_warp.py:230-269): backproject
    target pixels with the target depth, rigidly transform by ``pose``,
    project into the source frame, and bilinearly sample both the source
    image and the source depth. Also returns the *computed* depth of the
    transformed points, used by the geometry-consistency loss.

    Args:
      img: source image ``[B, H, W, 3]``.
      depth: target depth ``[B, H, W, 1]``.
      ref_depth: source depth ``[B, H, W, 1]``.
      pose: ``[B, 6]`` 6-DoF target->source (euler).
      intrinsics: ``[B, 3, 3]``.
      sampler: which bilinear sampler implements the two grid-samples.
        * ``"gather"`` — the torch-exact gather formulation
          (golden-tested vs torch CPU). Exact, but XLA lowers TPU gathers
          to ~0.1 G values/s (element-at-a-time HBM walks), which makes
          it the train step's dominant cost at the canonical config.
        * ``"band"`` (optionally
          ``"band<N>[r<rows>][x<XB>[c<cols>]][l<LB>][nf]"``,
          e.g. ``"band96"``, ``"band64r16"``, ``"band64x416c208l128"``) — the
          banded one-hot MXU formulation (ops/warp_band.py): scatter- and
          gather-free, bf16-exact image values, fp32-exact sampled depth
          via hi/lo splitting, with an exact whole-call gather fallback
          when a warp exceeds the N-row vertical band. The TPU hot-path
          choice. ``r<rows>`` sets the output rows per chunk; ``x<XB>``
          adds 2-D column banding (each (rows x cols) output tile's x
          one-hot contracts over an XB-column source window — horizontal
          displacement budget ``(XB - cols) // 2`` columns, same gather
          fallback on violation; ``c<cols>`` sets the tile width, default
          ~XB/2); ``l<LB>`` inserts a middle fallback rung (a full-width
          1-D LB-row band tried before gather, so an occasional
          violation costs ~1.2-2x a band step instead of ~4.5x);
          ``nf`` drops the exactness fallback (~4.6 ms/step of
          cond overhead; out-of-band warps clamp to the window edge —
          opt-in only).
        * ``"mxu"`` — round-1's unbanded one-hot formulation
          (ops/warp_mxu.py), kept as a tested alternative; ~band/H times
          the band sampler's FLOPs, never preferable.

    Returns:
      (projected_img ``[B, H, W, 3]``,
       valid_mask ``[B, H, W, 1]`` float,
       projected_depth ``[B, H, W, 1]`` source depth sampled at the warp,
       computed_depth ``[B, H, W, 1]`` depth of transformed target points).

    Gradient semantics: ``img`` is treated as non-differentiable input data
    (``stop_gradient`` is applied before sampling) — ``d(projected_img)/
    d(img)`` is identically zero for every sampler. In SC-Depth training the
    source image is a camera frame, never a network output, so this only
    removes the sampler's scatter-add transpose from the backward pass;
    gradients still flow through the coordinates (to depth + pose) and
    through ``projected_depth``. Callers that need image-value gradients
    should call ``ops.grid_sample`` directly.
    """
    from .grid_sample import grid_sample
    from .warp_mxu import grid_sample_mxu

    validate_sampler(sampler)

    coords, computed_depth = project_pixel_coords(
        depth, pose, intrinsics, padding_mode
    )

    # The sampled IMAGE values never need a gradient: ``img`` is input data
    # (camera frames), not a network output, so d(loss)/d(img) is discarded
    # by the trainer anyway. Cutting it here removes the bilinear sampler's
    # scatter-add transpose for all 3 RGB channels from the backward pass —
    # scatters are among the slowest ops XLA emits on TPU. Gradients still
    # flow through ``coords`` (to depth + pose) and through the sampled
    # source DEPTH (a disp-net output, needed by the geometry loss).
    img_ng = jax.lax.stop_gradient(img)

    if sampler.startswith("band"):
        from .warp_band import split_hi_lo, warp_sample_band_packed

        band, rows, xband, cols, fb, ladder = _parse_band(sampler)
        # ONE packed call: [depth_hi, depth_lo, R, G, B]. Gradient-carrying
        # channels (the hi/lo-split source depth — recombines to fp32
        # accuracy since sampling is linear) go first; the custom backward
        # transposes only those two, while the RGB channels (stop-gradient
        # camera frames) cost nothing in the backward pass. Coordinate
        # gradients for ALL channels flow through the out-of-kernel fp32
        # weight combine.
        depth_hilo = split_hi_lo(ref_depth.astype(jnp.float32))
        packed = jnp.concatenate(
            [depth_hilo, img_ng.astype(jnp.float32)], axis=-1
        )
        sampled = warp_sample_band_packed(
            packed, coords, padding_mode=padding_mode, band=band,
            rows_per_chunk=rows, grad_channels=2, fallback=fb,
            xband=xband, cols_per_chunk=cols, ladder_band=ladder,
        )
        projected_depth = (
            sampled[..., 0:1] + sampled[..., 1:2]
        ).astype(ref_depth.dtype)
        projected_img = sampled[..., 2:].astype(img.dtype)
    elif sampler == "mxu":
        # One packed 5-channel call: RGB as plain values (bf16 rounding,
        # ~4e-3 on [0,1] images) plus the source depth split into bf16 hi/lo
        # channels so its sampled value recombines to fp32 accuracy
        # (sampling is linear) — the geometry-consistency loss stays fp32.
        from .warp_mxu import _split_hi_lo

        depth_hi_lo = _split_hi_lo(ref_depth.astype(jnp.float32))
        packed = jnp.concatenate(
            [img_ng.astype(jnp.float32), depth_hi_lo], axis=-1
        )
        sampled = grid_sample_mxu(
            packed, coords, padding_mode=padding_mode, precision="bf16"
        )
        projected_img = sampled[..., :3].astype(img.dtype)
        projected_depth = (sampled[..., 3:4] + sampled[..., 4:5]).astype(
            ref_depth.dtype
        )
    elif sampler == "gather":
        projected_img = grid_sample(img_ng, coords, padding_mode=padding_mode)
        projected_depth = grid_sample(ref_depth, coords, padding_mode=padding_mode)
    else:
        raise ValueError(f"unknown sampler: {sampler}")

    valid = (jnp.max(jnp.abs(coords), axis=-1) <= 1.0).astype(img.dtype)
    return projected_img, valid[..., None], projected_depth, computed_depth
