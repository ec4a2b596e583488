"""Bilinear grid sampling for TPU.

Semantics match ``torch.nn.functional.grid_sample`` with
``mode='bilinear'`` and ``align_corners=False`` (the configuration used by
the reference's view-synthesis warp, see /root/reference/inverse_warp.py:262,267),
but laid out NHWC and written as pure XLA gather math so the whole
warp + loss pipeline fuses into one compiled program. Autodiff through the
gather yields the scatter-add backward for image gradients and the exact
analytic gradient for the sampling coordinates.

Coordinate convention: ``coords[..., 0]`` is x (width axis), ``coords[..., 1]``
is y (height axis), both normalized to [-1, 1] over the *source* image. With
``align_corners=False`` the unnormalization is ``x_px = ((x + 1) * W - 1) / 2``.

Padding modes:
  * ``zeros``  — out-of-bounds taps contribute 0 (and 0 gradient).
  * ``border`` — coordinates are clamped to the image border.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int) -> jax.Array:
    # align_corners=False: -1 maps to -0.5, +1 maps to size - 0.5.
    return ((coord + 1.0) * size - 1.0) / 2.0


@functools.partial(jax.jit, static_argnames=("padding_mode",))
def grid_sample(
    img: jax.Array,
    coords: jax.Array,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Sample ``img`` at normalized ``coords`` with bilinear interpolation.

    Args:
      img: source image, ``[B, H, W, C]`` float.
      coords: sampling grid, ``[B, Ho, Wo, 2]`` float, normalized (x, y).
      padding_mode: ``"zeros"`` or ``"border"``.

    Returns:
      ``[B, Ho, Wo, C]`` sampled image.
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    b, h, w, c = img.shape
    compute_dtype = coords.dtype

    x = _unnormalize(coords[..., 0].astype(compute_dtype), w)
    y = _unnormalize(coords[..., 1].astype(compute_dtype), h)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f  # weight of the x1 tap
    wy = y - y0f

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if padding_mode == "zeros":
        vx0 = (x0 >= 0) & (x0 <= w - 1)
        vx1 = (x1 >= 0) & (x1 <= w - 1)
        vy0 = (y0 >= 0) & (y0 <= h - 1)
        vy1 = (y1 >= 0) & (y1 <= h - 1)
    else:
        vx0 = vx1 = vy0 = vy1 = None

    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y1, 0, h - 1)

    flat = img.reshape(b, h * w, c)

    def gather(yi: jax.Array, xi: jax.Array) -> jax.Array:
        idx = (yi * w + xi).reshape(b, -1, 1)  # [B, Ho*Wo, 1]
        vals = jnp.take_along_axis(flat, idx, axis=1)  # [B, Ho*Wo, C]
        return vals.reshape(yi.shape + (c,))

    v00 = gather(y0c, x0c)
    v01 = gather(y0c, x1c)
    v10 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    w00 = (1.0 - wy) * (1.0 - wx)
    w01 = (1.0 - wy) * wx
    w10 = wy * (1.0 - wx)
    w11 = wy * wx

    if padding_mode == "zeros":
        z = jnp.zeros((), compute_dtype)
        w00 = jnp.where(vy0 & vx0, w00, z)
        w01 = jnp.where(vy0 & vx1, w01, z)
        w10 = jnp.where(vy1 & vx0, w10, z)
        w11 = jnp.where(vy1 & vx1, w11, z)

    out = (
        w00[..., None] * v00
        + w01[..., None] * v01
        + w10[..., None] * v10
        + w11[..., None] * v11
    )
    return out.astype(img.dtype)
