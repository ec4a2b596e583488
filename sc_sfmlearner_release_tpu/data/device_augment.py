"""Device-side training augmentation (jitted, fused into the train step).

TPU-native replacement for the host-side NumPy/PIL augmentations in
``data/transforms.py`` (behavioral target: /root/reference/
custom_transforms.py:46-84 — snippet-coherent random horizontal flip and
random scale-crop, both with matching pinhole-intrinsics updates, followed
by the reference's Normalize).

Why on device: the host path decodes JPEGs *and* runs a PIL resize per frame
per sample; at TPU step rates (>1500 snippets/s on v5e) a single host core
cannot keep up. Moving the augmentation into the jitted step leaves the host
only decode + stack, and XLA fuses the normalize into the first convolution.

Formulation. Flip, zoom and crop compose into ONE affine map from output
pixel centers to input pixel centers, and that map is axis-separable
(in_x depends only on the output column, in_y only on the output row), so
the resample is two bilinear-weight contractions on the MXU — one along H,
one along W — with border clamping matching PIL's edge handling. No gather
ops anywhere (TPU has no fast arbitrary gather; the general-warp
``ops.grid_sample`` measured ~100x slower for this op on v5e).
Known filter deviation from the host path:
the host/reference pipeline quantizes frames to uint8 and resizes with
PIL's default filter for RGB (BICUBIC — transforms.py:93, reference
custom_transforms.py imageio round-trip), whereas this path resamples
*bilinearly on float* — so ``--device-augment`` produces a slightly
different augmentation distribution (softer interpolation, no uint8
rounding) on top of the effective-scale note below. Both are valid
augmentation streams; parity with the reference is statistical either way:

    zoom to (floor(H*sy), floor(W*sx)), crop at integer (ox, oy)
      =>  in_x = (out_x + ox + 0.5) / sx_eff - 0.5,   sx_eff = floor(W*sx)/W
    flip folds in as  in_x -> (W-1) - in_x

using the pixel-center convention of PIL/``align_corners=False``. Intrinsics
updates mirror the host path exactly (flip: cx -> W - cx,
custom_transforms.py:55; zoom: row0 *= sx, row1 *= sy; crop: cx -= ox,
cy -= oy, custom_transforms.py:73-84) except that the zoom uses the
*effective* scale floor(W*sx)/W — the scale the resampled image actually
has (the reference applies the continuous draw to the intrinsics but the
floored size to the image; a sub-0.5-pixel inconsistency we do not copy).

Randomness: one draw vector per *sample* (all frames of a snippet share it),
keyed by ``jax.random`` — deterministic for a given (seed, step) regardless
of device count or sharding, since the program is written in global-batch
view and jit partitions it.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .transforms import IMAGENET_MEAN, IMAGENET_STD


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    max_scale: float = 1.15
    flip: bool = True
    scale_crop: bool = True
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD


def sample_draws(key: jax.Array, batch_size: int, cfg: AugmentConfig) -> Dict:
    """Per-sample augmentation draws, mirroring the host transforms' RNG
    protocol (flip ~ Bernoulli(0.5); sx, sy ~ U(1, max_scale); integer
    offsets uniform over the valid crop range)."""
    k_flip, k_scale, k_off = jax.random.split(key, 3)
    flip = jax.random.bernoulli(k_flip, 0.5, (batch_size,))
    if not cfg.flip:
        flip = jnp.zeros((batch_size,), bool)
    scales = jax.random.uniform(
        k_scale, (batch_size, 2), minval=1.0, maxval=cfg.max_scale
    )
    if not cfg.scale_crop:
        scales = jnp.ones((batch_size, 2))
    # Continuous U[0,1) draws; turned into integer offsets once the
    # (data-dependent) valid range is known in _augment_with_draws.
    offsets = jax.random.uniform(k_off, (batch_size, 2))
    return {"flip": flip, "scales": scales, "offsets01": offsets}


def _affine_coords(
    draws: Dict, h: int, w: int
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Resolve draws into per-sample effective scales + integer offsets and
    the per-axis pixel-space sampling positions ``in_x [B, W]``,
    ``in_y [B, H]`` (the affine map is axis-separable)."""
    sx, sy = draws["scales"][:, 0], draws["scales"][:, 1]
    # Integer zoomed size, as the host path's PIL resize produces.
    scaled_w = jnp.floor(w * sx)
    scaled_h = jnp.floor(h * sy)
    sx_eff = scaled_w / w
    sy_eff = scaled_h / h
    # Integer crop offset in [0, scaled - in] (host: rng.integers).
    ox = jnp.floor(draws["offsets01"][:, 0] * (scaled_w - w + 1.0))
    oy = jnp.floor(draws["offsets01"][:, 1] * (scaled_h - h + 1.0))

    out_x = jnp.arange(w, dtype=jnp.float32)
    out_y = jnp.arange(h, dtype=jnp.float32)
    # Pixel-center affine map, per sample: [B, W] and [B, H].
    in_x = (out_x[None, :] + ox[:, None] + 0.5) / sx_eff[:, None] - 0.5
    in_y = (out_y[None, :] + oy[:, None] + 0.5) / sy_eff[:, None] - 0.5
    in_x = jnp.where(draws["flip"][:, None], (w - 1.0) - in_x, in_x)

    return in_x, in_y, sx_eff, sy_eff, ox, oy, draws["flip"]


def _axis_weights(pos: jax.Array, size: int) -> jax.Array:
    """Bilinear tap-weight matrix for one axis: ``[B, out, size]``.

    ``pos [B, out]`` are source pixel positions; border handling clamps to
    [0, size-1] (PIL-style edge clamp, identical to grid_sample's
    ``padding_mode='border'``). Each row has <=2 nonzeros (the two taps),
    so contracting with it reproduces bilinear sampling exactly — but as a
    dense matmul the MXU executes at full rate, instead of the per-element
    gather XLA would emit for the equivalent 2-D grid_sample.
    """
    pos = jnp.clip(pos, 0.0, size - 1.0)
    p0 = jnp.floor(pos)
    frac = pos - p0
    taps = jax.lax.broadcasted_iota(jnp.float32, (1, 1, size), 2)
    w0 = jnp.where(taps == jnp.clip(p0, 0, size - 1)[..., None], 1.0 - frac[..., None], 0.0)
    w1 = jnp.where(taps == jnp.clip(p0 + 1.0, 0, size - 1)[..., None], frac[..., None], 0.0)
    return w0 + w1


def _separable_resample(
    frames: jax.Array, in_x: jax.Array, in_y: jax.Array
) -> jax.Array:
    """Axis-separable bilinear resample of ``[B, H, W, C]`` frames.

    ``in_x [B, W]`` / ``in_y [B, H]`` give each output column/row's source
    position. Equivalent to ``grid_sample(frames, coords, 'border')`` on the
    outer-product grid, but formulated as two one-hot-weight contractions so
    it runs on the MXU — a bilinear-weight matrix is exact in fp32, so this
    path is bit-comparable to the gather formulation (tested).
    """
    b, h, w, c = frames.shape
    ay = _axis_weights(in_y, h)  # [B, H_out, H_in]
    ax = _axis_weights(in_x, w)  # [B, W_out, W_in]
    f32 = frames.astype(jnp.float32)
    # Vertical then horizontal; fp32 accumulate keeps weights exact.
    out = jnp.einsum("bih,bhwc->biwc", ay, f32,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bjw,biwc->bijc", ax, out,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(frames.dtype)


def _update_intrinsics(
    intrinsics: jax.Array,
    w: int,
    sx_eff: jax.Array,
    sy_eff: jax.Array,
    ox: jax.Array,
    oy: jax.Array,
    flip: jax.Array,
) -> jax.Array:
    """Host-path intrinsics updates, in host-path order (flip, then zoom,
    then crop)."""
    fx, fy = intrinsics[:, 0, 0], intrinsics[:, 1, 1]
    cx, cy = intrinsics[:, 0, 2], intrinsics[:, 1, 2]
    cx = jnp.where(flip, w - cx, cx)
    fx = fx * sx_eff
    cx = cx * sx_eff - ox
    fy = fy * sy_eff
    cy = cy * sy_eff - oy
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([fx, zeros, cx], axis=-1)
    row1 = jnp.stack([zeros, fy, cy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=1)


def augment_with_draws(
    batch: Dict[str, jax.Array], draws: Dict, cfg: AugmentConfig
) -> Dict[str, jax.Array]:
    """Apply resolved draws to a raw [0,1] batch; returns a normalized batch.

    Split from the keyed entry point so tests can pin draws and check the
    affine/intrinsics math against the host transforms.
    """
    tgt, refs, intrinsics = batch["tgt"], batch["refs"], batch["intrinsics"]
    b, h, w, _ = tgt.shape
    n = refs.shape[1]

    in_x, in_y, sx_eff, sy_eff, ox, oy, flip = _affine_coords(draws, h, w)

    # One resample over all 1+N frames: fold frames into the channel axis
    # (the snippet shares one affine draw) and apply the separable
    # MXU-contraction resample — no gather anywhere in the augment path.
    frames = jnp.concatenate([tgt[:, None], refs], axis=1)  # [B, 1+N, H, W, 3]
    packed = frames.transpose(0, 2, 3, 1, 4).reshape(b, h, w, (1 + n) * 3)
    sampled = _separable_resample(packed, in_x, in_y)
    sampled = sampled.reshape(b, h, w, 1 + n, 3).transpose(0, 3, 1, 2, 4)

    mean = jnp.asarray(cfg.mean, sampled.dtype)
    std = jnp.asarray(cfg.std, sampled.dtype)
    sampled = (sampled - mean) / std

    out = dict(batch)
    out["tgt"] = sampled[:, 0]
    out["refs"] = sampled[:, 1:]
    out["intrinsics"] = _update_intrinsics(
        intrinsics, w, sx_eff, sy_eff, ox, oy, flip
    )
    return out


def _to_unit_float(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Lift uint8 [0,255] image entries to float32 [0,1] on device.

    Lets the host loader ship uint8 (4x fewer H2D bytes than f32 — the
    packed-dataset fast path, data/packed.py); XLA fuses the convert into
    the augmentation resample.
    """
    out = dict(batch)
    for k in ("tgt", "refs", "img"):
        if k in out and out[k].dtype == jnp.uint8:
            out[k] = out[k].astype(jnp.float32) / 255.0
    return out


def make_device_augment(cfg: AugmentConfig):
    """Returns ``augment(key, batch) -> batch`` for raw train batches —
    float [0,1], or uint8 [0,255] straight from a packed loader.

    Meant to be called INSIDE the jitted train step (key folded from the
    step counter) so the convert + resample + normalize fuse with the
    forward pass.
    """

    def augment(key: jax.Array, batch: Dict[str, jax.Array]) -> Dict:
        batch = _to_unit_float(batch)
        draws = sample_draws(key, batch["tgt"].shape[0], cfg)
        return augment_with_draws(batch, draws, cfg)

    return augment


def normalize_batch(
    batch: Dict[str, jax.Array],
    mean: Tuple[float, float, float] = IMAGENET_MEAN,
    std: Tuple[float, float, float] = IMAGENET_STD,
) -> Dict[str, jax.Array]:
    """Normalize-only device path (validation under --device-augment).
    Accepts float [0,1] or uint8 [0,255] image entries."""
    out = _to_unit_float(batch)
    for k in ("tgt", "refs", "img"):
        if k in out:
            m = jnp.asarray(mean, out[k].dtype)
            s = jnp.asarray(std, out[k].dtype)
            out[k] = (out[k] - m) / s
    return out
