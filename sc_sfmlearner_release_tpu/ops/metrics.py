"""Depth evaluation metrics (KITTI Eigen / NYUv2), jit-able.

Reference behavior: /root/reference/loss_functions.py:162-205 (train-time
validation) and /root/reference/eval_depth.py:32-56 (offline eval): per-image
valid masking (depth range + dataset crop), per-image median scaling, then
batch-averaged error statistics.

The reference's boolean indexing produces dynamic shapes; on TPU we keep
static shapes with masked reductions and a masked lower-median (matching
``torch.median``'s lower-middle-element semantics on even counts).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

_CROPS = {
    # Garg ECCV16 crop fractions (reference: loss_functions.py:172-177)
    "kitti": (0.40810811, 0.99189189, 0.03594771, 0.96405229, 80.0),
    # NYU crop (reference: loss_functions.py:179-184)
    "nyu": (0.09375, 0.98125, 0.0640625, 0.9390625, 10.0),
}


def _crop_mask(h: int, w: int, dataset: str) -> jax.Array:
    y1f, y2f, x1f, x2f, _ = _CROPS[dataset]
    y1, y2 = int(y1f * h), int(y2f * h)
    x1, x2 = int(x1f * w), int(x2f * w)
    mask = jnp.zeros((h, w), bool)
    return mask.at[y1:y2, x1:x2].set(True)


def masked_median_lower(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Lower median of ``x`` over ``mask`` (torch.median semantics).

    ``x`` and ``mask`` are flat ``[P]`` arrays; invalid entries are sorted to
    the end and the element at index ``(n_valid - 1) // 2`` is returned.
    """
    big = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(big)
    n = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.maximum(n - 1, 0) // 2
    return s[idx]


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def _errors_one(
    gt: jax.Array, pred: jax.Array, crop: jax.Array, max_depth: float
) -> Dict[str, jax.Array]:
    valid = (gt > 0.1) & (gt < max_depth) & crop
    gt_f = gt.reshape(-1)
    pred_f = jnp.clip(pred.reshape(-1), 1e-3, max_depth)
    valid_f = valid.reshape(-1)

    med_gt = masked_median_lower(gt_f, valid_f)
    med_pred = masked_median_lower(pred_f, valid_f)
    scaled = pred_f * med_gt / med_pred

    # Guard invalid lanes against div-by-zero; they are masked out anyway.
    safe_gt = jnp.where(valid_f, gt_f, 1.0)
    safe_pred = jnp.where(valid_f, scaled, 1.0)

    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    diff = jnp.abs(safe_gt - safe_pred)

    return {
        "abs_diff": _masked_mean(diff, valid_f),
        "abs_rel": _masked_mean(diff / safe_gt, valid_f),
        "sq_rel": _masked_mean(diff * diff / safe_gt, valid_f),
        "rmse": jnp.sqrt(_masked_mean(diff * diff, valid_f)),
        "rmse_log": jnp.sqrt(
            _masked_mean((jnp.log(safe_gt) - jnp.log(safe_pred)) ** 2, valid_f)
        ),
        "log10": _masked_mean(
            jnp.abs(jnp.log10(safe_gt) - jnp.log10(safe_pred)), valid_f
        ),
        "a1": _masked_mean((thresh < 1.25).astype(gt.dtype), valid_f),
        "a2": _masked_mean((thresh < 1.25**2).astype(gt.dtype), valid_f),
        "a3": _masked_mean((thresh < 1.25**3).astype(gt.dtype), valid_f),
    }


def compute_depth_errors(
    gt: jax.Array, pred: jax.Array, dataset: str = "kitti",
    n_valid=None,
) -> Dict[str, jax.Array]:
    """Batch depth metrics with per-image median scaling.

    Args:
      gt: ``[B, H, W]`` ground-truth depth (0 = missing).
      pred: ``[B, H, W]`` predicted depth.
      dataset: ``"kitti"`` (Garg crop, 80m cap) or ``"nyu"``.
      n_valid: optional scalar (traced ok) — only the first ``n_valid``
        images contribute to the batch means. The loader pads the trailing
        validation batch by repeating the last sample (data/loader.py);
        without this the duplicates bias that batch's statistics (the
        reference averages true samples only, train.py:365-423).

    Returns:
      Dict of scalar metrics, each the mean of per-image masked statistics
      (reference: loss_functions.py:186-205).
    """
    if dataset not in _CROPS:
        raise ValueError(f"unknown dataset: {dataset}")
    h, w = gt.shape[1], gt.shape[2]
    crop = _crop_mask(h, w, dataset)
    max_depth = _CROPS[dataset][4]

    per_image = jax.vmap(lambda g, p: _errors_one(g, p, crop, max_depth))(gt, pred)
    if n_valid is None:
        return {k: jnp.mean(v) for k, v in per_image.items()}
    w_s = (jnp.arange(gt.shape[0]) < n_valid).astype(gt.dtype)
    denom = jnp.maximum(jnp.sum(w_s), 1.0)
    return {k: jnp.sum(v * w_s) / denom for k, v in per_image.items()}
