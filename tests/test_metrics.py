"""Tests for depth metrics (ops/metrics.py) vs an independent torch
implementation with boolean indexing (semantics of
/root/reference/loss_functions.py:162-205)."""

import jax.numpy as jnp
import numpy as np
import torch

import functools

import jax

from sc_sfmlearner_release_tpu.ops import (
    compute_depth_errors as _compute_depth_errors,
)


def compute_depth_errors(gt, pred, dataset):
    return jax.jit(functools.partial(_compute_depth_errors, dataset=dataset))(
        gt, pred
    )
from sc_sfmlearner_release_tpu.ops.metrics import masked_median_lower


def test_masked_median_matches_torch():
    rng = np.random.RandomState(0)
    for n in [5, 6, 101, 200]:
        x = rng.rand(256).astype(np.float32)
        mask = np.zeros(256, bool)
        mask[rng.choice(256, n, replace=False)] = True
        got = float(masked_median_lower(jnp.asarray(x), jnp.asarray(mask)))
        want = torch.median(torch.tensor(x[mask])).item()
        np.testing.assert_allclose(got, want)


def _torch_errors(gt, pred, dataset):
    """Dynamic-shape torch computation of the same metrics."""
    gt_t, pred_t = torch.tensor(gt), torch.tensor(pred)
    b, h, w = gt_t.shape
    if dataset == "kitti":
        y1, y2 = int(0.40810811 * h), int(0.99189189 * h)
        x1, x2 = int(0.03594771 * w), int(0.96405229 * w)
        max_depth = 80.0
    else:
        y1, y2 = int(0.09375 * h), int(0.98125 * h)
        x1, x2 = int(0.0640625 * w), int(0.9390625 * w)
        max_depth = 10.0
    crop = torch.zeros(h, w, dtype=torch.bool)
    crop[y1:y2, x1:x2] = True

    out = dict(abs_diff=0.0, abs_rel=0.0, sq_rel=0.0, a1=0.0, a2=0.0, a3=0.0)
    for g, p in zip(gt_t, pred_t):
        valid = (g > 0.1) & (g < max_depth) & crop
        vg = g[valid]
        vp = p[valid].clamp(1e-3, max_depth)
        vp = vp * torch.median(vg) / torch.median(vp)
        thresh = torch.max(vg / vp, vp / vg)
        out["a1"] += (thresh < 1.25).float().mean().item()
        out["a2"] += (thresh < 1.25**2).float().mean().item()
        out["a3"] += (thresh < 1.25**3).float().mean().item()
        out["abs_diff"] += (vg - vp).abs().mean().item()
        out["abs_rel"] += ((vg - vp).abs() / vg).mean().item()
        out["sq_rel"] += ((vg - vp) ** 2 / vg).mean().item()
    return {k: v / b for k, v in out.items()}


def test_matches_torch_kitti_and_nyu():
    rng = np.random.RandomState(1)
    b, h, w = 3, 37, 61
    for dataset in ["kitti", "nyu"]:
        gt = (rng.rand(b, h, w) * 12).astype(np.float32)
        gt[gt < 0.5] = 0.0  # missing pixels
        pred = (0.5 + rng.rand(b, h, w) * 8).astype(np.float32)
        got = {
            k: float(v)
            for k, v in compute_depth_errors(
                jnp.asarray(gt), jnp.asarray(pred), dataset
            ).items()
        }
        want = _torch_errors(gt, pred, dataset)
        for k, v in want.items():
            np.testing.assert_allclose(got[k], v, rtol=1e-4, err_msg=f"{dataset}:{k}")


def test_perfect_prediction():
    rng = np.random.RandomState(2)
    gt = (1.0 + rng.rand(2, 40, 50) * 10).astype(np.float32)
    m = compute_depth_errors(jnp.asarray(gt), jnp.asarray(gt), "kitti")
    np.testing.assert_allclose(float(m["abs_rel"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(m["a1"]), 1.0)
    np.testing.assert_allclose(float(m["rmse"]), 0.0, atol=1e-5)
