"""Cross-validation of evaluation/odometry.py against the reference's
KITTI odometry evaluator (/root/reference/kitti_eval/kitti_odometry.py),
imported directly as the golden oracle and driven on synthetic noisy
trajectories.

Covers: per-length segment t_err/r_err (calc_sequence_errors +
compute_segment_error + compute_overall_err), ATE, RPE, scale_lse_solver,
Umeyama 6/7-DoF alignment, and the full align() chain.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

os.environ.setdefault("MPLBACKEND", "Agg")

from sc_sfmlearner_release_tpu.evaluation import odometry as ours

_REF_PATH = "/root/reference/kitti_eval/kitti_odometry.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(_REF_PATH):
        pytest.skip("reference evaluator not available")
    spec = importlib.util.spec_from_file_location("ref_kitti_odometry", _REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_kitti_odometry"] = mod
    spec.loader.exec_module(mod)
    ev = mod.KittiEvalOdom()
    ev.lengths = [100, 200, 300, 400, 500, 600, 700, 800]
    ev.num_lengths = len(ev.lengths)
    return mod, ev


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _car_trajectory(n=1200, seed=0):
    """Car-like SE(3) trajectory: ~1 m/frame forward, smooth yaw."""
    rng = np.random.RandomState(seed)
    yaw_rate = 0.002 * np.cumsum(rng.randn(n) * 0.1 + 0.2)
    poses = {}
    p = np.eye(4)
    for i in range(n):
        poses[i] = p.copy()
        step = np.eye(4)
        step[:3, :3] = _rot_z(yaw_rate[i])
        step[0, 3] = 1.0 + 0.1 * rng.rand()
        p = p @ step
    return poses


def _noisy(poses, seed=1, scale=1.0, t_sigma=0.02, r_sigma=0.001):
    """Accumulate per-frame perturbed relative motions (optionally
    mis-scaled translation) — a realistic VO-style error model."""
    rng = np.random.RandomState(seed)
    idxs = sorted(poses)
    out = {idxs[0]: poses[idxs[0]].copy()}
    for a, b in zip(idxs[:-1], idxs[1:]):
        rel = np.linalg.inv(poses[a]) @ poses[b]
        rel = rel.copy()
        rel[:3, 3] = rel[:3, 3] * scale + rng.randn(3) * t_sigma
        wiggle = np.eye(4)
        wiggle[:3, :3] = _rot_z(rng.randn() * r_sigma)
        out[b] = out[a] @ rel @ wiggle
    return out


def test_sequence_errors_match(ref):
    _, ev = ref
    gt = _car_trajectory()
    pred = _noisy(gt)
    ref_errs = ev.calc_sequence_errors(gt, pred)
    our_errs = ours.KittiOdomEvaluator().calc_sequence_errors(gt, pred)
    assert len(ref_errs) == len(our_errs) > 50
    np.testing.assert_allclose(np.asarray(our_errs), np.asarray(ref_errs),
                               rtol=1e-9, atol=1e-12)


def test_segment_and_overall_errors_match(ref):
    _, ev = ref
    gt = _car_trajectory()
    pred = _noisy(gt)
    seq_errs = ev.calc_sequence_errors(gt, pred)

    ref_seg = ev.compute_segment_error(seq_errs)
    our_seg = ours.KittiOdomEvaluator().compute_segment_error(seq_errs)
    for length in ours.LENGTHS:
        np.testing.assert_allclose(our_seg[length], ref_seg[length],
                                   rtol=1e-9, err_msg=f"len={length}")

    ref_t, ref_r = ev.compute_overall_err(seq_errs)
    our_t, our_r = ours.KittiOdomEvaluator().compute_overall_err(seq_errs)
    np.testing.assert_allclose([our_t, our_r], [ref_t, ref_r], rtol=1e-9)


def test_ate_rpe_match(ref):
    _, ev = ref
    gt = _car_trajectory(n=400)
    pred = _noisy(gt, t_sigma=0.05, r_sigma=0.002)
    np.testing.assert_allclose(
        ours.KittiOdomEvaluator().compute_ATE(gt, pred),
        ev.compute_ATE(gt, pred), rtol=1e-9,
    )
    np.testing.assert_allclose(
        ours.KittiOdomEvaluator().compute_RPE(gt, pred),
        ev.compute_RPE(gt, pred), rtol=1e-9,
    )


def test_scale_solver_and_umeyama_match(ref):
    mod, _ = ref
    rng = np.random.RandomState(7)
    x = rng.randn(3, 200)
    y = 1.7 * (_rot_z(0.4) @ x) + np.array([[1.0], [-2.0], [0.5]]) \
        + rng.randn(3, 200) * 0.01

    np.testing.assert_allclose(
        ours.scale_lse_solver(x.ravel(), y.ravel()),
        mod.scale_lse_solver(x.ravel(), y.ravel()), rtol=1e-12,
    )
    for with_scale in (False, True):
        r_ref, t_ref, c_ref = mod.umeyama_alignment(x, y, with_scale)
        r_our, t_our, c_our = ours.umeyama_alignment(x, y, with_scale)
        np.testing.assert_allclose(r_our, r_ref, atol=1e-10)
        np.testing.assert_allclose(t_our, t_ref, atol=1e-10)
        np.testing.assert_allclose(c_our, c_ref, rtol=1e-10)


def test_full_alignment_chain_match(ref):
    """align() (first-frame + 7dof/6dof/scale) must produce the same
    aligned poses the reference's eval() produces inline
    (kitti_odometry.py:486-573)."""
    mod, ev = ref
    gt = _car_trajectory(n=500, seed=3)
    pred = _noisy(gt, seed=4, scale=0.5)  # strong scale drift: 7dof must fix

    for alignment in ("scale", "7dof", "6dof"):
        # reference inline protocol
        idx0 = sorted(pred.keys())[0]
        pred_0, gt_0 = pred[idx0], gt[idx0]
        ref_pred = {i: np.linalg.inv(pred_0) @ p for i, p in pred.items()}
        ref_gt = {i: np.linalg.inv(gt_0) @ p for i, p in gt.items()}
        if alignment == "scale":
            ref_pred = ev.scale_optimization(ref_gt, ref_pred)
        else:
            xyz_result = np.asarray(
                [ref_pred[i][:3, 3] for i in ref_pred]).T
            xyz_gt = np.asarray([ref_gt[i][:3, 3] for i in ref_pred]).T
            r, t, scale = mod.umeyama_alignment(
                xyz_result, xyz_gt, alignment != "6dof")
            align_tf = np.eye(4)
            align_tf[:3, :3], align_tf[:3, 3] = r, t
            for i in ref_pred:
                ref_pred[i][:3, 3] *= scale
                ref_pred[i] = align_tf @ ref_pred[i]

        our_gt, our_pred = ours.KittiOdomEvaluator().align(gt, pred, alignment)
        for i in pred:
            np.testing.assert_allclose(our_pred[i], ref_pred[i], atol=1e-8,
                                       err_msg=f"{alignment} frame {i}")
            np.testing.assert_allclose(our_gt[i], ref_gt[i], atol=1e-10)

        # and the post-alignment metrics agree
        np.testing.assert_allclose(
            ours.KittiOdomEvaluator().compute_ATE(our_gt, our_pred),
            ev.compute_ATE(ref_gt, ref_pred), rtol=1e-8,
        )
