"""Tests for the KITTI odometry evaluator with synthetic trajectories."""

import os

import numpy as np
import pytest

from sc_sfmlearner_release_tpu.evaluation import (
    KittiOdomEvaluator,
    load_poses_txt,
    scale_lse_solver,
    umeyama_alignment,
)


def _spiral_trajectory(n=400, step=1.0):
    """A gently curving trajectory (~n*step meters; chord ~ arc over 100 m
    so per-length errors behave like a driving sequence)."""
    poses = {}
    p = np.eye(4)
    for i in range(n):
        theta = 0.0005
        rot = np.array(
            [
                [np.cos(theta), 0, np.sin(theta)],
                [0, 1, 0],
                [-np.sin(theta), 0, np.cos(theta)],
            ]
        )
        delta = np.eye(4)
        delta[:3, :3] = rot
        delta[2, 3] = step
        p = p @ delta
        poses[i] = p.copy()
    return poses


def test_load_poses_roundtrip(tmp_path):
    poses = _spiral_trajectory(10)
    path = tmp_path / "00.txt"
    rows = [poses[i][:3].reshape(-1) for i in sorted(poses)]
    np.savetxt(path, np.stack(rows), fmt="%1.8e")
    loaded = load_poses_txt(str(path))
    assert len(loaded) == 10
    np.testing.assert_allclose(loaded[3], poses[3], rtol=1e-6)


def test_umeyama_recovers_similarity():
    rng = np.random.RandomState(0)
    x = rng.rand(3, 50)
    angle = 0.7
    r_true = np.array(
        [
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1],
        ]
    )
    t_true = np.array([1.0, -2.0, 0.5])
    c_true = 2.5
    y = c_true * (r_true @ x) + t_true[:, None]

    r, t, c = umeyama_alignment(x, y, with_scale=True)
    np.testing.assert_allclose(r, r_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    np.testing.assert_allclose(c, c_true, atol=1e-8)

    r6, t6, c6 = umeyama_alignment(x, y, with_scale=False)
    assert c6 == 1.0
    np.testing.assert_allclose(r6, r_true, atol=1e-6)


def test_scale_lse():
    x = np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(scale_lse_solver(x, 3 * x), 3.0)


def test_perfect_prediction_zero_errors(tmp_path):
    poses = _spiral_trajectory(600)
    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "res"
    gt_dir.mkdir()
    res_dir.mkdir()
    rows = np.stack([poses[i][:3].reshape(-1) for i in sorted(poses)])
    np.savetxt(gt_dir / "09.txt", rows, fmt="%1.8e")
    np.savetxt(res_dir / "09.txt", rows, fmt="%1.8e")

    ev = KittiOdomEvaluator()
    results = ev.eval(str(gt_dir), str(res_dir), alignment=None, seqs=[9], plot=False)
    assert results["09"]["t_err_pct"] < 1e-9
    assert results["09"]["r_err_deg_per_100m"] < 1e-6
    assert results["09"]["ate_m"] < 1e-9
    assert os.path.exists(res_dir / "result.txt")
    assert os.path.exists(res_dir / "errors" / "09.txt")


def test_scaled_prediction_fixed_by_7dof(tmp_path):
    """A 0.5x-scale trajectory: large errors unaligned, ~0 after 7dof."""
    poses = _spiral_trajectory(600)
    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "res"
    gt_dir.mkdir()
    res_dir.mkdir()
    gt_rows = np.stack([poses[i][:3].reshape(-1) for i in sorted(poses)])
    np.savetxt(gt_dir / "09.txt", gt_rows, fmt="%1.8e")

    scaled = {i: poses[i].copy() for i in poses}
    for i in scaled:
        scaled[i][:3, 3] *= 0.5
    res_rows = np.stack([scaled[i][:3].reshape(-1) for i in sorted(scaled)])
    np.savetxt(res_dir / "09.txt", res_rows, fmt="%1.8e")

    ev = KittiOdomEvaluator()
    raw = ev.eval(str(gt_dir), str(res_dir), alignment=None, seqs=[9], plot=False)
    assert raw["09"]["t_err_pct"] > 10.0

    aligned = ev.eval(str(gt_dir), str(res_dir), alignment="7dof", seqs=[9], plot=False)
    assert aligned["09"]["t_err_pct"] < 1e-4
    assert aligned["09"]["ate_m"] < 1e-4  # txt round-trip precision


def test_segment_errors_cover_lengths(tmp_path):
    poses = _spiral_trajectory(900)
    ev = KittiOdomEvaluator()
    # identity comparison, just verify segment bookkeeping
    errs = ev.calc_sequence_errors(poses, poses)
    lengths = {e[3] for e in errs}
    assert 100 in lengths and 800 in lengths
    seg = ev.compute_segment_error(errs)
    np.testing.assert_allclose(seg[100], [0.0, 0.0], atol=1e-12)


def test_shipped_gt_poses_load_and_self_eval(tmp_path):
    """The in-repo kitti_eval/gt_poses assets (seqs 00-10, same data the
    reference ships) load and evaluate to zero error against themselves."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gt_dir = os.path.join(repo, "kitti_eval", "gt_poses")
    for seq in range(11):
        assert os.path.exists(os.path.join(gt_dir, f"{seq:02d}.txt"))

    poses = load_poses_txt(os.path.join(gt_dir, "09.txt"))
    assert len(poses) == 1591  # known length of seq 09

    res_dir = tmp_path / "res"
    res_dir.mkdir()
    rows = np.stack([poses[i][:3].reshape(-1) for i in sorted(poses)])
    np.savetxt(res_dir / "09.txt", rows, fmt="%1.8e")
    ev = KittiOdomEvaluator()
    results = ev.eval(gt_dir, str(res_dir), alignment="7dof", seqs=[9], plot=False)
    assert results["09"]["t_err_pct"] < 1e-6
    assert results["09"]["ate_m"] < 1e-6


def test_pose_error_snippet_functions():
    from test_pose import compute_pose_error

    poses = _spiral_trajectory(5)
    arr = np.stack([poses[i][:3] for i in sorted(poses)])
    ate, re = compute_pose_error(arr, arr)
    assert ate < 1e-12 and re < 1e-6

    scaled = arr.copy()
    scaled[:, :, -1] *= 3.0  # scale-ambiguous translation is aligned away
    ate, re = compute_pose_error(arr, scaled)
    assert ate < 1e-9 and re < 1e-6
