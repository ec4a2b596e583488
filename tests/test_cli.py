"""End-to-end CLI tests: every entry point runs against synthetic data.

Subprocesses share the persistent JAX compile cache (conftest env), so
repeated runs are cheap.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H, W = 64, 96  # divisible by 32 for the encoder pyramid


def _run(cmd, **kw):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache"
        ),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
    )
    # Prevent the environment's sitecustomize from registering the TPU
    # tunnel in every subprocess — concurrent registrations contend on the
    # relay and hang CPU-only runs for minutes.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=REPO, **kw
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    return res


@pytest.fixture(scope="module")
def disp_ckpt(tmp_path_factory):
    """A random-weight DispNet checkpoint in our msgpack format."""
    import flax.serialization
    import jax

    from sc_sfmlearner_release_tpu.models import DispNet

    d = tmp_path_factory.mktemp("ckpt")
    model = DispNet(num_layers=18)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), np.zeros((1, H, W, 3), np.float32)
    )
    path = d / "dispnet_checkpoint.msgpack"
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(dict(variables)))
    return str(path)


@pytest.fixture(scope="module")
def pose_ckpt(tmp_path_factory):
    import flax.serialization
    import jax

    from sc_sfmlearner_release_tpu.models import PoseNet

    d = tmp_path_factory.mktemp("ckpt")
    model = PoseNet(num_layers=18)
    x = np.zeros((1, H, W, 3), np.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, x, train=True))(
        jax.random.PRNGKey(0), x
    )
    path = d / "exp_pose_checkpoint.msgpack"
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(dict(variables)))
    return str(path)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    import imageio.v2 as imageio

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(5):
        imageio.imwrite(
            d / f"{i:06d}.png", (rng.rand(H, W, 3) * 255).astype(np.uint8)
        )
    return str(d)


def test_test_disp_and_eval_depth(disp_ckpt, image_dir, tmp_path):
    out = tmp_path / "preds"
    _run(
        [
            sys.executable, "test_disp.py",
            "--pretrained-dispnet", disp_ckpt,
            "--img-height", str(H), "--img-width", str(W),
            "--dataset-dir", image_dir,
            "--output-dir", str(out),
            "--resnet-layers", "18",
            "--batch-size", "2",
        ]
    )
    preds = np.load(out / "predictions.npy")
    assert preds.shape == (5, H, W)
    assert np.isfinite(preds).all() and (preds > 0).all()

    # GT folder for eval_depth (kitti mode reads per-image .npy)
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(5):
        np.save(gt_dir / f"{i:06d}.npy", (1 + rng.rand(H, W) * 20).astype(np.float32))

    res = _run(
        [
            sys.executable, "eval_depth.py",
            "--dataset", "kitti",
            "--pred_depth", str(out / "predictions.npy"),
            "--gt_depth", str(gt_dir),
        ]
    )
    assert "abs_rel" in res.stdout
    assert "Scaling ratios" in res.stdout


def test_run_inference(disp_ckpt, image_dir, tmp_path):
    out = tmp_path / "viz"
    _run(
        [
            sys.executable, "run_inference.py",
            "--pretrained", disp_ckpt,
            "--output-disp", "--output-depth",
            "--img-height", str(H), "--img-width", str(W),
            "--dataset-dir", image_dir,
            "--output-dir", str(out),
            "--resnet-layers", "18",
            "--batch-size", "2",
        ]
    )
    disps = list(out.glob("*_disp.png"))
    depths = list(out.glob("*_depth.png"))
    assert len(disps) == 5 and len(depths) == 5


@pytest.fixture(scope="module")
def odom_root(tmp_path_factory):
    """KITTI-odometry-style root: sequences/09/image_2 + poses/09.txt."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("odom")
    img_dir = root / "sequences" / "09" / "image_2"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(2)
    n = 8
    for i in range(n):
        imageio.imwrite(
            img_dir / f"{i:06d}.png", (rng.rand(H, W, 3) * 255).astype(np.uint8)
        )
    poses = []
    p = np.eye(4)
    for i in range(n):
        p = p.copy()
        p[2, 3] += 1.0
        poses.append(p[:3].reshape(-1))
    (root / "poses").mkdir()
    np.savetxt(root / "poses" / "09.txt", np.stack(poses), fmt="%1.8e")
    return str(root)


def test_test_vo_and_eval_odom(pose_ckpt, odom_root, tmp_path):
    out = tmp_path / "vo"
    _run(
        [
            sys.executable, "test_vo.py",
            "--pretrained-posenet", pose_ckpt,
            "--img-height", str(H), "--img-width", str(W),
            "--dataset-dir", os.path.join(odom_root, "sequences") + os.sep,
            "--output-dir", str(out),
            "--sequence", "09",
            "--batch-size", "4",
        ]
    )
    traj = np.loadtxt(out / "09.txt")
    assert traj.shape == (8, 12)
    assert np.isfinite(traj).all()

    res = _run(
        [
            sys.executable, "kitti_eval/eval_odom.py",
            "--result", str(out),
            "--gt_dir", os.path.join(odom_root, "poses"),
            "--align", "7dof",
            "--seqs", "9",
            "--no-confirm", "--no-plot",
        ]
    )
    assert "Translational error" in res.stdout
    assert (out / "result.txt").exists()


def test_test_pose(pose_ckpt, odom_root, tmp_path):
    res = _run(
        [
            sys.executable, "test_pose.py", pose_ckpt,
            "--img-height", str(H), "--img-width", str(W),
            "--dataset-dir", odom_root,
            "--sequences", "09",
            "--output-dir", str(tmp_path / "pose_out"),
        ]
    )
    assert "ATE" in res.stdout and "mean" in res.stdout
    preds = np.load(tmp_path / "pose_out" / "predictions.npy")
    assert preds.shape == (4, 5, 3, 4)  # 8 frames -> 4 5-frame snippets


@pytest.fixture(scope="module")
def train_root(tmp_path_factory):
    """Tiny sequence-folder dataset with GT depth for --with-gt."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("train_data")
    rng = np.random.RandomState(3)
    for scene, train in [("scene_t", True), ("scene_v", False)]:
        d = root / scene
        d.mkdir()
        np.savetxt(d / "cam.txt", np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]]))
        for i in range(6):
            imageio.imwrite(
                d / f"{i:07d}.jpg", (rng.rand(H, W, 3) * 255).astype(np.uint8)
            )
            np.save(d / f"{i:07d}.npy", (1 + rng.rand(H, W) * 10).astype(np.float32))
    (root / "train.txt").write_text("scene_t\n")
    (root / "val.txt").write_text("scene_v\n")
    return str(root)


@pytest.fixture(scope="module")
def pair_root(tmp_path_factory):
    """NYU-style pair-folder dataset: consecutive jpg pairs, per-pair
    intrinsics txt (reference: datasets/pair_folders.py)."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("pair_data")
    rng = np.random.RandomState(7)
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
    for scene in ["scene_t", "scene_v"]:
        d = root / scene
        d.mkdir()
        for i in range(6):
            imageio.imwrite(
                d / f"{i:07d}.jpg", (rng.rand(H, W, 3) * 255).astype(np.uint8)
            )
        for p in range(3):
            np.savetxt(d / f"{p:07d}_cam.txt", K)
    (root / "train.txt").write_text("scene_t\n")
    (root / "val.txt").write_text("scene_v\n")
    return str(root)


@pytest.mark.slow
def test_train_cli_pair_folder(pair_root):
    """NYU-style training flow: --folder-type pair, photometric validation
    (no GT), as scripts/train_nyu.sh does (reference scripts/train_nyu.sh)."""
    res = _run(
        [
            sys.executable, "train.py", pair_root,
            "--name", "cli_pair_smoke",
            "--folder-type", "pair",
            "--dataset", "nyu",
            "--epochs", "1", "--epoch-size", "2",
            "-b", "2", "-j", "2",
            "--with-pretrain", "0",
            "--no-tensorboard",
            "--val-batches", "1",
        ],
        timeout=3000,
    )
    assert "Avg" in res.stdout
    import glob as g

    found = g.glob(os.path.join(
        REPO, "checkpoints", "cli_pair_smoke", "*", "exp_pose_checkpoint.msgpack"))
    assert found, "checkpoint not written"


@pytest.mark.slow
def test_train_cli_one_epoch(train_root, tmp_path):
    res = _run(
        [
            sys.executable, "train.py", train_root,
            "--name", "cli_smoke",
            "--epochs", "1", "--epoch-size", "2",
            "-b", "2", "-j", "2",
            "--with-gt",
            "--with-pretrain", "0",
            "--no-tensorboard",
            "--val-batches", "2",
        ],
        timeout=3000,
    )
    assert "Avg" in res.stdout
    # checkpoints land under REPO/checkpoints/cli_smoke/<ts>/
    import glob as g

    found = g.glob(os.path.join(REPO, "checkpoints", "cli_smoke", "*", "dispnet_checkpoint.msgpack"))
    assert found, "checkpoint not written"

    # the trained checkpoint feeds straight into the inference CLI
    # (test_disp globs *.png; our scenes are .jpg — pass a list file)
    out = tmp_path / "trained_preds"
    list_file = tmp_path / "files.txt"
    jpgs = sorted(g.glob(os.path.join(train_root, "scene_v", "*.jpg")))[:3]
    list_file.write_text("\n".join(jpgs) + "\n")
    _run(
        [
            sys.executable, "test_disp.py",
            "--pretrained-dispnet", sorted(found)[-1],
            "--img-height", str(H), "--img-width", str(W),
            "--dataset-list", str(list_file),
            "--output-dir", str(out),
            "--resnet-layers", "18",
            "--batch-size", "2",
        ]
    )
    preds = np.load(out / "predictions.npy")
    assert preds.shape == (3, H, W) and np.isfinite(preds).all()
