"""ETL tests on a synthetic KITTI-raw-style directory tree."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture
def kitti_raw_root(tmp_path):
    """A miniature KITTI raw tree: one date, one drive, cams 02/03, OXTS,
    calib, velodyne."""
    import imageio.v2 as imageio

    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    ddir = tmp_path / date / drive
    n_frames = 6
    rng = np.random.RandomState(0)

    for cid in ("02", "03"):
        img_dir = ddir / f"image_{cid}" / "data"
        img_dir.mkdir(parents=True)
        for i in range(n_frames):
            imageio.imwrite(
                img_dir / f"{i:010d}.png",
                (rng.rand(64, 208, 3) * 255).astype(np.uint8),
            )

    oxts_dir = ddir / "oxts" / "data"
    oxts_dir.mkdir(parents=True)
    for i in range(n_frames):
        # lat, lon, alt, roll, pitch, yaw + padding to field 8:11 (speed)
        meta = np.zeros(30)
        meta[0] = 49.0 + i * 1e-6  # lat
        meta[1] = 8.43 + i * 1e-5  # lon
        meta[2] = 112.0
        meta[8:11] = [5.0, 0.0, 0.0]  # speed > min_speed
        np.savetxt(oxts_dir / f"{i:010d}.txt", meta[None])

    velo_dir = ddir / "velodyne_points" / "data"
    velo_dir.mkdir(parents=True)
    for i in range(n_frames):
        pts = rng.rand(500, 4).astype(np.float32)
        pts[:, 0] = pts[:, 0] * 20 + 2  # forward
        pts[:, 1] = (pts[:, 1] - 0.5) * 10
        pts[:, 2] = (pts[:, 2] - 0.5) * 2
        pts.tofile(velo_dir / f"{i:010d}.bin")

    k = [200.0, 0.0, 104.0, 0.0, 0.0, 200.0, 32.0, 0.0, 0.0, 0.0, 1.0, 0.0]
    calib_cam = "\n".join(
        [
            "R_rect_00: 1 0 0 0 1 0 0 0 1",
            "P_rect_02: " + " ".join(str(v) for v in k),
            "P_rect_03: " + " ".join(str(v) for v in k),
        ]
    )
    (tmp_path / date / "calib_cam_to_cam.txt").write_text(calib_cam)
    (tmp_path / date / "calib_velo_to_cam.txt").write_text(
        "R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0"
    )
    (tmp_path / date / "calib_imu_to_velo.txt").write_text(
        "R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0"
    )
    return tmp_path


def test_kitti_raw_loader(kitti_raw_root):
    from sc_sfmlearner_release_tpu.data.prepare import KittiRawLoader

    loader = KittiRawLoader(
        str(kitti_raw_root), img_height=64, img_width=208,
        get_depth=True, get_pose=True,
    )
    assert len(loader.scenes) == 1

    scenes = loader.collect_scenes(loader.scenes[0])
    assert len(scenes) == 2  # cam 02 + 03
    scene = scenes[0]
    assert scene["intrinsics"].shape == (3, 3)

    samples = list(loader.get_scene_imgs(scene))
    assert len(samples) >= 4  # speed filter keeps moving frames
    s = samples[0]
    assert s["img"].shape == (64, 208, 3)
    assert s["depth"].shape == (64, 208)
    assert (s["depth"] >= 0).all() and s["depth"].max() > 0
    assert s["pose"].shape == (3, 4)


def test_pose_chain_consistency(kitti_raw_root):
    """OXTS poses are first-frame-relative: frame 0 pose should be identity."""
    from sc_sfmlearner_release_tpu.data.prepare import KittiRawLoader

    loader = KittiRawLoader(str(kitti_raw_root), img_height=64, img_width=208)
    scene = loader.collect_scenes(loader.scenes[0])[0]
    np.testing.assert_allclose(
        scene["pose"][0], np.eye(4)[:3], atol=1e-9
    )


def test_prepare_cli_end_to_end(kitti_raw_root, tmp_path):
    dump = tmp_path / "dump"
    cmd = [
        sys.executable, "data/prepare_train_data.py", str(kitti_raw_root),
        "--dataset-format", "kitti_raw", "--dump-root", str(dump),
        "--height", "64", "--width", "208", "--num-threads", "1",
        "--with-depth", "--with-pose",
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # avoid TPU-tunnel registration
    res = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert res.returncode == 0, res.stderr

    scene_dirs = sorted(p for p in dump.iterdir() if p.is_dir())
    assert len(scene_dirs) == 2
    for d in scene_dirs:
        assert (d / "cam.txt").exists()
        assert (d / "poses.txt").exists()
        jpgs = list(d.glob("*.jpg"))
        npys = list(d.glob("*.npy"))
        assert len(jpgs) >= 3 and len(npys) == len(jpgs)

    train = (dump / "train.txt").read_text().splitlines()
    val = (dump / "val.txt").read_text().splitlines()
    # both cameras of the single scene land in the same split
    assert (len(train) == 2) != (len(val) == 2)

    # the dumped scenes load through the training dataset path
    from sc_sfmlearner_release_tpu.data import SequenceSet

    list_file = "train.txt" if train else "val.txt"
    ds = SequenceSet(str(dump), train=bool(train), sequence_length=3)
    assert len(ds) > 0
    sample = ds.load(0, np.random.default_rng(0))
    assert sample["tgt"].shape == (64, 208, 3)
