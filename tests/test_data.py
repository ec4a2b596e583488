"""Data pipeline tests: crawlers, intrinsics-aware transforms, batch loader."""

import os

import numpy as np
import pytest

from sc_sfmlearner_release_tpu.data import (
    BatchLoader,
    PairSet,
    SequenceSet,
    ValidationSet,
    transforms,
)


@pytest.fixture
def scene_root(tmp_path):
    """Two tiny scenes in the reference's on-disk format."""
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    for scene, n in [("scene_a", 6), ("scene_b", 4)]:
        d = tmp_path / scene
        (d / "depth").mkdir(parents=True)
        np.savetxt(
            d / "cam.txt", np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
        )
        for i in range(n):
            img = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
            imageio.imwrite(d / f"{i:07d}.jpg", img)
            np.save(d / f"{i:07d}.npy", 1 + rng.rand(24, 32).astype(np.float32))
    (tmp_path / "train.txt").write_text("scene_a\n")
    (tmp_path / "val.txt").write_text("scene_b\n")
    return str(tmp_path)


def test_sequence_set_snippets(scene_root):
    ds = SequenceSet(scene_root, train=True, sequence_length=3)
    # scene_a has 6 frames -> 4 centered snippets
    assert len(ds) == 4
    rng = np.random.default_rng(0)
    s = ds.load(0, rng)
    assert s["tgt"].shape == (24, 32, 3)
    assert s["refs"].shape == (2, 24, 32, 3)
    assert s["intrinsics"].shape == (3, 3)


def test_sequence_set_skip_frames(scene_root):
    ds = SequenceSet(scene_root, train=True, sequence_length=3, skip_frames=2)
    assert len(ds) == 2  # frames 2..3 are valid centers with ±2


def test_validation_set(scene_root):
    ds = ValidationSet(scene_root, dataset="kitti")
    assert len(ds) == 4
    s = ds.load(0, np.random.default_rng(0))
    assert s["img"].shape == (24, 32, 3)
    assert s["depth"].shape == (24, 32)


def test_validation_set_nyu_depth_single_channel(scene_root):
    """NYU GT depth pngs (uint16, /5000) must load as [H, W] — the RGB
    image reader's grayscale->3-channel stacking handed the eval step a
    [H, W, 3] depth map (caught by the NYU runbook smoke, round 4)."""
    import os

    import imageio.v2 as imageio

    rng = np.random.RandomState(1)
    d = os.path.join(scene_root, "scene_b", "depth")
    for i in range(4):
        depth = ((rng.rand(24, 32) * 4 + 1) * 5000).astype(np.uint16)
        imageio.imwrite(os.path.join(d, f"{i:07d}.png"), depth)
    ds = ValidationSet(scene_root, dataset="nyu")
    s = ds.load(0, np.random.default_rng(0))
    assert s["depth"].shape == (24, 32)
    assert 0.5 < s["depth"].mean() < 6.0  # /5000 scaling applied


def test_flip_adjusts_cx():
    rng_flip = np.random.default_rng(1)  # first draw < 0.5 -> flips
    imgs = [np.arange(24.0).reshape(2, 4, 3)]
    k = np.array([[10.0, 0, 1.0], [0, 10.0, 1.0], [0, 0, 1]], np.float32)
    t = transforms.RandomHorizontalFlip()
    # Find a generator state that flips.
    for seed in range(10):
        rng = np.random.default_rng(seed)
        if np.random.default_rng(seed).random() < 0.5:
            out, k2 = t(imgs, k, rng)
            np.testing.assert_allclose(out[0], imgs[0][:, ::-1])
            assert k2[0, 2] == 4 - 1.0
            return
    pytest.fail("no flipping seed found")


def test_scale_crop_adjusts_intrinsics():
    rng = np.random.default_rng(3)
    img = (np.random.RandomState(0).rand(40, 60, 3) * 255).astype(np.float32)
    k = np.array([[50.0, 0, 30.0], [0, 50.0, 20.0], [0, 0, 1]], np.float32)
    out, k2 = transforms.RandomScaleCrop()( [img, img.copy()], k, rng)
    assert out[0].shape == img.shape  # crop restores the size
    assert k2[0, 0] >= k[0, 0] and k2[1, 1] >= k[1, 1]  # zoom >= 1
    np.testing.assert_allclose(out[0], out[1])  # coherent across the snippet


def test_normalize_pipeline_range():
    rng = np.random.default_rng(0)
    img = np.full((8, 8, 3), 255.0, np.float32)
    out, _ = transforms.valid_transform()([img], None, rng)
    # (1.0 - 0.45) / 0.225
    np.testing.assert_allclose(out[0], (1.0 - 0.45) / 0.225, rtol=1e-6)


def test_batch_loader_shapes_and_determinism(scene_root):
    ds = SequenceSet(scene_root, train=True, transform=transforms.train_transform())
    loader = BatchLoader(ds, batch_size=2, num_workers=2, seed=7)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["tgt"].shape == (2, 24, 32, 3)
    assert b["refs"].shape == (2, 2, 24, 32, 3)
    assert b["intrinsics"].shape == (2, 3, 3)

    again = list(BatchLoader(ds, batch_size=2, num_workers=4, seed=7))
    for k in ("tgt", "refs", "intrinsics"):
        np.testing.assert_array_equal(batches[0][k], again[0][k])

    loader.set_epoch(1)
    shuffled = list(loader)
    assert not np.array_equal(batches[0]["tgt"], shuffled[0]["tgt"])


def test_batch_loader_pads_validation(scene_root):
    ds = ValidationSet(scene_root, dataset="kitti")
    loader = BatchLoader(ds, batch_size=3, shuffle=False, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    assert int(batches[0]["_n_valid"]) == 3
    assert int(batches[1]["_n_valid"]) == 1
    assert batches[1]["img"].shape[0] == 3  # padded to full shape


def test_batch_loader_process_sharding(scene_root):
    """Two 'processes' partition every global batch without overlap and in
    global-batch order."""
    ds = SequenceSet(scene_root, train=True, transform=transforms.valid_transform())
    full = list(BatchLoader(ds, batch_size=4, shuffle=False, drop_last=True))
    p0 = list(BatchLoader(ds, batch_size=4, shuffle=False, drop_last=True,
                          process_index=0, process_count=2))
    p1 = list(BatchLoader(ds, batch_size=4, shuffle=False, drop_last=True,
                          process_index=1, process_count=2))
    assert len(full) == len(p0) == len(p1) == 1
    np.testing.assert_array_equal(p0[0]["tgt"], full[0]["tgt"][:2])
    np.testing.assert_array_equal(p1[0]["tgt"], full[0]["tgt"][2:])

    import pytest as _pytest

    with _pytest.raises(ValueError):
        BatchLoader(ds, batch_size=3, process_count=2)
