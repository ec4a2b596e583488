"""Packed raw-frame dataset (data/packed.py): pack ETL + loader parity.

The packed path must be byte-identical to the JPEG path: pack decodes the
same JPEGs once, so PackedSequenceSet samples must equal SequenceSet samples
exactly, uint8 and transformed alike, and the uint8 device-augment entry must
match the float one.
"""

import os

import numpy as np
import pytest

from sc_sfmlearner_release_tpu.data import (
    BatchLoader,
    PackedSequenceSet,
    SequenceSet,
    pack_dataset,
    transforms,
)


@pytest.fixture
def scene_root(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    for scene, n in [("scene_a", 6), ("scene_b", 4)]:
        d = tmp_path / scene
        d.mkdir(parents=True)
        np.savetxt(
            d / "cam.txt", np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
        )
        for i in range(n):
            img = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
            imageio.imwrite(d / f"{i:07d}.jpg", img)
    (tmp_path / "train.txt").write_text("scene_a\n")
    (tmp_path / "val.txt").write_text("scene_b\n")
    return str(tmp_path)


def test_pack_and_index(scene_root):
    out = pack_dataset(scene_root)
    assert os.path.isfile(os.path.join(out, "frames.u8"))
    ds = PackedSequenceSet(out, train=True, sequence_length=3)
    assert len(ds) == 4  # 6 frames -> 4 centered snippets
    val = PackedSequenceSet(out, train=False, sequence_length=3)
    assert len(val) == 2


def test_packed_matches_jpeg_path(scene_root):
    """Raw uint8 samples == the JPEG crawler's decoded frames, exactly."""
    out = pack_dataset(scene_root)
    jpeg = SequenceSet(scene_root, train=True, sequence_length=3)
    packed = PackedSequenceSet(out, train=True, sequence_length=3)
    rng = np.random.default_rng(0)
    for i in range(len(jpeg)):
        a = jpeg.load(i, rng)
        b = packed.load(i, rng)
        assert b["tgt"].dtype == np.uint8
        np.testing.assert_array_equal(a["tgt"].astype(np.uint8), b["tgt"])
        np.testing.assert_array_equal(a["refs"].astype(np.uint8), b["refs"])
        np.testing.assert_array_equal(a["intrinsics"], b["intrinsics"])


def test_packed_with_host_transform(scene_root):
    """With a transform, packed and JPEG paths produce identical floats
    for the same per-sample RNG stream."""
    out = pack_dataset(scene_root)
    tf = transforms.train_transform()
    jpeg = SequenceSet(scene_root, train=True, sequence_length=3, transform=tf)
    packed = PackedSequenceSet(out, train=True, sequence_length=3, transform=tf)
    for i in range(len(jpeg)):
        a = jpeg.load(i, np.random.default_rng(7 + i))
        b = packed.load(i, np.random.default_rng(7 + i))
        np.testing.assert_allclose(a["tgt"], b["tgt"], atol=1e-6)
        np.testing.assert_allclose(a["intrinsics"], b["intrinsics"], atol=1e-6)


def test_packed_batch_loader(scene_root):
    out = pack_dataset(scene_root)
    ds = PackedSequenceSet(out, train=True, sequence_length=3)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["tgt"].dtype == np.uint8
    assert batches[0]["tgt"].shape == (2, 24, 32, 3)
    assert batches[0]["refs"].shape == (2, 2, 24, 32, 3)


def test_device_augment_uint8_equals_float(scene_root):
    """uint8 ingest + on-device convert == float [0,1] ingest, same draws."""
    import jax
    import jax.numpy as jnp

    from sc_sfmlearner_release_tpu.data.device_augment import (
        AugmentConfig, augment_with_draws, make_device_augment, sample_draws,
        _to_unit_float,
    )

    rng = np.random.RandomState(3)
    u8 = {
        "tgt": rng.randint(0, 256, (2, 24, 32, 3), np.uint8),
        "refs": rng.randint(0, 256, (2, 2, 24, 32, 3), np.uint8),
        "intrinsics": np.broadcast_to(
            np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]], np.float32),
            (2, 3, 3),
        ).copy(),
    }
    f32 = {
        "tgt": u8["tgt"].astype(np.float32) / 255.0,
        "refs": u8["refs"].astype(np.float32) / 255.0,
        "intrinsics": u8["intrinsics"],
    }
    cfg = AugmentConfig()
    key = jax.random.PRNGKey(11)
    aug = make_device_augment(cfg)
    a = jax.jit(aug)(key, {k: jnp.asarray(v) for k, v in u8.items()})
    b = jax.jit(aug)(key, {k: jnp.asarray(v) for k, v in f32.items()})
    np.testing.assert_allclose(np.asarray(a["tgt"]), np.asarray(b["tgt"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["intrinsics"]),
                               np.asarray(b["intrinsics"]), atol=1e-5)
