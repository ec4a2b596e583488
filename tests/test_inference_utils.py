"""Tests for inference helpers (image loading, normalization, batching)."""

import numpy as np
import pytest

from sc_sfmlearner_release_tpu.inference import (
    batched,
    load_image,
    normalize,
)


@pytest.fixture
def png_dir(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    paths = []
    for i in range(5):
        p = tmp_path / f"{i}.png"
        imageio.imwrite(p, (rng.rand(48, 64, 3) * 255).astype(np.uint8))
        paths.append(str(p))
    return paths


def test_normalize_matches_reference_formula():
    img = np.full((4, 4, 3), 255.0, np.float32)
    out = normalize(img)
    np.testing.assert_allclose(out, (1.0 - 0.45) / 0.225, rtol=1e-6)


def test_load_image_resize(png_dir):
    img = load_image(png_dir[0], 24, 32)
    assert img.shape == (24, 32, 3)
    assert img.dtype == np.float32
    img_up = load_image(png_dir[0], 96, 128)
    assert img_up.shape == (96, 128, 3)


def test_load_image_grayscale(tmp_path):
    import imageio.v2 as imageio

    p = tmp_path / "gray.png"
    imageio.imwrite(p, (np.random.RandomState(0).rand(20, 30) * 255).astype(np.uint8))
    img = load_image(str(p))
    assert img.shape == (20, 30, 3)


def test_batched_pads_final_batch(png_dir):
    batches = list(batched(png_dir, 2, 24, 32))
    assert len(batches) == 3
    assert all(b.shape == (2, 24, 32, 3) for b, _ in batches)
    assert [n for _, n in batches] == [2, 2, 1]
    last, _ = batches[-1]
    np.testing.assert_array_equal(last[0], last[1])  # padded by repetition
