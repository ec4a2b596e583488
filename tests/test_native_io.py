"""Tests for the native JPEG decode path (with imageio as the oracle)."""

import numpy as np
import pytest

from sc_sfmlearner_release_tpu.data import native_io


@pytest.fixture
def jpegs(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        img = (rng.rand(48, 72, 3) * 255).astype(np.uint8)
        p = tmp_path / f"{i}.jpg"
        imageio.imwrite(p, img, quality=95)
        paths.append(str(p))
    return paths


def test_fallback_matches_native(jpegs):
    """Native decode must match imageio's libjpeg output exactly at
    original size."""
    import imageio.v2 as imageio

    want = np.asarray(imageio.imread(jpegs[0])).astype(np.float32)
    got = native_io.imread_f32(jpegs[0])
    assert got.shape == want.shape
    if native_io.has_native():
        np.testing.assert_allclose(got, want, atol=1.0)  # decoder rounding


@pytest.mark.skipif(not native_io.has_native(), reason="extension not built")
def test_native_resize_shape_and_range(jpegs):
    img = native_io.imread_f32(jpegs[0], 24, 36)
    assert img.shape == (24, 36, 3)
    assert 0 <= img.min() and img.max() <= 255


@pytest.mark.skipif(not native_io.has_native(), reason="extension not built")
def test_batch_decode(jpegs):
    batch = native_io.imread_batch_f32(jpegs, 48, 72, threads=3)
    assert batch.shape == (6, 48, 72, 3)
    single = native_io.imread_f32(jpegs[2], 48, 72)
    np.testing.assert_allclose(batch[2], single, atol=1e-4)


@pytest.mark.skipif(not native_io.has_native(), reason="extension not built")
def test_native_resize_matches_cv2(jpegs):
    """Bilinear resize with half-pixel centers should track cv2 closely."""
    import cv2
    import imageio.v2 as imageio

    raw = np.asarray(imageio.imread(jpegs[1]))
    want = cv2.resize(raw, (36, 24), interpolation=cv2.INTER_LINEAR)
    got = native_io.imread_f32(jpegs[1], 24, 36)
    # native decodes at a DCT-scaled intermediate size before the bilinear
    # resample, so outputs differ from full-decode+resize; require only
    # close agreement on average (random-noise jpegs are the worst case).
    assert np.mean(np.abs(got - want.astype(np.float32))) < 16.0
    assert np.corrcoef(got.reshape(-1), want.reshape(-1).astype(np.float32))[0, 1] > 0.9


def test_decode_error(tmp_path):
    if not native_io.has_native():
        pytest.skip("extension not built")
    from sc_sfmlearner_release_tpu._native import scdepth_io

    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg")
    with pytest.raises(IOError):
        scdepth_io.decode_jpeg(str(bad))
