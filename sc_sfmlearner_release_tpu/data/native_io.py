"""Image IO with the native fast path.

Prefers the C++ ``scdepth_io`` extension (GIL-releasing, internally threaded
JPEG decode + bilinear resize; build with ``python native/build.py``) and
falls back to imageio/cv2 transparently. The dataset crawlers route all JPEG
decodes through here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:  # pragma: no cover - exercised when the extension is built
    from sc_sfmlearner_release_tpu._native import scdepth_io as _native
except ImportError:
    _native = None


def has_native() -> bool:
    return _native is not None


def imread_f32(path: str, height: Optional[int] = None,
               width: Optional[int] = None) -> np.ndarray:
    """Load an RGB image as float32 [0, 255] HWC, optionally resized."""
    if _native is not None and path.lower().endswith((".jpg", ".jpeg")):
        arr = _native.decode_jpeg(path, height or 0, width or 0)
        return arr.astype(np.float32)

    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path)).astype(np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = img[..., :3]
    if height is not None and (img.shape[0] != height or img.shape[1] != width):
        import cv2

        interp = (
            cv2.INTER_AREA
            if img.shape[0] > height or img.shape[1] > width
            else cv2.INTER_LINEAR
        )
        img = cv2.resize(img, (width, height), interpolation=interp)
    return img


def imread_u8(path: str) -> np.ndarray:
    """Load an RGB image as uint8 HWC at native resolution (packed ETL)."""
    if _native is not None and path.lower().endswith((".jpg", ".jpeg")):
        return np.asarray(_native.decode_jpeg(path, 0, 0), dtype=np.uint8)

    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img[..., :3].astype(np.uint8)


def imread_batch_f32(paths: Sequence[str], height: int, width: int,
                     threads: int = 0) -> np.ndarray:
    """Decode many JPEGs into one ``[N, H, W, 3]`` float32 array."""
    if _native is not None and all(
        p.lower().endswith((".jpg", ".jpeg")) for p in paths
    ):
        return _native.decode_jpeg_batch(
            list(paths), height, width, threads
        ).astype(np.float32)
    return np.stack([imread_f32(p, height, width) for p in paths])
