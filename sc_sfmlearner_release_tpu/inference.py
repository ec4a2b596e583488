"""Shared inference utilities for the eval/test CLIs.

Image loading matches the reference CLIs' preprocessing
(/root/reference/test_disp.py:26-33): resize to the network resolution,
normalize ``((x/255) - 0.45) / 0.225``. Resizing uses cv2 INTER_AREA for
downscale (anti-aliased, like the reference's skimage resize) and
INTER_LINEAR for upscale.

Unlike the reference's batch-1 loops, CLIs here batch frames and run fixed
shapes so XLA compiles once and the MXU stays fed.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional, Sequence

import numpy as np


def load_image(
    path: str, height: Optional[int] = None, width: Optional[int] = None
) -> np.ndarray:
    """Load an RGB image as float32 HWC, optionally resized, in [0, 255]."""
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


def normalize(img: np.ndarray) -> np.ndarray:
    """[0,255] -> standardized (reference: test_disp.py:32)."""
    return (img / 255.0 - 0.45) / 0.225


def load_normalized(path: str, height: int, width: int) -> np.ndarray:
    return normalize(load_image(path, height, width))


def batched(paths: Sequence[str], batch_size: int, height: int, width: int
            ) -> Iterator[tuple]:
    """Yield (padded_batch [B,H,W,3], n_valid) over image paths.

    The last batch is padded by repeating the final image so every call has
    the same shape (one XLA compile)."""
    for start in range(0, len(paths), batch_size):
        chunk = list(paths[start : start + batch_size])
        n_valid = len(chunk)
        while len(chunk) < batch_size:
            chunk.append(chunk[-1])
        batch = np.stack([load_normalized(p, height, width) for p in chunk])
        yield batch, n_valid


def restore_disp_variables(path: str, resnet_layers: int):
    """Load DispNet variables from .msgpack (ours) or torch .pth.tar."""
    from .models import convert as C

    if path.endswith((".pth", ".pth.tar", ".pt")):
        return C.convert_disp_checkpoint(C.load_torch_state_dict(path), resnet_layers)
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def restore_pose_variables(path: str, resnet_layers: int = 18):
    from .models import convert as C

    if path.endswith((".pth", ".pth.tar", ".pt")):
        return C.convert_pose_checkpoint(C.load_torch_state_dict(path), resnet_layers)
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())
