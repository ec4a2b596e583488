"""Shared ETL helpers: calibration parsing, SE(3) assembly, image IO."""

from __future__ import annotations

from typing import Dict

import numpy as np


def rotx(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def roty(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rotz(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def transform_from_rot_trans(r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """4x4 SE(3) from rotation (9,) / (3,3) and translation (3,)."""
    r = np.asarray(r).reshape(3, 3)
    t = np.asarray(t).reshape(3, 1)
    return np.vstack((np.hstack([r, t]), [0, 0, 0, 1]))


def pose_from_oxts_packet(metadata: np.ndarray, scale: float) -> np.ndarray:
    """OXTS GPS/IMU packet -> SE(3) via Mercator projection
    (reference: /root/reference/data/kitti_raw_loader.py:35-57)."""
    lat, lon, alt, roll, pitch, yaw = metadata
    er = 6378137.0  # earth radius, meters
    ty = lat * np.pi * er / 180.0
    tx = scale * lon * np.pi * er / 180.0
    tz = alt
    t = np.array([tx, ty, tz])
    r = rotz(yaw) @ roty(pitch) @ rotx(roll)
    return transform_from_rot_trans(r, t)


def read_calib_file(path: str) -> Dict[str, np.ndarray]:
    """KITTI calibration txt -> {key: float array} (non-numeric kept as str)."""
    data: Dict[str, np.ndarray] = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, value = line.split(":", 1)
            value = value.strip()
            try:
                data[key] = np.array([float(x) for x in value.split()])
            except ValueError:
                data[key] = value  # dates etc.
    return data


def imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path))


def imresize(img: np.ndarray, height: int, width: int) -> np.ndarray:
    import cv2

    interp = (
        cv2.INTER_AREA
        if img.shape[0] > height or img.shape[1] > width
        else cv2.INTER_LINEAR
    )
    return cv2.resize(img, (width, height), interpolation=interp)
