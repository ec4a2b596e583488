"""KITTI raw ETL loader.

Behavioral parity target: /root/reference/data/kitti_raw_loader.py — crawls
the 5 recording dates, excludes Eigen test drives, builds per-camera (02/03)
scenes with OXTS-derived camera poses, filters static frames (by cumulative
speed or an explicit list), and optionally projects velodyne points into
sparse GT depth maps.

The velodyne projection's duplicate-pixel resolution uses a vectorized
``np.minimum.at`` scatter instead of the reference's Counter loop
(kitti_raw_loader.py:292-298) — same result, orders of magnitude faster.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from .common import (
    imread,
    imresize,
    pose_from_oxts_packet,
    read_calib_file,
    transform_from_rot_trans,
)

DATE_LIST = [
    "2011_09_26", "2011_09_28", "2011_09_29", "2011_09_30", "2011_10_03",
]


class KittiRawLoader:
    def __init__(
        self,
        dataset_dir: str,
        static_frames_file: Optional[str] = None,
        img_height: int = 128,
        img_width: int = 416,
        min_speed: float = 2.0,
        get_depth: bool = False,
        get_pose: bool = False,
        depth_size_ratio: int = 1,
        test_scenes_file: Optional[str] = None,
    ):
        self.from_speed = static_frames_file is None
        self.static_frames: Dict[str, List[str]] = {}
        if static_frames_file is not None:
            self._collect_static_frames(static_frames_file)

        self.test_scenes: List[str] = []
        if test_scenes_file is not None:
            with open(test_scenes_file) as f:
                self.test_scenes = [line.strip() for line in f if line.strip()]

        self.dataset_dir = dataset_dir
        self.img_height = img_height
        self.img_width = img_width
        self.cam_ids = ["02", "03"]
        self.min_speed = min_speed
        self.get_depth = get_depth
        self.get_pose = get_pose
        self.depth_size_ratio = depth_size_ratio
        self._collect_train_folders()

    def _collect_static_frames(self, path: str) -> None:
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 3:
                    continue
                date, drive, frame_id = parts
                self.static_frames.setdefault(drive, []).append(
                    f"{int(frame_id):010d}"
                )

    def _collect_train_folders(self) -> None:
        self.scenes: List[str] = []
        for date in DATE_LIST:
            for drive in sorted(glob.glob(os.path.join(self.dataset_dir, date, "*"))):
                if not os.path.isdir(drive):
                    continue
                name = os.path.basename(drive)
                if name[:-5] not in self.test_scenes:
                    self.scenes.append(drive)

    # -- per-scene ---------------------------------------------------------

    def collect_scenes(self, drive: str) -> List[Dict]:
        date_dir = os.path.dirname(drive)
        imu2velo = read_calib_file(os.path.join(date_dir, "calib_imu_to_velo.txt"))
        velo2cam = read_calib_file(os.path.join(date_dir, "calib_velo_to_cam.txt"))
        cam2cam = read_calib_file(os.path.join(date_dir, "calib_cam_to_cam.txt"))

        velo2cam_mat = transform_from_rot_trans(velo2cam["R"], velo2cam["T"])
        imu2velo_mat = transform_from_rot_trans(imu2velo["R"], imu2velo["T"])
        cam_2rect_mat = transform_from_rot_trans(cam2cam["R_rect_00"], np.zeros(3))
        imu2cam = cam_2rect_mat @ velo2cam_mat @ imu2velo_mat
        imu2cam_inv = np.linalg.inv(imu2cam)

        oxts_files = sorted(
            glob.glob(os.path.join(drive, "oxts", "data", "*.txt"))
        )

        train_scenes = []
        for cid in self.cam_ids:
            scene_data: Dict = {
                "cid": cid,
                "dir": drive,
                "speed": [],
                "frame_id": [],
                "pose": [],
                "rel_path": os.path.basename(drive) + "_" + cid,
            }
            scale = None
            origin_inv = None
            for n, f in enumerate(oxts_files):
                metadata = np.genfromtxt(f)
                scene_data["speed"].append(metadata[8:11])
                scene_data["frame_id"].append(f"{n:010d}")
                if scale is None:
                    scale = np.cos(metadata[0] * np.pi / 180.0)
                pose = pose_from_oxts_packet(metadata[:6], scale)
                if origin_inv is None:
                    origin_inv = np.linalg.inv(pose)
                odo_pose = imu2cam @ origin_inv @ pose @ imu2cam_inv
                scene_data["pose"].append(odo_pose[:3])

            sample = self.load_image(scene_data, 0)
            if sample is None:
                return []
            scene_data["P_rect"] = self._get_p_rect(
                cam2cam, cid, sample[1], sample[2]
            )
            scene_data["intrinsics"] = scene_data["P_rect"][:, :3]
            train_scenes.append(scene_data)
        return train_scenes

    def get_scene_imgs(self, scene_data: Dict) -> Iterator[Dict]:
        def construct(i: int, frame_id: str) -> Dict:
            sample = {"img": self.load_image(scene_data, i)[0], "id": frame_id}
            if self.get_depth:
                sample["depth"] = self.generate_depth_map(scene_data, i)
            if self.get_pose:
                sample["pose"] = scene_data["pose"][i]
            return sample

        if self.from_speed:
            cum_speed = np.zeros(3)
            for i, speed in enumerate(scene_data["speed"]):
                cum_speed += speed
                if np.linalg.norm(cum_speed) > self.min_speed:
                    yield construct(i, scene_data["frame_id"][i])
                    cum_speed *= 0
        else:
            drive = os.path.basename(scene_data["dir"])
            statics = set(self.static_frames.get(drive, ()))
            for i, frame_id in enumerate(scene_data["frame_id"]):
                if frame_id not in statics:
                    yield construct(i, frame_id)

    def _get_p_rect(self, cam2cam: Dict, cid: str, zoom_x: float, zoom_y: float):
        p_rect = np.copy(cam2cam["P_rect_" + cid]).reshape(3, 4)
        p_rect[0] *= zoom_x
        p_rect[1] *= zoom_y
        return p_rect

    def load_image(self, scene_data: Dict, tgt_idx: int):
        img_file = os.path.join(
            scene_data["dir"], f"image_{scene_data['cid']}", "data",
            scene_data["frame_id"][tgt_idx] + ".png",
        )
        if not os.path.isfile(img_file):
            return None
        img = imread(img_file)
        zoom_y = self.img_height / img.shape[0]
        zoom_x = self.img_width / img.shape[1]
        return imresize(img, self.img_height, self.img_width), zoom_x, zoom_y

    def generate_depth_map(self, scene_data: Dict, tgt_idx: int) -> np.ndarray:
        """Project velodyne points into a sparse depth map (KITTI protocol:
        round-minus-one pixel snapping, min-depth on duplicates)."""
        calib_dir = os.path.dirname(scene_data["dir"])
        cam2cam = read_calib_file(os.path.join(calib_dir, "calib_cam_to_cam.txt"))
        velo2cam = read_calib_file(os.path.join(calib_dir, "calib_velo_to_cam.txt"))
        velo2cam_mat = transform_from_rot_trans(velo2cam["R"], velo2cam["T"])

        r_cam2rect = np.eye(4)
        r_cam2rect[:3, :3] = cam2cam["R_rect_00"].reshape(3, 3)

        p_rect = np.copy(scene_data["P_rect"])
        p_rect[0] /= self.depth_size_ratio
        p_rect[1] /= self.depth_size_ratio
        p_velo2im = p_rect @ r_cam2rect @ velo2cam_mat

        velo_file = os.path.join(
            scene_data["dir"], "velodyne_points", "data",
            scene_data["frame_id"][tgt_idx] + ".bin",
        )
        velo = np.fromfile(velo_file, dtype=np.float32).reshape(-1, 4)
        velo[:, 3] = 1.0
        velo = velo[velo[:, 0] >= 0]  # points in front of the camera

        pts = (p_velo2im @ velo.T).T
        pts[:, :2] = pts[:, :2] / pts[:, 2:3]
        # round - 1 matches the KITTI matlab devkit exactly
        pts[:, 0] = np.round(pts[:, 0]) - 1
        pts[:, 1] = np.round(pts[:, 1]) - 1

        h = self.img_height // self.depth_size_ratio
        w = self.img_width // self.depth_size_ratio
        valid = (
            (pts[:, 0] >= 0) & (pts[:, 1] >= 0)
            & (pts[:, 0] < w) & (pts[:, 1] < h)
        )
        pts = pts[valid]

        depth = np.full((h, w), np.inf, np.float32)
        ys = pts[:, 1].astype(np.int64)
        xs = pts[:, 0].astype(np.int64)
        # duplicate pixels keep the minimum (closest) depth
        np.minimum.at(depth, (ys, xs), pts[:, 2].astype(np.float32))
        depth[~np.isfinite(depth)] = 0.0
        depth[depth < 0] = 0.0
        return depth
