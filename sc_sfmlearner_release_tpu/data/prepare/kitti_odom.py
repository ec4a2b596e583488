"""KITTI odometry ETL loader (sequences 00-08 train; 09/10 are test).

Behavioral parity target: /root/reference/data/kitti_odom_loader.py.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List

import numpy as np

from .common import imread, imresize

TRAIN_SETS = ["00", "01", "02", "03", "04", "05", "06", "07", "08"]
TEST_SETS = ["09", "10"]


class KittiOdomLoader:
    def __init__(self, dataset_dir: str, img_height: int = 256, img_width: int = 832):
        self.dataset_dir = dataset_dir
        self.img_height = img_height
        self.img_width = img_width
        self.cam_ids = ["2", "3"]
        self.scenes: List[str] = [
            d
            for d in sorted(glob.glob(os.path.join(dataset_dir, "sequences", "*")))
            if os.path.basename(d) in TRAIN_SETS
        ]

    def collect_scenes(self, drive: str) -> List[Dict]:
        train_scenes = []
        for cid in self.cam_ids:
            img_dir = os.path.join(drive, f"image_{cid}")
            frame_ids = sorted(
                os.path.splitext(os.path.basename(p))[0]
                for p in glob.glob(os.path.join(img_dir, "*.png"))
            )
            scene_data = {
                "cid": cid,
                "dir": drive,
                "frame_id": frame_ids,
                "rel_path": os.path.basename(drive) + "_" + cid,
            }
            sample = self.load_image(scene_data, 0)
            if sample is None:
                return []
            _, zoom_x, zoom_y = sample
            scene_data["intrinsics"] = self._read_calib(
                cid, os.path.join(drive, "calib.txt"), zoom_x, zoom_y
            )
            train_scenes.append(scene_data)
        return train_scenes

    def get_scene_imgs(self, scene_data: Dict) -> Iterator[Dict]:
        for i, frame_id in enumerate(scene_data["frame_id"]):
            yield {"img": self.load_image(scene_data, i)[0], "id": frame_id}

    def load_image(self, scene_data: Dict, tgt_idx: int):
        img_file = os.path.join(
            scene_data["dir"], f"image_{scene_data['cid']}",
            scene_data["frame_id"][tgt_idx] + ".png",
        )
        if not os.path.isfile(img_file):
            return None
        img = imread(img_file)
        zoom_y = self.img_height / img.shape[0]
        zoom_x = self.img_width / img.shape[1]
        return imresize(img, self.img_height, self.img_width), zoom_x, zoom_y

    @staticmethod
    def _read_calib(cid: str, path: str, zoom_x: float, zoom_y: float) -> np.ndarray:
        with open(path) as f:
            lines = f.readlines()
        vals = lines[int(cid)].split()[1:]
        proj = np.asarray(vals, np.float32).reshape(3, 4)
        calib = proj[:3, :3].copy()
        calib[0, :] *= zoom_x
        calib[1, :] *= zoom_y
        return calib
