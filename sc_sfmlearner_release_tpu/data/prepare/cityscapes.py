"""Cityscapes ETL loader.

Behavioral parity target: /root/reference/data/cityscapes_loader.py —
leftImg8bit_sequence frames grouped into connected sub-sequences (split at
frame gaps), alternating frames into two half-rate scenes, JSON intrinsics
and vehicle speed, speed-based static filtering, and a bottom-25% crop to
remove the ego-car hood.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Iterator, List

import numpy as np

from .common import imread, imresize


class CityscapesLoader:
    def __init__(
        self,
        dataset_dir: str,
        split: str = "train",
        crop_bottom: bool = True,
        img_height: int = 171,
        img_width: int = 416,
    ):
        self.dataset_dir = dataset_dir
        self.split = split
        self.crop_bottom = crop_bottom
        self.img_height = img_height
        self.img_width = img_width
        self.min_speed = 2.0
        self.scenes: List[str] = sorted(
            d
            for d in glob.glob(
                os.path.join(dataset_dir, "leftImg8bit_sequence", split, "*")
            )
            if os.path.isdir(d)
        )
        print(f"Total scenes collected: {len(self.scenes)}")

    def collect_scenes(self, city: str) -> List[Dict]:
        img_files = sorted(glob.glob(os.path.join(city, "*.png")))
        scenes: Dict[str, List[str]] = {}
        for f in img_files:
            scene_id, frame_id = os.path.basename(f).split("_")[1:3]
            scenes.setdefault(scene_id, []).append(frame_id)

        out: List[Dict] = []
        for scene_id, frame_ids in scenes.items():
            # split into connected subsequences at frame-number gaps
            subscenes: List[List[str]] = []
            previous = None
            for fid in frame_ids:
                if previous is None or int(fid) - int(previous) > 1:
                    subscenes.append([])
                subscenes[-1].append(fid)
                previous = fid

            intrinsics = self._load_intrinsics(city, scene_id)
            city_name = os.path.basename(city)
            for sub in subscenes:
                speeds = [self._load_speed(city, scene_id, fid) for fid in sub]
                for parity in (0, 1):  # two half-rate interleaved scenes
                    out.append(
                        {
                            "city": city,
                            "scene_id": scene_id,
                            "rel_path": f"{city_name}_{scene_id}_{sub[0]}_{parity}",
                            "intrinsics": intrinsics,
                            "frame_ids": sub[parity::2],
                            "speeds": speeds[parity::2],
                        }
                    )
        return out

    def _load_intrinsics(self, city: str, scene_id: str) -> np.ndarray:
        city_name = os.path.basename(city)
        camera_folder = os.path.join(
            self.dataset_dir, "camera", self.split, city_name
        )
        camera_file = sorted(
            glob.glob(
                os.path.join(camera_folder, f"{city_name}_{scene_id}_*_camera.json")
            )
        )[0]
        frame_id = os.path.basename(camera_file).split("_")[2]
        frame_path = os.path.join(
            city, f"{city_name}_{scene_id}_{frame_id}_leftImg8bit.png"
        )

        with open(camera_file) as f:
            camera = json.load(f)
        intr = camera["intrinsic"]
        intrinsics = np.array(
            [
                [intr["fx"], 0, intr["u0"]],
                [0, intr["fy"], intr["v0"]],
                [0, 0, 1],
            ]
        )
        h, w = imread(frame_path).shape[:2]
        intrinsics[0] *= self.img_width / w
        intrinsics[1] *= self.img_height / h
        return intrinsics

    def _load_speed(self, city: str, scene_id: str, frame_id: str) -> float:
        city_name = os.path.basename(city)
        vehicle_file = os.path.join(
            self.dataset_dir, "vehicle_sequence", self.split, city_name,
            f"{city_name}_{scene_id}_{frame_id}_vehicle.json",
        )
        with open(vehicle_file) as f:
            return json.load(f)["speed"]

    def get_scene_imgs(self, scene_data: Dict) -> Iterator[Dict]:
        cum_speed = np.zeros(3)
        for i, frame_id in enumerate(scene_data["frame_ids"]):
            cum_speed += scene_data["speeds"][i]
            if np.linalg.norm(cum_speed) > self.min_speed:
                yield {
                    "img": self._load_image(
                        scene_data["city"], scene_data["scene_id"], frame_id
                    ),
                    "id": frame_id,
                }
                cum_speed *= 0

    def _load_image(self, city: str, scene_id: str, frame_id: str):
        city_name = os.path.basename(city)
        img_file = os.path.join(
            city, f"{city_name}_{scene_id}_{frame_id}_leftImg8bit.png"
        )
        if not os.path.isfile(img_file):
            return None
        img = imresize(imread(img_file), self.img_height, self.img_width)
        if self.crop_bottom:
            img = img[: int(self.img_height * 0.75)]
        return img
