#!/usr/bin/env python
"""Offline ETL: dump raw KITTI / Cityscapes recordings into the training
scene format (root/scene_x/NNN.jpg + cam.txt [+ NNN.npy depth / poses.txt]).

CLI parity with /root/reference/data/prepare_train_data.py, including the
seeded 90/10 train/val split that keeps both cameras of a physical scene in
the same split. Uses a multiprocessing pool for scene fan-out.
"""

from __future__ import annotations

import argparse
import glob
import multiprocessing
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("dataset_dir", metavar="DIR", help="path to original dataset")
    p.add_argument("--dataset-format", type=str, default="kitti_raw",
                   choices=["kitti_raw", "cityscapes", "kitti_odom"])
    p.add_argument("--static-frames", default=None,
                   help="list of static frames to discard (KITTI); if unset, "
                   "frames are discarded by cumulative speed")
    p.add_argument("--test-scenes", default=None,
                   help="file listing KITTI raw test drives to exclude "
                   "(Eigen split held-out scenes)")
    p.add_argument("--with-depth", action="store_true",
                   help="store velodyne GT depth .npy next to images")
    p.add_argument("--with-pose", action="store_true",
                   help="store OXTS GT poses.txt per scene")
    p.add_argument("--no-train-gt", action="store_true",
                   help="delete GT depth from train scenes to save space")
    p.add_argument("--dump-root", type=str, default="dump")
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=416)
    p.add_argument("--depth-size-ratio", type=int, default=1)
    p.add_argument("--num-threads", type=int, default=4)
    return p


def make_loader(args):
    from sc_sfmlearner_release_tpu.data.prepare import (
        CityscapesLoader, KittiOdomLoader, KittiRawLoader,
    )

    if args.dataset_format == "kitti_raw":
        return KittiRawLoader(
            args.dataset_dir,
            static_frames_file=args.static_frames,
            img_height=args.height,
            img_width=args.width,
            get_depth=args.with_depth,
            get_pose=args.with_pose,
            depth_size_ratio=args.depth_size_ratio,
            test_scenes_file=args.test_scenes,
        )
    if args.dataset_format == "kitti_odom":
        return KittiOdomLoader(
            args.dataset_dir, img_height=args.height, img_width=args.width
        )
    return CityscapesLoader(
        args.dataset_dir, img_height=args.height, img_width=args.width
    )


def dump_example(packed):
    args, scene = packed
    import imageio.v2 as imageio

    data_loader = make_loader(args)
    for scene_data in data_loader.collect_scenes(scene):
        dump_dir = os.path.join(args.dump_root, scene_data["rel_path"])
        os.makedirs(dump_dir, exist_ok=True)
        np.savetxt(os.path.join(dump_dir, "cam.txt"), scene_data["intrinsics"])

        poses = []
        for sample in data_loader.get_scene_imgs(scene_data):
            img, frame_nb = sample["img"], sample["id"]
            imageio.imwrite(os.path.join(dump_dir, f"{frame_nb}.jpg"), img)
            if "pose" in sample:
                poses.append(np.asarray(sample["pose"]).reshape(-1).tolist())
            if "depth" in sample:
                np.save(os.path.join(dump_dir, f"{frame_nb}.npy"), sample["depth"])
        if poses:
            np.savetxt(
                os.path.join(dump_dir, "poses.txt"),
                np.asarray(poses).reshape(-1, 12), fmt="%.6e",
            )

        if len(glob.glob(os.path.join(dump_dir, "*.jpg"))) < 3:
            import shutil

            shutil.rmtree(dump_dir)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    os.makedirs(args.dump_root, exist_ok=True)

    data_loader = make_loader(args)
    scenes = list(data_loader.scenes)
    print(f"Found {len(scenes)} potential scenes")
    print("Retrieving frames")

    work = [(args, s) for s in scenes]
    if args.num_threads == 1:
        for item in work:
            dump_example(item)
    else:
        with multiprocessing.Pool(args.num_threads) as pool:
            for _ in pool.imap_unordered(dump_example, work):
                pass

    print("Generating train val lists")
    rng = np.random.RandomState(8964)
    subdirs = sorted(
        d for d in glob.glob(os.path.join(args.dump_root, "*")) if os.path.isdir(d)
    )
    # both cameras of one physical scene land in the same split
    canonic_prefixes = sorted({os.path.basename(s)[:-2] for s in subdirs})
    with open(os.path.join(args.dump_root, "train.txt"), "w") as tf, open(
        os.path.join(args.dump_root, "val.txt"), "w"
    ) as vf:
        for prefix in canonic_prefixes:
            dirs = [
                s for s in subdirs
                if os.path.basename(s).startswith(prefix)
            ]
            if rng.random_sample() < 0.1:
                for s in dirs:
                    vf.write(os.path.basename(s) + "\n")
            else:
                for s in dirs:
                    tf.write(os.path.basename(s) + "\n")
                    if args.with_depth and args.no_train_gt:
                        for gt_file in glob.glob(os.path.join(s, "*.npy")):
                            os.remove(gt_file)
    return 0


if __name__ == "__main__":
    sys.exit(main())
