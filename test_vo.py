#!/usr/bin/env python
"""Full-sequence visual odometry: PoseNet frame-to-frame over a KITTI
odometry sequence, chained into a global trajectory, written as KITTI-format
``<seq>.txt`` for kitti_eval/eval_odom.py.

CLI parity with /root/reference/test_vo.py, but consecutive pairs are run in
fixed-size batches (one XLA compile, MXU fully fed) instead of the
reference's batch-1 per-frame loop (test_vo.py:70-83); the cheap 4x4 chain
accumulation stays on host.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        description="Script for visualizing depth map and masks",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--pretrained-posenet", required=True, type=str,
                   help="pretrained PoseNet path (.msgpack or torch .pth.tar)")
    p.add_argument("--img-height", default=256, type=int)
    p.add_argument("--img-width", default=832, type=int)
    p.add_argument("--no-resize", action="store_true")
    p.add_argument("--dataset-dir", type=str)
    p.add_argument("--output-dir", type=str)
    p.add_argument("--img-exts", default=["png", "jpg", "bmp"], nargs="*")
    p.add_argument("--rotation-mode", default="euler", choices=["euler", "quat"])
    p.add_argument("--sequence", default="09", type=str)
    p.add_argument("--batch-size", default=16, type=int)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from sc_sfmlearner_release_tpu.inference import (
        load_image, normalize, restore_pose_variables,
    )
    from sc_sfmlearner_release_tpu.models import PoseNet
    from sc_sfmlearner_release_tpu.ops import pose_vec2mat

    variables = restore_pose_variables(args.pretrained_posenet)
    pose_model = PoseNet(num_layers=18)

    @jax.jit
    def infer_pairs(img1, img2):
        pose = pose_model.apply(variables, img1, img2, train=False)
        return pose_vec2mat(pose, args.rotation_mode)

    image_dir = os.path.join(args.dataset_dir, args.sequence, "image_2")
    test_files = sorted(
        sum((glob.glob(os.path.join(image_dir, f"*.{ext}"))
             for ext in args.img_exts), [])
    )
    print(f"{len(test_files)} files to test")
    os.makedirs(args.output_dir, exist_ok=True)

    h, w = (None, None) if args.no_resize else (args.img_height, args.img_width)

    def load(p):
        return normalize(load_image(p, h, w))

    n = len(test_files)
    bs = args.batch_size
    mats = []
    prev_img = load(test_files[0])
    for start in range(0, n - 1, bs):
        idxs = range(start, min(start + bs, n - 1))
        img1s, img2s = [], []
        cur = prev_img
        for i in idxs:
            nxt = load(test_files[i + 1])
            img1s.append(cur)
            img2s.append(nxt)
            cur = nxt
        prev_img = cur
        n_valid = len(img1s)
        while len(img1s) < bs:  # pad final batch to keep one compile
            img1s.append(img1s[-1])
            img2s.append(img2s[-1])
        batch_mats = np.asarray(
            infer_pairs(jnp.asarray(np.stack(img1s)), jnp.asarray(np.stack(img2s)))
        )
        mats.append(batch_mats[:n_valid])
    mats = np.concatenate(mats, axis=0)

    global_pose = np.eye(4)
    poses = [global_pose[0:3, :].reshape(1, 12)]
    for m in mats:
        m4 = np.vstack([m, [0, 0, 0, 1]])
        global_pose = global_pose @ np.linalg.inv(m4)
        poses.append(global_pose[0:3, :].reshape(1, 12))

    poses = np.concatenate(poses, axis=0)
    filename = os.path.join(args.output_dir, f"{args.sequence}.txt")
    np.savetxt(filename, poses, delimiter=" ", fmt="%1.8e")
    print(f"=> wrote {filename}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
