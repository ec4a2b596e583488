#!/usr/bin/env python
"""Synthesize miniature KITTI-shaped inputs for the parity runbook's smoke
mode (scripts/kitti_parity_runbook.sh SMOKE=1).

Builds, under OUT:
  raw/        KITTI-raw-style tree (one date, one drive, cams 02+03, OXTS,
              velodyne, calib) — the input of data/prepare_train_data.py
              (same layout the ETL e2e test uses, tests/test_etl.py).
  depth_test/ Eigen-style eval set: color/*.png + depth/*.npy GT.
  odom/       odometry-style: <seq>/image_2/*.png for test_vo.py, plus a
              straight-line gt poses file gt/<seq>.txt for eval_odom.

Everything is random-noise imagery — the smoke run validates the PLUMBING
(every CLI runs end-to-end and emits well-formed artifacts), not metric
quality; real KITTI through the same runbook is the Abs Rel parity gate.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_raw(root: str, h: int, w: int, n_frames: int) -> None:
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    ddir = os.path.join(root, date, drive)

    for cid in ("02", "03"):
        img_dir = os.path.join(ddir, f"image_{cid}", "data")
        os.makedirs(img_dir, exist_ok=True)
        for i in range(n_frames):
            imageio.imwrite(
                os.path.join(img_dir, f"{i:010d}.png"),
                (rng.rand(h, w, 3) * 255).astype(np.uint8),
            )

    oxts_dir = os.path.join(ddir, "oxts", "data")
    os.makedirs(oxts_dir, exist_ok=True)
    for i in range(n_frames):
        meta = np.zeros(30)
        meta[0] = 49.0 + i * 1e-6
        meta[1] = 8.43 + i * 1e-5
        meta[2] = 112.0
        meta[8:11] = [5.0, 0.0, 0.0]  # speed above the static filter
        np.savetxt(os.path.join(oxts_dir, f"{i:010d}.txt"), meta[None])

    velo_dir = os.path.join(ddir, "velodyne_points", "data")
    os.makedirs(velo_dir, exist_ok=True)
    for i in range(n_frames):
        pts = rng.rand(500, 4).astype(np.float32)
        pts[:, 0] = pts[:, 0] * 20 + 2
        pts[:, 1] = (pts[:, 1] - 0.5) * 10
        pts[:, 2] = (pts[:, 2] - 0.5) * 2
        pts.tofile(os.path.join(velo_dir, f"{i:010d}.bin"))

    k = [200.0, 0.0, w / 2, 0.0, 0.0, 200.0, h / 2, 0.0, 0.0, 0.0, 1.0, 0.0]
    with open(os.path.join(root, date, "calib_cam_to_cam.txt"), "w") as f:
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write("P_rect_02: " + " ".join(str(v) for v in k) + "\n")
        f.write("P_rect_03: " + " ".join(str(v) for v in k) + "\n")
    with open(os.path.join(root, date, "calib_velo_to_cam.txt"), "w") as f:
        f.write("R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n")
    with open(os.path.join(root, date, "calib_imu_to_velo.txt"), "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")


def make_depth_test(root: str, h: int, w: int, n: int) -> None:
    import imageio.v2 as imageio

    rng = np.random.RandomState(1)
    os.makedirs(os.path.join(root, "color"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    for i in range(n):
        imageio.imwrite(
            os.path.join(root, "color", f"{i:04d}.png"),
            (rng.rand(h, w, 3) * 255).astype(np.uint8),
        )
        depth = (rng.rand(h, w) * 60 + 2).astype(np.float32)
        np.save(os.path.join(root, "depth", f"{i:04d}.npy"), depth)


def make_odom(root: str, h: int, w: int, n: int, seq: str) -> None:
    import imageio.v2 as imageio

    rng = np.random.RandomState(2)
    img_dir = os.path.join(root, seq, "image_2")
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n):
        imageio.imwrite(
            os.path.join(img_dir, f"{i:06d}.png"),
            (rng.rand(h, w, 3) * 255).astype(np.uint8),
        )
    gt_dir = os.path.join(root, "gt")
    os.makedirs(gt_dir, exist_ok=True)
    poses = []
    for i in range(n):
        m = np.eye(4)
        m[2, 3] = 0.8 * i  # straight line, ~KITTI speeds at 10 Hz
        poses.append(m[:3].reshape(-1))
    np.savetxt(os.path.join(gt_dir, f"{seq}.txt"), np.asarray(poses))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--seq", default="09")
    args = p.parse_args(argv)

    make_raw(os.path.join(args.out, "raw"), args.height, args.width, args.frames)
    make_depth_test(os.path.join(args.out, "depth_test"), args.height,
                    args.width, max(4, args.frames // 3))
    make_odom(os.path.join(args.out, "odom"), args.height, args.width,
              args.frames, args.seq)
    print(f"smoke KITTI tree ready under {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
