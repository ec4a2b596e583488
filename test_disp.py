#!/usr/bin/env python
"""Depth inference CLI: run DispNet over a test list, save predictions.npy.

CLI parity with /root/reference/test_disp.py (same flags, same
``predictions.npy`` of depths = 1/disp), but batched: frames are stacked
into fixed-shape batches so XLA compiles once and throughput is reported
per frame after a warm-up compile, not including it.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        description="Script for DispNet testing with corresponding groundTruth",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--pretrained-dispnet", required=True, type=str,
                   help="pretrained DispNet path (.msgpack or torch .pth.tar)")
    p.add_argument("--img-height", default=256, type=int)
    p.add_argument("--img-width", default=832, type=int)
    p.add_argument("--min-depth", default=1e-3, type=float)
    p.add_argument("--max-depth", default=80, type=float)
    p.add_argument("--dataset-dir", default=".", type=str)
    p.add_argument("--dataset-list", default=None, type=str)
    p.add_argument("--output-dir", required=True, type=str)
    p.add_argument("--resnet-layers", required=True, type=int, choices=[18, 50])
    p.add_argument("--batch-size", default=8, type=int)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    from sc_sfmlearner_release_tpu.inference import batched, restore_disp_variables
    from sc_sfmlearner_release_tpu.models import DispNet

    variables = restore_disp_variables(args.pretrained_dispnet, args.resnet_layers)
    disp_model = DispNet(num_layers=args.resnet_layers)

    if args.dataset_list is not None:
        with open(args.dataset_list) as f:
            test_files = [
                line if os.path.isabs(line) or os.path.exists(line)
                else os.path.join(args.dataset_dir, line)
                for line in f.read().splitlines() if line
            ]
    else:
        test_files = sorted(glob.glob(os.path.join(args.dataset_dir, "*.png")))

    print(f"{len(test_files)} files to test")
    os.makedirs(args.output_dir, exist_ok=True)

    @jax.jit
    def infer(batch):
        return disp_model.apply(variables, batch, train=False)[0][..., 0]

    predictions = np.zeros(
        (len(test_files), args.img_height, args.img_width), np.float32
    )
    total_time, timed_frames, j = 0.0, 0, 0
    for batch, n_valid in batched(
        test_files, args.batch_size, args.img_height, args.img_width
    ):
        t0 = time.time()
        disp = jax.block_until_ready(infer(batch))
        elapsed = time.time() - t0
        if j > 0:  # skip the compile batch in timing
            total_time += elapsed
            timed_frames += n_valid
        predictions[j : j + n_valid] = 1.0 / np.asarray(disp)[:n_valid]
        j += n_valid

    np.save(os.path.join(args.output_dir, "predictions.npy"), predictions)
    if timed_frames:
        avg = total_time / timed_frames
        print("Avg Time: ", avg, " seconds.")
        print("Avg Speed: ", 1.0 / avg, " fps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
