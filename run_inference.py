#!/usr/bin/env python
"""Batch disparity/depth visualization dump.

CLI parity with /root/reference/run_inference.py: colormapped disparity
('bone') and/or depth ('rainbow', max 10) images for every input file, named
``<relpath-with-dashes>_disp.<ext>`` / ``_depth.<ext>``. Batched inference.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        description="Inference script for DispNet learned with Structure "
        "from Motion Learner inference on KITTI Dataset",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--output-disp", action="store_true", help="save disparity img")
    p.add_argument("--output-depth", action="store_true", help="save depth img")
    p.add_argument("--pretrained", required=True, type=str,
                   help="pretrained DispNet path (.msgpack or torch .pth.tar)")
    p.add_argument("--img-height", default=256, type=int)
    p.add_argument("--img-width", default=832, type=int)
    p.add_argument("--no-resize", action="store_true")
    p.add_argument("--dataset-list", default=None, type=str)
    p.add_argument("--dataset-dir", default=".", type=str)
    p.add_argument("--output-dir", default="output", type=str)
    p.add_argument("--img-exts", default=["png", "jpg", "bmp"], nargs="*")
    p.add_argument("--resnet-layers", required=True, type=int, choices=[18, 50])
    p.add_argument("--batch-size", default=8, type=int)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not (args.output_disp or args.output_depth):
        print("You must at least output one value !")
        return 1

    import imageio.v2 as imageio
    import jax

    from sc_sfmlearner_release_tpu.inference import batched, restore_disp_variables
    from sc_sfmlearner_release_tpu.models import DispNet
    from sc_sfmlearner_release_tpu.utils import tensor2array

    variables = restore_disp_variables(args.pretrained, args.resnet_layers)
    disp_model = DispNet(num_layers=args.resnet_layers)

    if args.dataset_list is not None:
        with open(args.dataset_list) as f:
            test_files = [
                os.path.join(args.dataset_dir, line)
                for line in f.read().splitlines() if line
            ]
    else:
        test_files = sorted(
            sum((glob.glob(os.path.join(args.dataset_dir, f"*.{ext}"))
                 for ext in args.img_exts), [])
        )
    print(f"{len(test_files)} files to test")
    os.makedirs(args.output_dir, exist_ok=True)

    @jax.jit
    def infer(batch):
        return disp_model.apply(variables, batch, train=False)[0][..., 0]

    j = 0
    for batch, n_valid in batched(
        test_files, args.batch_size, args.img_height, args.img_width
    ):
        disps = np.asarray(infer(batch))[:n_valid]
        for disp in disps:
            file = test_files[j]
            rel = os.path.relpath(file, args.dataset_dir)
            stem, ext = os.path.splitext(rel)
            name = "-".join(stem.split(os.sep))
            if args.output_disp:
                vis = (255 * tensor2array(disp, max_value=None, colormap="bone"))
                imageio.imwrite(
                    os.path.join(args.output_dir, f"{name}_disp{ext}"),
                    vis.astype(np.uint8),
                )
            if args.output_depth:
                depth = 1.0 / disp
                vis = (255 * tensor2array(depth, max_value=10, colormap="rainbow"))
                imageio.imwrite(
                    os.path.join(args.output_dir, f"{name}_depth{ext}"),
                    vis.astype(np.uint8),
                )
            j += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
