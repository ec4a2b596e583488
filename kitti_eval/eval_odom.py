#!/usr/bin/env python
"""KITTI odometry evaluation CLI.

CLI parity with /root/reference/kitti_eval/eval_odom.py: evaluates
KITTI-format trajectory files in --result against GT in --gt_dir with the
devkit protocol (per-length t/r errors, ATE, RPE), writing result.txt,
errors/ and PDF plots under the result directory.

GT poses for sequences 00-10 ship in-repo under kitti_eval/gt_poses/ (the
same public-devkit data the reference ships) and are the --gt_dir default,
matching the reference's hardcoded ``gt_dir = "./kitti_eval/gt_poses/"``
(/root/reference/kitti_eval/eval_odom.py:22); pass --gt_dir to override.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="KITTI evaluation")
    parser.add_argument("--result", type=str, required=True,
                        help="Result directory containing NN.txt trajectories")
    parser.add_argument(
        "--gt_dir", type=str,
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "gt_poses"),
        help="Directory of ground-truth poses NN.txt "
             "(default: the in-repo kitti_eval/gt_poses)")
    parser.add_argument("--align", type=str, default=None,
                        choices=["scale", "scale_7dof", "7dof", "6dof"],
                        help="alignment type")
    parser.add_argument("--seqs", nargs="+", type=int, default=None,
                        help="sequences to be evaluated (all found if unset)")
    parser.add_argument("--no-confirm", action="store_true",
                        help="skip the interactive confirmation")
    parser.add_argument("--no-plot", action="store_true")
    args = parser.parse_args(argv)

    from sc_sfmlearner_release_tpu.evaluation import KittiOdomEvaluator

    if not args.no_confirm:
        continue_flag = input(
            f"Evaluate result in {args.result}? [y/n]"
        )
        if continue_flag.strip().lower() != "y":
            print("Double check the path!")
            return 1

    evaluator = KittiOdomEvaluator()
    evaluator.eval(
        args.gt_dir,
        args.result,
        alignment=args.align,
        seqs=args.seqs,
        plot=not args.no_plot,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
