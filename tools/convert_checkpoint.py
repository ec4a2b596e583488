#!/usr/bin/env python
"""Bidirectional checkpoint converter: torch .pth.tar <-> flax .msgpack.

  # reference -> ours
  python tools/convert_checkpoint.py --net disp --resnet-layers 18 \
      dispnet_model_best.pth.tar dispnet_model_best.msgpack

  # ours -> reference layout (consumable by the reference's tooling)
  python tools/convert_checkpoint.py --net pose \
      exp_pose_checkpoint.msgpack exp_pose_checkpoint.pth.tar
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("src", help="input checkpoint (.pth[.tar] or .msgpack)")
    p.add_argument("dst", help="output checkpoint (.msgpack or .pth[.tar])")
    p.add_argument("--net", required=True, choices=["disp", "pose"])
    p.add_argument("--resnet-layers", type=int, default=18, choices=[18, 50])
    p.add_argument("--epoch", type=int, default=0,
                   help="epoch stamp for torch-format output")
    args = p.parse_args(argv)

    import flax.serialization

    from sc_sfmlearner_release_tpu.models import convert as C

    src_torch = args.src.endswith((".pth", ".pth.tar", ".pt"))
    dst_torch = args.dst.endswith((".pth", ".pth.tar", ".pt"))

    if src_torch and not dst_torch:
        sd = C.load_torch_state_dict(args.src)
        if args.net == "disp":
            variables = C.convert_disp_checkpoint(sd, args.resnet_layers)
        else:
            variables = C.convert_pose_checkpoint(sd, args.resnet_layers)
        with open(args.dst, "wb") as f:
            f.write(flax.serialization.to_bytes(variables))
    elif not src_torch and dst_torch:
        with open(args.src, "rb") as f:
            variables = flax.serialization.msgpack_restore(f.read())
        if args.net == "disp":
            sd = C.export_disp_checkpoint(variables, args.resnet_layers)
        else:
            sd = C.export_pose_checkpoint(variables, args.resnet_layers)
        C.save_torch_checkpoint(sd, args.dst, epoch=args.epoch)
    else:
        p.error("exactly one side must be a torch checkpoint")
    print(f"converted {args.src} -> {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
