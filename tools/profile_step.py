#!/usr/bin/env python
"""Device-time attribution for the production fused train step.

Captures a jax.profiler trace of warm chained dispatches of the SAME
program bench.py times, parses the chrome-trace event stream
(``*.trace.json.gz``), and prints per-op device time per optimizer step,
grouped into coarse buckets (conv / warp matmuls / elementwise / reduce /
copy-transpose / other) by correlating event names against the optimized
HLO. This is the tool behind the step-breakdown table in docs/DESIGN.md §1.

Usage:  python tools/profile_step.py [--sampler band64] [--fused 16]
        [--batch 4] [--steps 4] [--no-augment] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)


def build_step(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sc_sfmlearner_release_tpu.data.device_augment import (
        AugmentConfig, make_device_augment,
    )
    from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
    from sc_sfmlearner_release_tpu.parallel import (
        make_mesh, replicate, shard_batch,
    )
    from sc_sfmlearner_release_tpu.training import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )

    B, N, H, W = args.batch, 2, 256, 832
    mesh = make_mesh()
    k = np.array(
        [[241.67, 0, W / 2], [0, 246.28, H / 2], [0, 0, 1]], np.float32
    )
    r = np.random.RandomState(0)
    host = {
        "tgt": r.randint(0, 256, (args.fused, B, H, W, 3), np.uint8),
        "refs": r.randint(0, 256, (args.fused, B, N, H, W, 3), np.uint8),
        "intrinsics": np.broadcast_to(k, (args.fused, B, 3, 3)).copy(),
    }
    if not args.augment:
        host = {
            "tgt": host["tgt"].astype(np.float32) / 255.0,
            "refs": host["refs"].astype(np.float32) / 255.0,
            "intrinsics": host["intrinsics"],
        }

    disp = DispNet(num_layers=getattr(args, "layers", 18),
                   dtype=jnp.bfloat16)
    pose = PoseNet(num_layers=18, dtype=jnp.bfloat16)
    tx = make_optimizer(1e-4)
    state = create_train_state(disp, pose, tx, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    step = make_train_step(
        disp, pose, tx,
        LossConfig(num_scales=1, with_ssim=True, with_mask=True,
                   with_auto_mask=True, sampler=args.sampler),
        augment_fn=make_device_augment(AugmentConfig()) if args.augment
        else None,
        fused_steps=args.fused,
        remat=args.remat,
    )
    batch = shard_batch(host, mesh, stacked=True)
    import jax as _j

    pick = _j.jit(lambda m: m["loss"].ravel()[-1].astype(jnp.float32))
    return step, state, batch, pick


BUCKETS = [
    ("conv", re.compile(r"conv|%cudnn", re.I)),
    ("warp-matmul", re.compile(r"dot|einsum", re.I)),
    ("scatter/gather", re.compile(r"gather|scatter", re.I)),
    ("reduce-window", re.compile(r"reduce.?window", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
    ("reduce", re.compile(r"reduce|all-reduce", re.I)),
    ("fusion", re.compile(r"fusion|loop", re.I)),
]


def parse_trace(trace_dir: str, n_steps: int, top: int):
    paths = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        t = json.load(f)
    events = t.get("traceEvents", [])

    # Device-track complete events: pid whose process name mentions TPU.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "tpu" in n or "/device" in n
    }
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # us
        per_op[name] += dur
        total += dur

    print(f"device total: {total / 1e3:.1f} ms over {n_steps} steps "
          f"-> {total / 1e3 / n_steps:.2f} ms/step")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    shown = 0.0
    for name, dur in per_op.most_common(top):
        print(f"{dur / 1e3 / n_steps:9.3f}  {100 * dur / total:5.1f}  {name}")
        shown += dur
    print(f"(top {top} = {100 * shown / total:.1f}% of device time)")
    return per_op, total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sampler", default="band64")
    p.add_argument("--fused", type=int, default=16)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--layers", type=int, default=18,
                   help="DispNet encoder depth (pose stays 18)")
    p.add_argument("--steps", type=int, default=4,
                   help="traced dispatches (each = --fused optimizer steps)")
    p.add_argument("--no-augment", dest="augment", action="store_false")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--hlo-dir", default=None,
                   help="also dump optimized HLO here (to name fusions)")
    args = p.parse_args()

    if args.hlo_dir:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_dump_to={args.hlo_dir} --xla_dump_hlo_as_text"
        ).strip()

    import jax

    step, state, batch, pick = build_step(args)
    # Warm compile + settle.
    state, m = step(state, batch)
    float(pick(m))

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="step_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, m = step(state, batch)
        float(pick(m))
    print(f"trace in {trace_dir}")
    parse_trace(trace_dir, args.steps * args.fused, args.top)


if __name__ == "__main__":
    main()
