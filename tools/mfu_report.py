#!/usr/bin/env python
"""Cost report: XLA cost analysis of the fused train step vs measured time.

Reports the compiled step's FLOPs / bytes (XLA's HLO-level accounting —
an UPPER BOUND: fused operands are counted at every consuming op, so both
numbers exceed what the hardware actually moves/computes), the measured
step time, and apparent rates. Useful for step-to-step comparisons
(e.g. remat vs not), not as literal MFU.

Usage: python tools/mfu_report.py [--batch 4] [--remat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# bf16 peak TFLOP/s per chip
PEAK_TFLOPS = {"TPU v5 lite": 394.0 / 2, "TPU v4": 275.0, "default": 197.0}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
    from sc_sfmlearner_release_tpu.parallel import make_mesh, replicate, shard_batch
    from sc_sfmlearner_release_tpu.training import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )

    b, n, h, w = args.batch, 2, 256, 832
    rng = np.random.RandomState(0)
    k = np.array([[241.67, 0, w / 2], [0, 246.28, h / 2], [0, 0, 1]], np.float32)
    batch = {
        "tgt": rng.rand(b, h, w, 3).astype(np.float32),
        "refs": rng.rand(b, n, h, w, 3).astype(np.float32),
        "intrinsics": np.broadcast_to(k, (b, 3, 3)).copy(),
    }

    mesh = make_mesh()
    disp = DispNet(num_layers=18, dtype=jnp.bfloat16)
    pose = PoseNet(num_layers=18, dtype=jnp.bfloat16)
    tx = make_optimizer(1e-4)
    state = replicate(create_train_state(disp, pose, tx, jax.random.PRNGKey(0)), mesh)
    step = make_train_step(
        disp, pose, tx, LossConfig(with_auto_mask=True), remat=args.remat
    )
    db = shard_batch(batch, mesh)

    compiled = step.lower(state, db).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    for _ in range(3):
        state, m = step(state, db)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, db)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.steps

    dev = jax.devices()[0]
    peak = next(
        (v for kdev, v in PEAK_TFLOPS.items() if kdev in str(dev.device_kind)),
        PEAK_TFLOPS["default"],
    )
    achieved = flops / dt / 1e12
    print(f"device: {dev.device_kind}")
    print(f"batch {b}, remat={args.remat}")
    print(f"XLA HLO flops (upper bound):  {flops / 1e9:.1f} GFLOP")
    print(f"XLA HLO bytes (upper bound):  {bytes_accessed / 1e9:.2f} GB")
    print(f"measured step time:           {dt * 1e3:.2f} ms")
    print(f"apparent rate (HLO-flops/t):  {achieved:.1f} TFLOP/s "
          f"({achieved / peak * 100:.0f}% of ~{peak:.0f} peak — HLO "
          "accounting double-counts fused operands; treat as relative)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
