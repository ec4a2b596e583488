#!/usr/bin/env python
"""Probe: do the round-3 staged-bytes kernel-fault configs run when the
fused-steps input is staged as multiple bounded transfers?

Round 3 bisected a TPU-worker kernel fault to the TOTAL bytes of the
stacked fused-steps input staged per dispatch (368+ MB faults, 245 MB ok
— docs/DESIGN.md §1) and fenced train.py at 256 MB. parallel.mesh now
stages any stacked array larger than STAGE_CHUNK_BYTES as several
leading-axis slices reassembled by an on-device concat, bounding every
individual H2D transfer. This probe runs the previously-faulting configs
through the real shard_batch + fused-step path and reports per config.

A kernel fault kills the process, so run ONE config per invocation:
  python tools/staged_chunk_probe.py --batch 16 --fused 12
  python tools/staged_chunk_probe.py --batch 16 --fused 16
Exit 0 = ran + finite loss; a crash/abort = the fault persists.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

H, W, N = 256, 832, 2


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--fused", type=int, default=12)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4,
                   help="0 freezes the state: isolates whether the crash "
                        "needs the random-data drift that pushes the warp "
                        "into the exact-gather fallback branch")
    p.add_argument("--sampler", default="band64")
    p.add_argument("--no-chunk", action="store_true",
                   help="disable chunked staging (reproduce the fault)")
    p.add_argument("--mode", choices=["restage", "reuse", "sync"],
                   default="restage",
                   help="restage: fresh shard_batch per dispatch (async, "
                        "overlaps staging with execution — the training "
                        "loop's prefetch pattern); reuse: one staged batch "
                        "for every dispatch (no staging during execution); "
                        "sync: fresh staging but a blocking scalar fetch "
                        "between dispatches (staging never overlaps "
                        "execution)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sc_sfmlearner_release_tpu.data.device_augment import (
        AugmentConfig, make_device_augment,
    )
    from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
    from sc_sfmlearner_release_tpu import parallel
    from sc_sfmlearner_release_tpu.parallel import (
        make_mesh, replicate, shard_batch,
    )
    from sc_sfmlearner_release_tpu.training import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )

    if args.no_chunk:
        parallel.mesh.STAGE_CHUNK_BYTES = 1 << 62

    b, fused = args.batch, args.fused
    mesh = make_mesh()
    r = np.random.RandomState(0)
    k = np.array([[241.67, 0, W / 2], [0, 246.28, H / 2], [0, 0, 1]],
                 np.float32)
    host = {
        "tgt": r.randint(0, 256, (fused, b, H, W, 3), np.uint8),
        "refs": r.randint(0, 256, (fused, b, N, H, W, 3), np.uint8),
        "intrinsics": np.broadcast_to(k, (fused, b, 3, 3)).copy(),
    }
    total = sum(a.nbytes for a in host.values())
    print(f"staged input total {total / 1e6:.0f} MB "
          f"(chunk={'off' if args.no_chunk else parallel.mesh.STAGE_CHUNK_BYTES // (1 << 20)} MB)",
          flush=True)

    disp = DispNet(num_layers=18, dtype=jnp.bfloat16)
    pose = PoseNet(num_layers=18, dtype=jnp.bfloat16)
    tx = make_optimizer(args.lr)
    state = create_train_state(disp, pose, tx, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    step = make_train_step(
        disp, pose, tx,
        LossConfig(num_scales=1, with_ssim=True, with_mask=True,
                   with_auto_mask=True, sampler=args.sampler),
        augment_fn=make_device_augment(AugmentConfig()),
        fused_steps=fused,
    )
    pick = jax.jit(lambda m: m["loss"].ravel()[-1].astype(jnp.float32))

    t0 = time.perf_counter()
    staged = shard_batch(host, mesh, stacked=True)
    state, metrics = step(state, staged)
    loss = float(pick(metrics))
    print(f"compile+first step ok in {time.perf_counter() - t0:.0f}s, "
          f"loss={loss:.4f}", flush=True)
    t0 = time.perf_counter()
    for i in range(args.steps):
        if args.mode != "reuse":
            staged = shard_batch(host, mesh, stacked=True)  # fresh staging
        state, metrics = step(state, staged)
        if args.mode == "sync":
            float(pick(metrics))
    loss = float(pick(metrics))
    dt = (time.perf_counter() - t0) / args.steps / fused
    print(f"ran {args.steps} dispatches, loss={loss:.4f}, "
          f"~{dt * 1e3:.0f} ms/step incl. staging "
          f"({b * fused * args.steps / (time.perf_counter() - t0):.1f} "
          "snippets/s host-fed-ish)", flush=True)
    if not np.isfinite(loss):
        print("NON-FINITE LOSS", flush=True)
        return 1
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
