#!/usr/bin/env python
"""Training-throughput benchmark: the production fused train step on the
canonical KITTI config.

What is timed — the COMPLETE on-device training pipeline exactly as
`train.py --packed --device-augment --fused-steps 16` dispatches it:
uint8 frame ingest (packed-loader wire format, data/packed.py) -> on-device
convert + flip/scale-crop/normalize augmentation (data/device_augment.py)
-> DispNet-18 + PoseNet-18 forward over all snippet frames / directed pairs
-> photometric+smooth+geometry loss -> backward -> Adam, 16 optimizer steps
per dispatch via lax.scan (training/step.py). Canonical reference config:
batch 4, 832x256, 3-frame snippets, SSIM + masks
(scripts/train_resnet18_depth_256.sh). Conv compute in bfloat16 (BN stats,
heads, geometry, losses fp32) — the framework's default training precision.

Methodology: 3 warmup dispatches (includes compile), then 9 repeats of a
24-dispatch timed window (384 optimizer steps per window, 3456 total) over
distinct pre-staged uint8 batches, dispatches pipelined within each window;
the reported number is the p50 of the 9 window throughputs (kills the
dispatch-latency wobble that made single-step timings range 1000-1560/s at
batch 4 — per-dispatch completion timestamps bunch over the device tunnel,
so whole-window timing is the stable estimator).

Host input feed is measured separately (not on the timed path) because this
environment's TPU is network-tunneled (~0.08 GB/s H2D — an environment
artifact, not a TPU property): the packed loader's per-step host work is a
memmap memcpy (no JPEG decode), benchmarked in docs/DESIGN.md.

vs_baseline is ESTIMATE-DERIVED: the PyTorch reference does not publish
throughput; ~5 snippets/s is inferred from its README epoch time
(/root/reference/README.md:54 — 1000-iter epochs at ~13 min, batch 4, its
development-era single GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_SNIPPETS_PER_SEC_EST = 5.0
BATCH, N_REFS, H, W = 4, 2, 256, 832
FUSED = 16
N_STAGED = 3          # distinct pre-staged stacked batches, cycled
WARMUP_DISPATCHES = 3
WINDOW_DISPATCHES = 24  # 24 * 16 = 384 optimizer steps per timed window
N_WINDOWS = 9


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sc_sfmlearner_release_tpu.data.device_augment import (
        AugmentConfig, make_device_augment,
    )
    from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
    from sc_sfmlearner_release_tpu.parallel import make_mesh, replicate, shard_batch
    from sc_sfmlearner_release_tpu.training import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )

    mesh = make_mesh()
    n_chips = len(jax.devices())

    rng = np.random.RandomState(0)
    k = np.array(
        [[241.67, 0, W / 2], [0, 246.28, H / 2], [0, 0, 1]], np.float32
    )

    def host_batch(seed: int):
        r = np.random.RandomState(seed)
        return {
            "tgt": r.randint(0, 256, (FUSED, BATCH, H, W, 3), np.uint8),
            "refs": r.randint(0, 256, (FUSED, BATCH, N_REFS, H, W, 3), np.uint8),
            "intrinsics": np.broadcast_to(
                k, (FUSED, BATCH, 3, 3)
            ).copy(),
        }

    disp_model = DispNet(num_layers=18, dtype=jnp.bfloat16)
    pose_model = PoseNet(num_layers=18, dtype=jnp.bfloat16)
    tx = make_optimizer(lr=1e-4)
    state = create_train_state(
        disp_model, pose_model, tx, jax.random.PRNGKey(0),
        image_shape=(1, H, W, 3),
    )
    state = replicate(state, mesh)
    step = make_train_step(
        disp_model, pose_model, tx,
        LossConfig(num_scales=1, with_ssim=True, with_mask=True,
                   with_auto_mask=True),
        augment_fn=make_device_augment(AugmentConfig()),
        fused_steps=FUSED,
    )
    staged = [
        shard_batch(host_batch(i), mesh, stacked=True) for i in range(N_STAGED)
    ]

    for i in range(WARMUP_DISPATCHES):
        state, metrics = step(state, staged[i % N_STAGED])
    jax.block_until_ready(metrics["loss"])

    # Whole-window timing, repeated: dispatches stay pipelined inside a
    # window; each window's throughput = steps*batch / wall. The p50 over
    # windows is robust to tunnel-latency bursts that make per-dispatch
    # completion deltas bunch.
    window_tput = []
    for _ in range(N_WINDOWS):
        t0 = time.perf_counter()
        for i in range(WINDOW_DISPATCHES):
            state, metrics = step(state, staged[i % N_STAGED])
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
        window_tput.append(WINDOW_DISPATCHES * FUSED * BATCH / dt)

    window_tput = np.asarray(window_tput)
    snippets_per_sec = float(np.median(window_tput))
    per_chip = snippets_per_sec / n_chips

    print(
        f"[bench] {N_WINDOWS} windows x {WINDOW_DISPATCHES} dispatches x "
        f"{FUSED} steps: window throughput p50 {snippets_per_sec:.0f}, "
        f"range {window_tput.min():.0f}-{window_tput.max():.0f} snippets/s "
        f"({FUSED * BATCH / snippets_per_sec * 1e3 / FUSED:.3f} ms/step)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "train_snippets_per_sec_per_chip p50-of-windows "
                "(r18 depth+pose, b4, 832x256, 3-frame, device-augment, "
                "fused-16 production step, 3456 steps timed; baseline 5/s "
                "is an ESTIMATE from the reference README epoch time)",
                "value": round(per_chip, 3),
                "unit": "snippets/s/chip",
                "vs_baseline": round(
                    per_chip / BASELINE_SNIPPETS_PER_SEC_EST, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
