#!/usr/bin/env python
"""Training-throughput benchmark on the canonical KITTI config.

Measures fused-train-step throughput (DispNet-18 + PoseNet-18, batch 4,
832x256, 3-frame snippets, photometric+smooth+geometry loss, Adam) on the
available accelerator — the reference's headline training configuration
(scripts/train_resnet18_depth_256.sh).

Baseline: the PyTorch reference trains this config at roughly 1.25 it/s
(batch 4 -> ~5 snippets/s) on its development-era single GPU
(/root/reference/README.md:54; 1000-iter epochs at ~13 min). BASELINE.md's
north star is >=5x frames/sec/chip. vs_baseline below is measured
throughput / 5.0 snippets/s.

Compute runs in bfloat16 (conv path; BN statistics, disparity/pose heads,
geometry, and all losses in fp32) — the framework's default training
precision. Measured on TPU v5e: ~1226 snippets/s bf16 vs ~247 fp32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SNIPPETS_PER_SEC = 5.0
BATCH, N_REFS, H, W = 4, 2, 256, 832
WARMUP_STEPS = 3
TIMED_STEPS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

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
    batch = {
        "tgt": rng.rand(BATCH, H, W, 3).astype(np.float32),
        "refs": rng.rand(BATCH, N_REFS, H, W, 3).astype(np.float32),
        "intrinsics": np.broadcast_to(k, (BATCH, 3, 3)).copy(),
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
    )
    device_batch = shard_batch(batch, mesh)

    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, device_batch)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(TIMED_STEPS):
        state, metrics = step(state, device_batch)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0

    snippets_per_sec = TIMED_STEPS * BATCH / elapsed
    per_chip = snippets_per_sec / n_chips

    print(
        json.dumps(
            {
                "metric": "train_snippets_per_sec_per_chip "
                "(r18 depth+pose, b4, 832x256, 3-frame)",
                "value": round(per_chip, 3),
                "unit": "snippets/s/chip",
                "vs_baseline": round(per_chip / BASELINE_SNIPPETS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
