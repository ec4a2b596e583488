#!/usr/bin/env python
"""Training-throughput benchmark: the production fused train step on the
canonical KITTI config.

What is timed — the COMPLETE on-device training pipeline exactly as
`train.py --packed --device-augment --fused-steps 16` dispatches it:
uint8 frame ingest (packed-loader wire format, data/packed.py) -> on-device
convert + flip/scale-crop/normalize augmentation (data/device_augment.py)
-> DispNet-18 + PoseNet-18 forward over all snippet frames / directed pairs
-> photometric+smooth+geometry loss (banded MXU warp sampler, band64 —
ops/warp_band.py) -> backward -> Adam, 16 optimizer steps per dispatch via
lax.scan (training/step.py). Canonical reference config: batch 4, 832x256,
3-frame snippets, SSIM + masks (scripts/train_resnet18_depth_256.sh). Conv
compute in bfloat16 (BN stats, heads, geometry, losses fp32) — the
framework's default training precision.

Timing methodology — robust to async dispatch AND to relay/tunnel
environments where `block_until_ready` does not actually wait (observed on
the axon loopback relay: a 1.1 TFLOP matmul "synced" in 0.05 ms):
  * every dispatch is CHAINED (the train state threads through), so no
    dispatch can complete before its predecessor;
  * the only barrier is fetching ONE jitted scalar off the final metrics —
    a true data dependency on the whole chain;
  * per-step time is the SLOPE between a short chain and a long chain,
    which cancels the constant fetch round-trip. On a healthy backend this
    reduces to standard steady-state timing.

Host input feed is measured separately (not on the timed path): the packed
loader's per-step host work is a memmap memcpy (no JPEG decode).

vs_baseline is ESTIMATE-DERIVED: the PyTorch reference does not publish
throughput; ~5 snippets/s is inferred from its README epoch time
(/root/reference/README.md:54 — 1000-iter epochs at ~13 min, batch 4, its
development-era single GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BASELINE_SNIPPETS_PER_SEC_EST = 5.0
BATCH, N_REFS, H, W = 4, 2, 256, 832
FUSED = 16
N_STAGED = 3      # distinct pre-staged stacked batches, cycled
K_SMALL = 2       # short chain (dispatches)
MAX_SECONDS = 60  # target device time for the long chain


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

    k = np.array(
        [[241.67, 0, W / 2], [0, 246.28, H / 2], [0, 0, 1]], np.float32
    )

    def host_batch(seed: int):
        r = np.random.RandomState(seed)
        return {
            "tgt": r.randint(0, 256, (FUSED, BATCH, H, W, 3), np.uint8),
            "refs": r.randint(0, 256, (FUSED, BATCH, N_REFS, H, W, 3), np.uint8),
            "intrinsics": np.broadcast_to(k, (FUSED, BATCH, 3, 3)).copy(),
        }

    disp_model = DispNet(num_layers=18, dtype=jnp.bfloat16)
    pose_model = PoseNet(num_layers=18, dtype=jnp.bfloat16)
    tx = make_optimizer(1e-4)
    state = create_train_state(
        disp_model, pose_model, tx, jax.random.PRNGKey(0)
    )
    state = replicate(state, mesh)
    step = make_train_step(
        disp_model, pose_model, tx,
        LossConfig(num_scales=1, with_ssim=True, with_mask=True,
                   with_auto_mask=True, sampler="band64"),
        augment_fn=make_device_augment(AugmentConfig()),
        fused_steps=FUSED,
    )
    staged = [
        shard_batch(host_batch(i), mesh, stacked=True) for i in range(N_STAGED)
    ]
    pick = jax.jit(lambda m: m["loss"].ravel()[-1].astype(jnp.float32))

    def chain(state, n):
        """n chained dispatches + one scalar fetch; returns (state, wall)."""
        t0 = time.perf_counter()
        metrics = None
        for i in range(n):
            state, metrics = step(state, staged[i % N_STAGED])
        loss = float(pick(metrics))
        if not np.isfinite(loss):
            print(f"[bench] WARNING non-finite loss {loss}", file=sys.stderr)
        return state, time.perf_counter() - t0

    # Warm: compile + settle (also primes the staged batches onto device).
    state, _ = chain(state, 1)

    # The relay/tunnel can carry unrelated queued work; repeat the
    # (short, long) pair until the slope is sane and take the median.
    slopes = []
    for attempt in range(5):
        state, t_small = chain(state, K_SMALL)
        est_per = max(t_small / K_SMALL, 1e-3)
        k_big = int(max(K_SMALL + 8, min(256, MAX_SECONDS / est_per)))
        state, t_big = chain(state, k_big)
        slope = (t_big - t_small) / (k_big - K_SMALL)
        print(f"[bench] attempt {attempt}: t_small={t_small:.2f}s "
              f"t_big={t_big:.2f}s k_big={k_big} slope={slope*1e3:.1f} "
              "ms/dispatch", file=sys.stderr)
        if slope > 0 and t_big > 1.2 * t_small:
            slopes.append(slope)
        if len(slopes) >= 3:
            break
    if not slopes:
        raise SystemExit("[bench] no valid slope measurement (tunnel busy?)")
    per_dispatch = sorted(slopes)[len(slopes) // 2]
    snippets_per_sec = FUSED * BATCH / per_dispatch
    per_chip = snippets_per_sec / n_chips

    print(
        f"[bench] slope over {K_SMALL}->{k_big} chained dispatches "
        f"({k_big * FUSED} steps timed): {per_dispatch * 1e3 / FUSED:.3f} "
        f"ms/step, {snippets_per_sec:.1f} snippets/s "
        f"(t_small={t_small:.2f}s t_big={t_big:.2f}s)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "train_snippets_per_sec_per_chip slope-timed "
                "(r18 depth+pose, b4, 832x256, 3-frame, device-augment, "
                "fused-16 production step; baseline 5/s is an ESTIMATE "
                "from the reference README epoch time)",
                "value": round(per_chip, 3),
                "unit": "snippets/s/chip",
                "vs_baseline": round(per_chip / BASELINE_SNIPPETS_PER_SEC_EST, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
