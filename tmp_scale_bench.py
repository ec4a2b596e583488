"""Honest batch-scaling measurements: chained dispatches + scalar fetch."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
from sc_sfmlearner_release_tpu.training import (
    LossConfig, create_train_state, make_optimizer, make_train_step,
)

N, H, W = 2, 256, 832
FUSED = 8
K_SMALL = 2
TARGET_S = 30.0

pick = jax.jit(lambda m: m["loss"].ravel()[-1].astype(jnp.float32))

disp_model = DispNet(num_layers=18, dtype=jnp.bfloat16)
pose_model = PoseNet(num_layers=18, dtype=jnp.bfloat16)
tx = make_optimizer(1e-4)
cfg = LossConfig(num_scales=1, with_ssim=True, with_mask=True,
                 with_auto_mask=True, sampler="band64")

for spec in sys.argv[1:]:
    bs, remat = spec.split(":")
    B, remat = int(bs), remat == "remat"
    r = np.random.RandomState(0)
    k = np.array([[241.67, 0, W/2], [0, 246.28, H/2], [0, 0, 1]], np.float32)
    batch = jax.device_put({
        "tgt": r.rand(FUSED, B, H, W, 3).astype(np.float32),
        "refs": r.rand(FUSED, B, N, H, W, 3).astype(np.float32),
        "intrinsics": np.broadcast_to(k, (FUSED, B, 3, 3)).copy(),
    })
    step = make_train_step(disp_model, pose_model, tx, cfg,
                           fused_steps=FUSED, remat=remat)
    state = create_train_state(disp_model, pose_model, tx,
                               jax.random.PRNGKey(0))

    def chain(state, n):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, batch)
        loss = float(pick(m))
        return state, time.perf_counter() - t0, loss

    t0 = time.perf_counter()
    try:
        state, _, loss = chain(state, 1)
    except Exception as e:
        print(f"[b{B}{'+remat' if remat else ''}] FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
        continue
    print(f"[b{B}{'+remat' if remat else ''}] compile+first "
          f"{time.perf_counter()-t0:.0f}s loss={loss:.4f}", flush=True)
    slopes = []
    for attempt in range(5):
        state, t_small, _ = chain(state, K_SMALL)
        est = max(t_small / K_SMALL, 1e-3)
        k_big = int(max(K_SMALL + 8, min(128, TARGET_S / est)))
        state, t_big, loss = chain(state, k_big)
        slope = (t_big - t_small) / (k_big - K_SMALL)
        if slope > 0 and t_big > 1.2 * t_small:
            slopes.append(slope)
        if len(slopes) >= 2:
            break
    if not slopes:
        print(f"[b{B}] no valid slope", flush=True)
        continue
    per = sorted(slopes)[len(slopes) // 2] / FUSED
    print(f"[b{B}{'+remat' if remat else ''}] {per*1e3:8.2f} ms/step "
          f"{B/per:8.1f} snippets/s  loss={loss:.4f}", flush=True)
print("SCALE DONE", flush=True)
