"""A/B the full fused train step across warp samplers with honest timing.

Chained dispatches (state threads through) + one scalar fetch as the only
barrier; per-dispatch time is the slope between a short and a long chain,
robust to the axon relay's no-op block_until_ready.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
from sc_sfmlearner_release_tpu.training import (
    LossConfig, create_train_state, make_optimizer, make_train_step,
)

FUSED = 8
B, N, H, W = 4, 2, 256, 832
K_SMALL = 2
TARGET_S = 30.0

r = np.random.RandomState(0)
k = np.array([[241.67, 0, W / 2], [0, 246.28, H / 2], [0, 0, 1]], np.float32)
host = {
    "tgt": r.rand(FUSED, B, H, W, 3).astype(np.float32),
    "refs": r.rand(FUSED, B, N, H, W, 3).astype(np.float32),
    "intrinsics": np.broadcast_to(k, (FUSED, B, 3, 3)).copy(),
}
batch = jax.device_put(host)
pick = jax.jit(lambda m: m["loss"].ravel()[-1].astype(jnp.float32))

disp_model = DispNet(num_layers=18, dtype=jnp.bfloat16)
pose_model = PoseNet(num_layers=18, dtype=jnp.bfloat16)
tx = make_optimizer(1e-4)

for sampler in sys.argv[1:]:
    cfg = LossConfig(num_scales=1, with_ssim=True, with_mask=True,
                     with_auto_mask=True, sampler=sampler)
    step = make_train_step(disp_model, pose_model, tx, cfg,
                           fused_steps=FUSED)
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
    state, _, loss = chain(state, 1)
    print(f"[{sampler}] compile+first: {time.perf_counter()-t0:.1f}s "
          f"loss={loss:.4f}", flush=True)
    state, t_small, _ = chain(state, K_SMALL)
    est = max(t_small / K_SMALL, 1e-3)
    k_big = int(max(K_SMALL + 3, min(128, TARGET_S / est)))
    state, t_big, loss = chain(state, k_big)
    per_dispatch = (t_big - t_small) / (k_big - K_SMALL)
    per_step = per_dispatch / FUSED
    print(f"[{sampler}] {per_step*1e3:8.2f} ms/step  "
          f"{B/per_step:8.1f} snippets/s  (slope {K_SMALL}->{k_big}, "
          f"t_small={t_small:.2f}s t_big={t_big:.2f}s loss={loss:.4f})",
          flush=True)
print("AB DONE", flush=True)
