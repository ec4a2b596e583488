"""Profile one warm fused train-step dispatch and print top device ops."""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
from sc_sfmlearner_release_tpu.training import (
    LossConfig, create_train_state, make_optimizer, make_train_step,
)

sampler = sys.argv[1] if len(sys.argv) > 1 else "band64"
AUGMENT = len(sys.argv) > 2 and sys.argv[2] == "augment"
FUSED = 2
B, N, H, W = 4, 2, 256, 832
r = np.random.RandomState(0)
k = np.array([[241.67, 0, W / 2], [0, 246.28, H / 2], [0, 0, 1]], np.float32)
batch = jax.device_put({
    "tgt": r.rand(FUSED, B, H, W, 3).astype(np.float32),
    "refs": r.rand(FUSED, B, N, H, W, 3).astype(np.float32),
    "intrinsics": np.broadcast_to(k, (FUSED, B, 3, 3)).copy(),
})
pick = jax.jit(lambda m: m["loss"].ravel()[-1].astype(jnp.float32))

disp_model = DispNet(num_layers=18, dtype=jnp.bfloat16)
pose_model = PoseNet(num_layers=18, dtype=jnp.bfloat16)
tx = make_optimizer(1e-4)
cfg = LossConfig(num_scales=1, with_ssim=True, with_mask=True,
                 with_auto_mask=True, sampler=sampler)
augment_fn = None
if AUGMENT:
    from sc_sfmlearner_release_tpu.data.device_augment import (
        AugmentConfig, make_device_augment,
    )
    augment_fn = make_device_augment(AugmentConfig())
    batch = jax.device_put({
        "tgt": r.randint(0, 256, (FUSED, B, H, W, 3), dtype=np.uint8),
        "refs": r.randint(0, 256, (FUSED, B, N, H, W, 3), dtype=np.uint8),
        "intrinsics": np.broadcast_to(k, (FUSED, B, 3, 3)).copy(),
    })
step = make_train_step(disp_model, pose_model, tx, cfg, fused_steps=FUSED,
                       augment_fn=augment_fn)
state = create_train_state(disp_model, pose_model, tx, jax.random.PRNGKey(0))

state, m = step(state, batch)
print("warm loss", float(pick(m)), flush=True)

logdir = f"/tmp/band_profile_{sampler}"
jax.profiler.start_trace(logdir)
state, m = step(state, batch)
float(pick(m))
jax.profiler.stop_trace()

time.sleep(2)
files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
print("trace files:", files, flush=True)
dur = defaultdict(float)
cnt = defaultdict(int)
meta = {}
total = 0.0
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        d = ev.get("dur", 0) / 1e3  # ms
        if any(s in name for s in ("fusion", "copy", "convolution", "dot",
                                   "scan", "while", "dynamic", "reduce",
                                   "transpose", "bitcast", "broadcast",
                                   "iota", "concatenate", "slice", "pad",
                                   "convert", "select", "gather", "scatter",
                                   "all-reduce")):
            dur[name] += d
            cnt[name] += 1
            total += d
            args = ev.get("args") or {}
            m = (args.get("source_info") or args.get("long_name")
                 or args.get("tf_op") or "")
            if m and name not in meta:
                meta[name] = str(m)
print(f"total attributed device time: {total:.1f} ms over {FUSED} steps")
for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:35]:
    print(f"{d:9.2f} ms  x{cnt[name]:<4d} {name[:60]:60s} "
          f"{meta.get(name, '')[:120]}")
