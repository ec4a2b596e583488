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

Host input feed: the default number times pre-staged device batches (pure
device rate). ``--host-fed`` (also run by default after the device-only
measurement) times the SAME chain fed end-to-end from the real packed
loader: a synthetic packed uint8 memmap dataset (data/packed.py wire
format) -> PackedSequenceSet -> BatchLoader (threaded, sliced) ->
fused-step stacking -> parallel.device_prefetch. The JSON line reports the
device-only number as the headline plus ``host_fed_value`` so the input
pipeline's sustained rate is recorded next to it.

vs_baseline is ESTIMATE-DERIVED: the PyTorch reference does not publish
throughput; ~5 snippets/s is inferred from its README epoch time
(/root/reference/README.md:54 — 1000-iter epochs at ~13 min, batch 4, its
development-era single GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SNIPPETS_PER_SEC_EST = 5.0
BATCH, N_REFS, H, W = 4, 2, 256, 832
FUSED = 16
SAMPLER = "band80r16x368c208l192"  # production warp sampler (train.py auto)
N_STAGED = 3      # distinct pre-staged stacked batches, cycled
K_SMALL = 2       # short chain (dispatches)
MAX_SECONDS = 60  # target device time for the long chain


def _make_packed_dir(tmp_dir: str, rendered, intrinsics, n_scenes: int = 2,
                     frames_per: int = 220):
    """Synthetic packed dataset in the production wire format
    (data/packed.py): one uint8 memmap + index.json. Frames are a
    triangle-wave replay of the ``rendered`` multi-view-consistent scene
    (adjacent packed frames are always true spatial neighbors), so the
    host-fed training chain stays in the band sampler's realistic-motion
    regime like the device-only chain."""
    import json

    from sc_sfmlearner_release_tpu.data.packed import FRAMES_NAME, INDEX_NAME

    n = n_scenes * frames_per
    frames = np.memmap(
        f"{tmp_dir}/{FRAMES_NAME}", dtype=np.uint8, mode="w+",
        shape=(n, H, W, 3),
    )
    m = len(rendered)
    period = 2 * (m - 1)
    for i in range(n):  # per-frame fill keeps peak memory small
        t = i % period
        frames[i] = rendered[t if t < m else period - t]
    frames.flush()
    k = np.asarray(intrinsics, np.float64).tolist()
    scenes = {
        f"s{j}": {"start": j * frames_per, "count": frames_per,
                  "intrinsics": k}
        for j in range(n_scenes)
    }
    with open(f"{tmp_dir}/{INDEX_NAME}", "w") as f:
        json.dump({"height": H, "width": W, "n_frames": n,
                   "scenes": scenes, "train": list(scenes), "val": []}, f)
    return tmp_dir


def _host_stacked_batches(packed_dir: str):
    """Endless stream of host-side stacked fused batches from the REAL
    input pipeline: PackedSequenceSet -> BatchLoader -> fused stacking
    (the `train.py --packed --device-augment --fused-steps` feed path)."""
    from sc_sfmlearner_release_tpu.data.loader import BatchLoader
    from sc_sfmlearner_release_tpu.data.packed import PackedSequenceSet

    dataset = PackedSequenceSet(packed_dir, train=True, transform=None)
    loader = BatchLoader(
        dataset, batch_size=BATCH, shuffle=True, num_workers=4,
        drop_last=True,
    )
    epoch = 0
    while True:
        loader.set_epoch(epoch)
        group = []
        for batch in loader:
            batch.pop("_n_valid", None)
            group.append(batch)
            if len(group) == FUSED:
                yield {
                    key: np.stack([g[key] for g in group])
                    for key in group[0]
                }
                group = []
        epoch += 1


def _host_fed_batches(packed_dir: str, mesh):
    """Device-staged stream: host pipeline + device_prefetch overlap."""
    from sc_sfmlearner_release_tpu.parallel import device_prefetch

    for staged, _ in device_prefetch(
        _host_stacked_batches(packed_dir), mesh, size=2, stacked=True
    ):
        yield staged


def _host_only_rate(packed_dir: str, n: int = 6) -> float:
    """Host-pipeline-only snippets/s (no device): isolates loader+stacking
    from the H2D transfer so a host-fed shortfall is attributable."""
    it = _host_stacked_batches(packed_dir)
    next(it)
    t0 = time.perf_counter()
    for _ in range(n):
        next(it)
    return FUSED * BATCH * n / (time.perf_counter() - t0)


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

    # Realistic multi-view-consistent frames: with random-noise frames the
    # Adam state drifts until the warp leaves the band sampler's
    # displacement budget mid-measurement and the bench silently times the
    # FALLBACK rungs instead of the production primary path (observed on
    # the 2-D banded configs). The scene uses the fallback-rate tool's
    # calibrated world — TRUE KITTI intrinsics at 832x256 and roadside-
    # only obstacles — at 0.5 m/frame (~18 km/h), which the measured
    # fallback table (docs/DESIGN.md par.3) puts comfortably inside the
    # production sampler's displacement budget: the bench reports the
    # primary-path step cost (the cross-round comparable number); the
    # speed-dependent fallback economics are documented separately.
    from tools.band_fallback_rate import (
        CX, CY, FX, FY, _make_roadside_boxes, _trajectory,
    )
    from tools.synthetic_scene import render
    import tools.synthetic_scene as _sc

    _sc.H, _sc.W = H, W
    _sc.FX, _sc.FY, _sc.CX, _sc.CY = FX, FY, CX, CY
    k = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
    _rng = np.random.RandomState(7)
    _n_frames = BATCH + N_REFS  # sliding 3-frame snippets over one scene
    _poses = _trajectory(_n_frames, 0.5, _rng)
    _boxes = _make_roadside_boxes(_rng, _poses)
    _frames = [render(p, _boxes)[0] for p in _poses]
    print(f"[bench] rendered {_n_frames} synthetic-scene frames",
          file=sys.stderr)

    def host_batch(seed: int):
        r = np.random.RandomState(seed)
        tgt = np.empty((FUSED, BATCH, H, W, 3), np.uint8)
        refs = np.empty((FUSED, BATCH, N_REFS, H, W, 3), np.uint8)
        for f in range(FUSED):
            for b in range(BATCH):
                c = r.randint(1, _n_frames - 1)
                tgt[f, b] = _frames[c]
                refs[f, b, 0] = _frames[c - 1]
                refs[f, b, 1] = _frames[c + 1]
        return {
            "tgt": tgt,
            "refs": refs,
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
                   with_auto_mask=True, sampler=SAMPLER),
        augment_fn=make_device_augment(AugmentConfig()),
        fused_steps=FUSED,
    )
    staged = [
        shard_batch(host_batch(i), mesh, stacked=True) for i in range(N_STAGED)
    ]
    pick = jax.jit(lambda m: m["loss"].ravel()[-1].astype(jnp.float32))
    # Self-validation: the band_fallback metric (fraction of the last
    # dispatch's fused steps that left the primary band) proves the slope
    # timed the PRIMARY path, not a fallback rung.
    pick_fb = jax.jit(
        lambda m: m["band_fallback"].mean()
    ) if SAMPLER.startswith("band") and not SAMPLER.endswith("nf") else None

    def chain(state, n):
        """n chained dispatches + one scalar fetch; returns (state, wall)."""
        t0 = time.perf_counter()
        metrics = None
        for i in range(n):
            state, metrics = step(state, staged[i % N_STAGED])
        loss = float(pick(metrics))
        if not np.isfinite(loss):
            print(f"[bench] WARNING non-finite loss {loss}", file=sys.stderr)
        dt = time.perf_counter() - t0
        if pick_fb is not None:
            fb = float(pick_fb(metrics))
            if fb > 0:
                print(f"[bench] WARNING {fb:.0%} of the last dispatch's "
                      "steps left the primary band (timing includes "
                      "fallback rungs)", file=sys.stderr)
        return state, dt

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

    # ---- end-to-end host-fed measurement (real packed loader) ----
    host_fed_per_chip = host_only = None
    if "--no-host-fed" not in sys.argv:
        import shutil
        import tempfile

        tmp_dir = tempfile.mkdtemp(prefix="bench_packed_")
        try:
            t0 = time.perf_counter()
            _make_packed_dir(tmp_dir, _frames, k)
            print(f"[bench] packed synthetic dataset in "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
            feed = _host_fed_batches(tmp_dir, mesh)

            def chain_fed(state, n):
                t0 = time.perf_counter()
                metrics = None
                for _ in range(n):
                    state, metrics = step(state, next(feed))
                loss = float(pick(metrics))
                if not np.isfinite(loss):
                    print(f"[bench] WARNING non-finite loss {loss}",
                          file=sys.stderr)
                return state, time.perf_counter() - t0

            state, _ = chain_fed(state, 1)  # settle the pipeline
            state, tf_small = chain_fed(state, K_SMALL)
            kf_big = int(max(K_SMALL + 8,
                             min(64, MAX_SECONDS / max(per_dispatch, 1e-3))))
            state, tf_big = chain_fed(state, kf_big)
            fed_slope = (tf_big - tf_small) / (kf_big - K_SMALL)
            host_fed_per_chip = FUSED * BATCH / fed_slope / n_chips
            host_only = _host_only_rate(tmp_dir)
            print(
                f"[bench] host-fed slope over {K_SMALL}->{kf_big} "
                f"dispatches: {fed_slope * 1e3 / FUSED:.3f} ms/step, "
                f"{host_fed_per_chip:.1f} snippets/s/chip "
                f"({100 * host_fed_per_chip / per_chip:.1f}% of "
                "device-only)", file=sys.stderr,
            )
            print(
                f"[bench] host pipeline alone (loader+stacking, no "
                f"device): {host_only:.0f} snippets/s — a host-fed "
                "shortfall below device-only with this margin is the "
                "H2D transfer path (the tunneled relay here moves "
                "~45 MB/s; real TPU hosts DMA at GB/s)",
                file=sys.stderr,
            )
        finally:
            shutil.rmtree(tmp_dir, ignore_errors=True)

    print(
        f"[bench] slope over {K_SMALL}->{k_big} chained dispatches "
        f"({k_big * FUSED} steps timed): {per_dispatch * 1e3 / FUSED:.3f} "
        f"ms/step, {snippets_per_sec:.1f} snippets/s "
        f"(t_small={t_small:.2f}s t_big={t_big:.2f}s)",
        file=sys.stderr,
    )
    record = {
        "metric": "train_snippets_per_sec_per_chip slope-timed "
        "(r18 depth+pose, b4, 832x256, 3-frame, device-augment, "
        "fused-16 production step; baseline 5/s is an ESTIMATE "
        "from the reference README epoch time)",
        "value": round(per_chip, 3),
        "unit": "snippets/s/chip",
        "vs_baseline": round(per_chip / BASELINE_SNIPPETS_PER_SEC_EST, 3),
    }
    if host_fed_per_chip is not None:
        record["host_fed_value"] = round(host_fed_per_chip, 3)
        record["host_pipeline_only_value"] = round(host_only, 1)

    # ---- H2D bandwidth spec (VERDICT r4 item 6) ----
    # The packed wire format moves (1+N) uint8 frames + fp32 intrinsics
    # per snippet; to sustain the device-only rate the host must push one
    # fused dispatch's bytes per dispatch slope. Emitting required vs
    # achieved makes a real-host host-fed shortfall attributable at a
    # glance (and the round-2 "host-fed >= 0.95x device-only" criterion
    # checkable the day this runs on a non-tunneled host).
    dispatch_bytes = sum(
        int(np.prod(v.shape)) * v.dtype.itemsize
        for v in host_batch(0).values()
    )
    record["h2d_required_mbps"] = round(
        dispatch_bytes / per_dispatch / 1e6, 1
    )
    try:
        hb = [host_batch(100 + i) for i in range(3)]
        touch = jax.jit(
            lambda b: sum(v.ravel()[0].astype(jnp.float32)
                          for v in b.values())
        )
        s = shard_batch(hb[0], mesh, stacked=True)
        float(touch(s))  # warm
        t0 = time.perf_counter()
        n_xfer = 3
        for i in range(n_xfer):
            s = shard_batch(hb[i % len(hb)], mesh, stacked=True)
            float(touch(s))
        dt_xfer = time.perf_counter() - t0
        record["h2d_achieved_mbps"] = round(
            n_xfer * dispatch_bytes / dt_xfer / 1e6, 1
        )
        print(
            f"[bench] H2D: required {record['h2d_required_mbps']:.0f} MB/s "
            f"to sustain device-only rate; achieved "
            f"{record['h2d_achieved_mbps']:.0f} MB/s on this host "
            "(fetch round-trip included — a lower bound)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] H2D probe failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # Utilization trajectory (VERDICT r3 item 6): useful-model MFU counts
    # only FLOPs a perfect implementation needs; hw_util counts every FLOP
    # the program issues incl. the band-warp's one-hot matmuls (formulation
    # overhead spent to dodge TPU gathers). See tools/mfu_report.py.
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.mfu_report import flop_model, peak_tflops

        fm = flop_model(SAMPLER, BATCH, N_REFS, H, W)
        dt = per_dispatch / FUSED
        peak = peak_tflops()
        record["useful_mfu"] = round(fm["useful"] / dt / 1e12 / peak, 4)
        record["hw_util"] = round(fm["issued"] / dt / 1e12 / peak, 4)
        print(
            f"[bench] utilization: useful-model MFU "
            f"{record['useful_mfu']:.1%}, hardware {record['hw_util']:.1%} "
            f"of ~{peak:.0f} bf16 TFLOP/s peak", file=sys.stderr,
        )
    except Exception as e:  # never let the report break the bench emit
        print(f"[bench] utilization accounting failed: {type(e).__name__}:"
              f" {e}", file=sys.stderr)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
