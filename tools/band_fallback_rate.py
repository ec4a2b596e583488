#!/usr/bin/env python
"""Band-sampler fallback rate under KITTI-scale motion statistics.

The banded warp (ops/warp_band.py) pays one exact whole-call gather step
(~4.5x the band step at the canonical config) whenever ANY directed pair's
warp leaves its (row / column) band window. This tool quantifies how often
that happens for realistic driving motion, so the production default can
be chosen from measured rates instead of worst-case hand analysis
(VERDICT r3 "What's weak" #3: the default band64r8 budget is 28 rows vs a
stated ~30 px KITTI near-field worst case).

Method: render multi-view-consistent synthetic driving scenes with ground
-truth depth and poses (tools/synthetic_scene.py — camera 1.5 m above
ground, forward motion with steering, boxes + ground plane + far wall,
832x256 with KITTI-like intrinsics), sweep the per-frame speed from gentle
(~0.4 m/frame ~ 14 km/h at 10 Hz) past KITTI-highway (~1.7 m/frame
~ 60 km/h), form every directed (target, source=target+-1) pair exactly as
the training loss does, compute the TRUE warp coordinates from GT depth +
GT relative pose through the framework's own projection
(ops.geometry project-pixel path), and evaluate the per-pair band-fit
predicate (ops.warp_band.band_fits_per_element — the same guard the
production sampler's lax.cond uses) for a table of sampler configs.

Pixels that project out of frame never trigger the guard (their bilinear
weights are zero — the clamp-to-2 trick), so only IN-FRAME displacement
matters; this is why huge near-field flows at the image bottom mostly
don't fall back: those pixels leave the frame.

Also reports the displacement distribution (p99 / max of in-frame |dy|,
|dx|) so the budget arithmetic is visible next to the rates.

Usage:
  python tools/band_fallback_rate.py                  # full sweep table
  python tools/band_fallback_rate.py --speeds 0.8,1.7 --configs band64,band96
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

H, W = 256, 832
# TRUE KITTI intrinsics scaled to the 832x256 training crop: P_rect_02 of
# the 2011_09_26 calibration (fx=fy=721.54, cx=609.56, cy=172.85 at
# 1242x375) times (832/1242, 256/375) — the prepare-ETL scaling
# (data/prepare/kitti_raw.py). Focal length sets the displacement budget
# directly (near-ground depth ~ fy * cam_height / (y - cy)), so using a
# synthetic wide-FOV K here would overstate fallback rates ~2x.
FX, FY = 721.5377 * 832.0 / 1242.0, 721.5377 * 256.0 / 375.0
CX, CY = 609.5593 * 832.0 / 1242.0, 172.854 * 256.0 / 375.0

DEFAULT_SPEEDS = (0.4, 0.8, 1.2, 1.7, 2.2)  # m/frame (10 Hz: 14-80 km/h)
DEFAULT_CONFIGS = (
    "band48", "band64", "band64r16", "band80", "band96",
    "band64x416c208", "band64x336c208", "band96x416c208",
)


def _trajectory(n: int, speed: float, rng: np.random.RandomState,
                steer: float = 1.0) -> np.ndarray:
    """Forward driving with steering + small pitch/roll noise [n, 4, 4].

    Like tools/synthetic_scene.camera_trajectory but with a speed knob and
    stronger yaw (KITTI city sequences corner harder than the overfit
    scene), plus per-frame pitch noise (road bumps) which is what actually
    drives vertical in-frame displacement for distant pixels.
    """
    poses = []
    pos = np.zeros(3)
    yaw, pitch = 0.0, 0.0
    for i in range(n):
        yaw += steer * (0.01 * np.sin(i / 7.0) + rng.normal(0, 0.004))
        pitch = 0.6 * pitch + rng.normal(0, 0.004)  # AR(1) road pitch
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        r_yaw = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        r_pitch = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        r = r_yaw @ r_pitch
        fwd = r @ np.array([0, 0, 1.0])
        pos = pos + fwd * speed
        p = np.eye(4)
        p[:3, :3] = r
        p[:3, 3] = pos
        poses.append(p)
    return np.stack(poses)


def _make_roadside_boxes(rng: np.random.RandomState, poses: np.ndarray,
                         n: int = 28, corridor: float = 3.0):
    """Boxes lining the ACTUAL trajectory, offset laterally from the local
    heading by at least ``corridor`` + half-width — KITTI obstacles
    (parked cars, poles, facades) line the road, they don't sit on it.
    Anchoring to the path (not a fixed axis) matters: a steering
    trajectory drifts meters off its initial axis, and boxes placed
    relative to that axis end up ON the road. The corridor width is the
    realism knob: --corridor 1.5 models squeezing past near obstacles."""
    boxes = []
    for _ in range(n):
        w = rng.uniform(1.5, 5.0)
        i = rng.randint(0, len(poses))
        pos = poses[i][:3, 3]
        fwd = poses[i][:3, :3] @ np.array([0, 0, 1.0])
        fwd = fwd / np.linalg.norm(fwd)
        perp = np.array([fwd[2], 0.0, -fwd[0]])  # lateral, ground plane
        side = 1 if rng.rand() < 0.5 else -1
        lat = side * (corridor + w / 2 + rng.uniform(0.0, 10.0))
        along = rng.uniform(-10.0, 50.0)
        c = pos + lat * perp + along * fwd
        h = rng.uniform(2.0, 6.0)
        d = rng.uniform(1.5, 5.0)
        lo = np.array([c[0] - w / 2, 1.5 - h, c[2] - d / 2])
        hi = np.array([c[0] + w / 2, 1.5, c[2] + d / 2])
        boxes.append((lo, hi))
    return boxes


def _render_depths(poses: np.ndarray, seed: int,
                   corridor: float = 3.0) -> np.ndarray:
    """GT depth maps for each pose via the synthetic-scene raycaster,
    with KITTI intrinsics, roadside-only boxes, and the trajectory capped
    before the scene's z=90 back wall (enforced by the caller)."""
    from tools import synthetic_scene as sc

    # raycaster reads module globals; align them with this tool's camera
    sc.FX, sc.FY, sc.CX, sc.CY = FX, FY, CX, CY
    rng = np.random.RandomState(seed)
    boxes = _make_roadside_boxes(rng, poses, corridor=corridor)

    return np.stack([sc.render(p, boxes)[1] for p in poses])


def _directed_pairs(poses: np.ndarray):
    """All directed (tgt, src=tgt+-1) index pairs, as the training loss
    forms them (both warp directions per adjacent pair)."""
    n = len(poses)
    out = []
    for t in range(n):
        for s in (t - 1, t + 1):
            if 0 <= s < n:
                out.append((t, s))
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--speeds", default=",".join(map(str, DEFAULT_SPEEDS)))
    p.add_argument("--configs", default=",".join(DEFAULT_CONFIGS))
    p.add_argument("--frames", type=int, default=48,
                   help="frames per (speed, seed) trajectory")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--steer", type=float, default=1.0)
    p.add_argument("--corridor", type=float, default=3.0,
                   help="clear half-width of the driving corridor in m "
                        "(obstacles keep at least this lateral distance)")
    args = p.parse_args()

    speeds = [float(s) for s in args.speeds.split(",")]
    configs = [c.strip() for c in args.configs.split(",")]

    import jax.numpy as jnp

    from sc_sfmlearner_release_tpu.ops.geometry import (
        _parse_band, cam2pixel, pixel2cam, validate_sampler,
    )
    from sc_sfmlearner_release_tpu.ops.warp_band import band_fits_per_element

    for c in configs:
        validate_sampler(c)

    k = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
    kj = jnp.asarray(k)[None]
    kinv = jnp.asarray(np.linalg.inv(k))[None]

    # displacement grid for the in-frame |dy| / |dx| statistics
    ys = (np.arange(H, dtype=np.float32))[:, None]
    xs = (np.arange(W, dtype=np.float32))[None, :]

    header = f"{'speed':>6} {'pairs':>6} {'p99|dy|':>8} {'max|dy|':>8} " \
             f"{'p99|dx|':>8} {'max|dx|':>8}"
    for c in configs:
        header += f" {c:>16}"
    print(header, flush=True)

    summary = {c: [0, 0] for c in configs}  # violations, pairs
    for speed in speeds:
        viol = {c: 0 for c in configs}
        n_pairs = 0
        dys, dxs = [], []
        for seed in range(args.seeds):
            # cap the trajectory before the raycaster's z=90 back wall
            n_frames = min(args.frames, max(8, int(70.0 / speed)))
            poses = _trajectory(n_frames, speed,
                                np.random.RandomState(100 + seed),
                                steer=args.steer)
            depths = _render_depths(poses, seed, corridor=args.corridor)
            for t, s in _directed_pairs(poses):
                # target->source camera transform from GT c2w poses
                rel = np.linalg.inv(poses[s]) @ poses[t]
                proj = jnp.asarray(
                    (k @ rel[:3].astype(np.float32))[None]
                )
                depth_t = jnp.asarray(depths[t])[None]
                cam = pixel2cam(depth_t, kinv)
                coords, _ = cam2pixel(cam, proj, "zeros")
                for c in configs:
                    band, rows, xband, cols, _, _ = _parse_band(c)
                    fits = band_fits_per_element(
                        coords, "zeros", band, rows, xband, cols
                    )
                    ok = bool(np.asarray(fits)[0])
                    viol[c] += 0 if ok else 1
                    summary[c][0] += 0 if ok else 1
                    summary[c][1] += 1
                n_pairs += 1
                # in-frame displacement stats (clamp-to-2 marks out-of-
                # frame; exclude those)
                cn = np.asarray(coords[0])
                infr = (np.abs(cn[..., 0]) <= 1.0) & (np.abs(cn[..., 1]) <= 1.0)
                px = (cn[..., 0] + 1.0) * W / 2.0 - 0.5
                py = (cn[..., 1] + 1.0) * H / 2.0 - 0.5
                dys.append(np.abs(py - ys)[infr])
                dxs.append(np.abs(px - xs)[infr])
        dy = np.concatenate(dys)
        dx = np.concatenate(dxs)
        row = (f"{speed:6.1f} {n_pairs:6d} {np.percentile(dy, 99):8.1f} "
               f"{dy.max():8.1f} {np.percentile(dx, 99):8.1f} "
               f"{dx.max():8.1f}")
        for c in configs:
            row += f" {100.0 * viol[c] / n_pairs:15.1f}%"
        print(row, flush=True)

    print("\nOverall fallback rate (all speeds pooled):", flush=True)
    for c in configs:
        v, n = summary[c]
        print(f"  {c:>16}: {100.0 * v / n:6.2f}%  ({v}/{n} directed pairs)",
              flush=True)
    print(
        "\nNote: a TRAINING step falls back if ANY of its 2N*B directed "
        "pairs violates — at the canonical config (B=4, N=2: 16 pairs) "
        "the per-step rate is ~1-(1-r)^16 for independent pair rate r.",
        flush=True,
    )


if __name__ == "__main__":
    main()
