#!/usr/bin/env python
"""One-command warp-sampler autotune for a deployment target.

The production default (`--sampler auto` = band80r16x368c208l192) was
chosen from slope-timed step costs x measured fallback rates on THIS
repo's v5e rig (docs/DESIGN.md §3). A different TPU generation, image
size, or motion profile moves both sides of that trade. This tool
re-runs the choice end-to-end on the user's own hardware:

1. slope-time each candidate sampler's PRIMARY-path step cost
   (tools/ablate_step.py protocol, lr=0 so the state cannot drift out
   of the band budget mid-measurement);
2. slope-time each candidate's fallback-rung cost (the ladder's cover
   band as an `nf` sampler — the rung a violating step actually pays);
3. compute per-pair band-violation rates on calibrated synthetic
   driving motion (tools/band_fallback_rate.py raycast world, true
   KITTI intrinsics) for each requested speed;
4. compose expected ms/step per (candidate, speed) as
   ``base + p_step * (rung - base)`` with ``p_step = 1-(1-r)^(2NB)``,
   and recommend the argmin under a speed-weighted profile.

The composition was validated in-training round 5: a measured
production epoch at 1.7 m/frame ran within 2.5% of the composed
prediction (docs/DESIGN.md §3 "Measured fallback economics
in-training"). Rates come from synthetic GT geometry and are a
conservative upper bound on trained-net behavior (learned depth is
smoother than raycast GT).

Usage:
  python tools/autotune_sampler.py                     # default family
  python tools/autotune_sampler.py --candidates band64r16x368c208l192 \
      --speeds 0.8,1.2 --weights 0.5,0.5 --n 12
  python tools/autotune_sampler.py --no-rates          # timing only
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np

DEFAULT_CANDIDATES = (
    "band64r16x368c208l192",
    "band80r16x368c208l192",
    "band96r16x368c208l192",
)
# directed pairs per training step at the canonical config (B=4, N=2)
PAIRS_PER_STEP = 16


def _measure_step(
    sampler: str, n: int, lr: float = 0.0, layers: int = 18
) -> float:
    import tools.ablate_step as ab

    name = f"autotune:{sampler}"
    ab.CONFIGS[name] = {"sampler": sampler, "lr": lr, "layers": layers}
    return ab.measure(name, n)


def _rung_sampler(candidate: str) -> str:
    """The fallback rung a violating step pays: the ladder's cover band
    as a no-fallback sampler (e.g. ...l192 -> band192r8nf), or the exact
    gather for plain band samplers."""
    from sc_sfmlearner_release_tpu.ops.geometry import _parse_band

    _, _, _, _, _, ladder = _parse_band(candidate)
    if ladder is None:
        return "gather"
    return f"band{ladder}r8nf"


def _violation_rates(candidates, speeds, frames, seeds):
    """Per-pair violation rate per (candidate, speed) on the raycast
    world — the same predicate loop as tools/band_fallback_rate.py."""
    import jax.numpy as jnp

    import tools.band_fallback_rate as bfr
    from sc_sfmlearner_release_tpu.ops.geometry import (
        _parse_band, cam2pixel, pixel2cam,
    )
    from sc_sfmlearner_release_tpu.ops.warp_band import band_fits_per_element

    k = np.array(
        [[bfr.FX, 0, bfr.CX], [0, bfr.FY, bfr.CY], [0, 0, 1]], np.float32
    )
    kj_inv = jnp.asarray(np.linalg.inv(k))[None]
    rates = {}
    for speed in speeds:
        viol = {c: 0 for c in candidates}
        n_pairs = 0
        for seed in range(seeds):
            n_frames = min(frames, max(8, int(70.0 / speed)))
            poses = bfr._trajectory(
                n_frames, speed, np.random.RandomState(100 + seed)
            )
            depths = bfr._render_depths(poses, seed)
            for t, s in bfr._directed_pairs(poses):
                rel = np.linalg.inv(poses[s]) @ poses[t]
                proj = jnp.asarray((k @ rel[:3].astype(np.float32))[None])
                cam = pixel2cam(jnp.asarray(depths[t])[None], kj_inv)
                coords, _ = cam2pixel(cam, proj, "zeros")
                for c in candidates:
                    band, rows, xband, cols, _, _ = _parse_band(c)
                    fits = band_fits_per_element(
                        coords, "zeros", band, rows, xband, cols
                    )
                    viol[c] += 0 if bool(np.asarray(fits)[0]) else 1
                n_pairs += 1
        for c in candidates:
            rates[(c, speed)] = viol[c] / max(n_pairs, 1)
    return rates


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--candidates", default=",".join(DEFAULT_CANDIDATES))
    p.add_argument("--speeds", default="0.8,1.2,1.7",
                   help="m/frame motion magnitudes for the rate model")
    p.add_argument("--weights", default=None,
                   help="profile weights per speed (default: uniform)")
    p.add_argument("--n", type=int, default=12,
                   help="long-chain length for the slope protocol")
    p.add_argument("--layers", type=int, default=18,
                   help="DispNet encoder depth to tune for (pose stays "
                        "18, reference parity)")
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--seeds", type=int, default=2)
    p.add_argument("--no-rates", dest="rates", action="store_false",
                   help="timing-only sweep (skip the raycast rate model)")
    args = p.parse_args()

    from sc_sfmlearner_release_tpu.ops.geometry import validate_sampler

    candidates = [c.strip() for c in args.candidates.split(",")]
    for c in candidates:
        validate_sampler(c)
    speeds = [float(s) for s in args.speeds.split(",")]
    weights = (
        [float(w) for w in args.weights.split(",")]
        if args.weights else [1.0 / len(speeds)] * len(speeds)
    )
    if len(weights) != len(speeds):
        raise SystemExit("--weights must match --speeds")
    wsum = sum(weights)
    weights = [w / wsum for w in weights]

    print("== primary-path step cost (slope protocol, lr=0) ==",
          flush=True)
    base = {
        c: _measure_step(c, args.n, layers=args.layers) * 1e3
        for c in candidates
    }

    rung = {}
    if args.rates:
        print("\n== fallback-rung step cost ==", flush=True)
        rung_names = {c: _rung_sampler(c) for c in candidates}
        for rs in sorted(set(rung_names.values())):
            cost = _measure_step(rs, args.n, layers=args.layers) * 1e3
            for c, name in rung_names.items():
                if name == rs:
                    rung[c] = cost

        print("\n== per-pair violation rates (raycast world) ==",
              flush=True)
        rates = _violation_rates(
            candidates, speeds, args.frames, args.seeds
        )
        for c in candidates:
            row = "  ".join(
                f"{s:.1f}m/f: {100 * rates[(c, s)]:5.1f}%" for s in speeds
            )
            print(f"  {c:>24}  {row}", flush=True)

        print("\n== expected ms/step (base + p_step * (rung - base)) ==",
              flush=True)
        expected = {}
        for c in candidates:
            per_speed = []
            for s in speeds:
                p_step = 1.0 - (1.0 - rates[(c, s)]) ** PAIRS_PER_STEP
                per_speed.append(
                    base[c] + p_step * max(rung[c] - base[c], 0.0)
                )
            expected[c] = sum(w * e for w, e in zip(weights, per_speed))
            row = "  ".join(
                f"{s:.1f}m/f: {e:6.1f}" for s, e in zip(speeds, per_speed)
            )
            print(f"  {c:>24}  {row}  | profile: {expected[c]:6.1f}",
                  flush=True)
        best = min(expected, key=expected.get)
        print(f"\nRecommended: --sampler {best} "
              f"(expected {expected[best]:.1f} ms/step over the profile; "
              f"primary {base[best]:.1f}, rung {rung[best]:.1f})",
              flush=True)
    else:
        best = min(base, key=base.get)
        print(f"\nRecommended (timing-only): --sampler {best} "
              f"({base[best]:.1f} ms/step primary path)", flush=True)


if __name__ == "__main__":
    main()
