#!/usr/bin/env python
"""Per-op cost attribution from the compiled HLO's backend configs.

The TPU backend annotates every emitted op with its cost-model
``estimated_cycles``; summing them over the while-loop body gives a
per-optimizer-step attribution that — unlike the profiler on this tunnel
(per-event overhead inflates device time ~5x) — has zero measurement
distortion. Estimated cycles are a model, not a measurement: validate the
total against the slope-timed step before trusting the split.

Usage: python tools/hlo_cost.py [--sampler band64] [--fused 16] [--top 30]
       [--convs-only] [--out /tmp/hlo.txt]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

_CYCLES_RE = re.compile(r'"estimated_cycles":"(\d+)"')
_META_RE = re.compile(r'metadata=\{op_name="([^"]*)"')


def classify(line: str, op_name: str) -> str:
    l = line.lstrip()
    hlo = l.split(" = ")[0] if " = " in l else l
    def has(p): return re.search(p, l) is not None
    if "conv_general_dilated" in op_name or has(r"= \S+ convolution"):
        return "conv"
    if "copy" in hlo:
        return "layout-copy"
    if has(r"kind=kOutput.*dot") or has(r"= \S+ dot\(") or "einsum" in op_name:
        return "matmul"
    if "reduce-window" in l:
        return "reduce-window"
    if "all-reduce" in l:
        return "collective"
    if "fusion" in hlo:
        return "fusion(elementwise/other)"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sampler", default="band64")
    p.add_argument("--fused", type=int, default=16)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--layers", type=int, default=18,
                   help="DispNet encoder depth (pose stays 18)")
    p.add_argument("--no-augment", dest="augment", action="store_false")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--by-path", type=int, default=0, metavar="N",
                   help="also aggregate cycles by N op_name path "
                        "components (e.g. 2 separates disp-vs-pose "
                        "encoder stages)")
    p.add_argument("--path-skip", type=int, default=0, metavar="S",
                   help="skip the first S path components before "
                        "grouping (drop the common jit(...)/while/body "
                        "prefix)")
    p.add_argument("--out", default=None, help="also write full HLO text")
    p.add_argument("--clock-ghz", type=float, default=0.94)
    args = p.parse_args()

    import types

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ps", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "profile_step.py"))
    ps = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ps)

    bargs = types.SimpleNamespace(
        batch=args.batch, fused=args.fused, sampler=args.sampler,
        augment=args.augment, remat=args.remat, layers=args.layers,
    )
    step, state, batch, pick = ps.build_step(bargs)
    txt = step.lower(state, batch).compile().as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)
        print(f"HLO written to {args.out} ({len(txt)} bytes)")

    per_bucket = collections.Counter()
    per_op = collections.Counter()
    rows = []
    for line in txt.splitlines():
        m = _CYCLES_RE.search(line)
        if not m:
            continue
        cyc = int(m.group(1))
        meta = _META_RE.search(line)
        op_name = meta.group(1) if meta else ""
        bucket = classify(line, op_name)
        per_bucket[bucket] += cyc
        # compress op_name to its trailing path for grouping
        key = "/".join(op_name.split("/")[-3:]) if op_name else \
            line.lstrip().split(" ")[0]
        per_op[(bucket, key)] += cyc
        rows.append((cyc, bucket, key))

    total = sum(per_bucket.values())
    to_ms = 1.0 / (args.clock_ghz * 1e9) * 1e3
    print(f"total estimated: {total * to_ms:.1f} ms "
          f"(clock {args.clock_ghz} GHz). The scan body appears ONCE in "
          "HLO, so this approximates ONE optimizer step plus the "
          "per-dispatch prologue/epilogue.")
    print("\nby bucket (ms per step):")
    for b, cyc in per_bucket.most_common():
        print(f"  {cyc * to_ms:8.2f} ms  {100 * cyc / total:5.1f}%  {b}")
    print(f"\ntop {args.top} ops (ms per step):")
    for (bucket, key), cyc in per_op.most_common(args.top):
        print(f"  {cyc * to_ms:8.3f} ms  {bucket:24s} {key}")

    if args.by_path:
        per_path = collections.Counter()
        for line in txt.splitlines():
            m = _CYCLES_RE.search(line)
            if not m:
                continue
            meta = _META_RE.search(line)
            op_name = meta.group(1) if meta else ""
            parts = op_name.split("/") if op_name else []
            parts = parts[args.path_skip:]
            key = "/".join(parts[: args.by_path]) or "(no op_name)"
            per_path[key] += int(m.group(1))
        print(f"\nby leading {args.by_path} path components (ms per step):")
        for key, cyc in per_path.most_common(40):
            print(f"  {cyc * to_ms:8.2f} ms  {100 * cyc / total:5.1f}%  "
                  f"{key}")


if __name__ == "__main__":
    main()
