#!/usr/bin/env python
"""Standalone microbenchmark: Pallas fused band-warp forward vs the jnp
scan formulation (ops/warp_band._band_sample_fwd's per-tile body).

The jnp path's per-tile HBM round-trips — the one-hot [B,P,XB+1] and the
tap tensor t [B,P,band,2C] — are the gap between the warp's ~9 ms MXU
floor and its ~20 ms forward cost. The Pallas kernel generates the
one-hot and keeps t in VMEM, writing only the [P,C] outputs + [P,4C]
saved taps per tile.

Mosaic layout notes (the shape constraints that drove the design):
  * block last-two dims must be (multiple of 8, multiple of 128) OR equal
    to the array dims — per-pixel vectors ride as [P, small] planes;
  * lane-crossing reshapes ([1,13,128] -> [1664,1]) are unsupported, so
    indices arrive pre-shaped [P, 3] and weights pre-broadcast [P, 2C];
  * matmul accumulation must be fp32 (cast down after).

Usage: python tools/bench_pallas_warp.py [--tiles 128] [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND, XB, COLS, ROWS, C = 64, 416, 208, 8, 5
P = ROWS * COLS          # 1664 output pixels per tile
K = XB + 1               # 417 contraction width
N = BAND * 2 * C         # 640


def _pallas_fwd(pair, idx, w0, w1):
    """pair [G, K, N] bf16; idx [G, P, 3] int32 (x0, r0, r1);
    w0/w1 [G, P, 2C] fp32 (w00|w01 and w10|w11 pre-broadcast over C).
    Returns (out [G, P, C] fp32, taps [G, P, 4C] bf16)."""
    g = pair.shape[0]

    def kernel(pair_ref, idx_ref, w0_ref, w1_ref, out_ref, taps_ref):
        idx = idx_ref[0]                                     # [P, 3]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (P, K), 1)
            == idx[:, 0:1] + 1
        ).astype(jnp.bfloat16)
        t = jnp.dot(onehot, pair_ref[0],
                    preferred_element_type=jnp.float32)       # [P, N] f32
        t = t.astype(jnp.bfloat16)
        # y-selection without lane-crossing reshapes: mask the band-row
        # group on the flat N = band*2C axis (col // 2C == r), then
        # group-reduce with a constant binary [N, 2C] matmul (exactly one
        # nonzero survives per output -> bf16-exact on the MXU).
        colg = jax.lax.broadcasted_iota(jnp.int32, (P, N), 1) // (2 * C)
        m0 = (colg == idx[:, 1:2]).astype(jnp.bfloat16)
        m1 = (colg == idx[:, 2:3]).astype(jnp.bfloat16)
        red = (
            jax.lax.broadcasted_iota(jnp.int32, (N, 2 * C), 0) % (2 * C)
            == jax.lax.broadcasted_iota(jnp.int32, (N, 2 * C), 1)
        ).astype(jnp.bfloat16)
        ty0 = jnp.dot(t * m0, red,
                      preferred_element_type=jnp.float32)     # [P, 2C]
        ty1 = jnp.dot(t * m1, red,
                      preferred_element_type=jnp.float32)
        a = w0_ref[0] * ty0 + w1_ref[0] * ty1                 # [P, 2C]
        # half-sum (w00*tap00 + w01*tap01 + ...) via a constant [2C, C]
        # fold matmul (lane slicing is layout-hostile in Mosaic)
        fold = (
            jax.lax.broadcasted_iota(jnp.int32, (2 * C, C), 0) % C
            == jax.lax.broadcasted_iota(jnp.int32, (2 * C, C), 1)
        ).astype(jnp.float32)
        out_ref[0] = jnp.dot(a, fold, preferred_element_type=jnp.float32)
        taps_ref[0] = jnp.concatenate(
            [ty0, ty1], axis=-1).astype(jnp.bfloat16)

    spec_g = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    out, taps = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[spec_g((K, N)), spec_g((P, 3)),
                  spec_g((P, 2 * C)), spec_g((P, 2 * C))],
        out_specs=[spec_g((P, C)), spec_g((P, 4 * C))],
        out_shape=[jax.ShapeDtypeStruct((g, P, C), jnp.float32),
                   jax.ShapeDtypeStruct((g, P, 4 * C), jnp.bfloat16)],
    )(pair, idx, w0, w1)
    return out, taps


def _jnp_fwd(pair, idx, w0, w1):
    """The current scan-body math on the same pre-built inputs."""

    def one(_, xs):
        pairi, idxi, w0i, w1i = xs
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (P, K), 1)
            == idxi[:, 0:1] + 1
        ).astype(jnp.bfloat16)
        t = jnp.dot(onehot, pairi, preferred_element_type=jnp.bfloat16)
        t3 = t.reshape(P, BAND, 2 * C)
        rio = jax.lax.broadcasted_iota(jnp.int32, (P, BAND), 1)
        o0 = (rio == idxi[:, 1:2]).astype(jnp.bfloat16)
        o1 = (rio == idxi[:, 2:3]).astype(jnp.bfloat16)
        ty0 = jnp.einsum("pr,prk->pk", o0, t3,
                         preferred_element_type=jnp.bfloat16)
        ty1 = jnp.einsum("pr,prk->pk", o1, t3,
                         preferred_element_type=jnp.bfloat16)
        a0 = w0i * ty0.astype(jnp.float32)
        a1 = w1i * ty1.astype(jnp.float32)
        out = a0[:, :C] + a0[:, C:] + a1[:, :C] + a1[:, C:]
        return None, (out, jnp.concatenate([ty0, ty1], -1))

    _, (out, taps) = jax.lax.scan(one, None, (pair, idx, w0, w1))
    return out, taps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiles", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    g = args.tiles * args.batch
    rng = np.random.RandomState(0)
    pair = jnp.asarray(rng.rand(g, K, N).astype(np.float32)).astype(
        jnp.bfloat16)
    x0 = rng.randint(0, K - 1, (g, P))
    r0 = rng.randint(0, BAND - 1, (g, P))
    r1 = np.minimum(r0 + 1, BAND - 1)
    idx = jnp.asarray(np.stack([x0, r0, r1], axis=-1), jnp.int32)
    w0 = jnp.asarray(rng.rand(g, P, 2 * C).astype(np.float32))
    w1 = jnp.asarray(rng.rand(g, P, 2 * C).astype(np.float32))

    f_pl = jax.jit(_pallas_fwd)
    f_jnp = jax.jit(_jnp_fwd)

    o_pl, t_pl = f_pl(pair, idx, w0, w1)
    o_jn, t_jn = f_jnp(pair, idx, w0, w1)
    err_o = float(jnp.max(jnp.abs(o_pl - o_jn)))
    err_t = float(jnp.max(jnp.abs(
        t_pl.astype(jnp.float32) - t_jn.astype(jnp.float32))))
    print(f"max |out| err {err_o:.2e}, |taps| err {err_t:.2e}", flush=True)

    def timeit(f, name):
        o, t = f(pair, idx, w0, w1)
        float(jnp.sum(o[0, 0]))
        t0 = time.perf_counter()
        for _ in range(2):
            o, _ = f(pair, idx, w0, w1)
        float(jnp.sum(o[0, 0]))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o, _ = f(pair, idx, w0, w1)
        float(jnp.sum(o[0, 0]))
        tn = time.perf_counter() - t0
        per = (tn - t2) / (args.iters - 2) * 1e3
        print(f"{name:8s} {per:7.2f} ms/call", flush=True)
        return per

    timeit(f_jnp, "jnp")
    timeit(f_pl, "pallas")


if __name__ == "__main__":
    main()
