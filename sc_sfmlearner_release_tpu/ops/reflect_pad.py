"""Reflect-pad-by-1 primitives whose transpose XLA runs in place.

``jnp.pad(mode="reflect")`` differentiates into full-tensor
``add(split(g), pad(row_cotangent))`` accumulation passes: each boundary
row/column's cotangent is padded back to the full gradient shape and added
in its own kLoop fusion — two extra HBM passes per padded conv per
backward. In the compiled production train step these pads were the
largest single cost of the DispNet decoder backward (~11 estimated ms
across the ``upconv_*`` stages, plus the SSIM window pads; see
docs/DESIGN.md §1, round 5).

The functions here compute the IDENTICAL forward values (a reflect pad of
one element is a concat of row/column copies — bitwise equal to
``jnp.pad``, including the size-1-axis edge case where reflect degrades to
edge replication) but define a custom VJP that materializes the interior
slice once and then applies the two boundary contributions as one-row /
one-column ``dynamic-update-slice`` adds, which XLA fuses and performs in
place instead of re-writing the whole tensor.

Reference behavior being reproduced: torch ``nn.ReflectionPad2d(1)``
(/root/reference/models/DispResNet.py:27-42) and the reflect-padded 3x3
SSIM window (/root/reference/loss_functions.py:12-38).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_axis(x: jax.Array, axis: int) -> jax.Array:
    """Concat the two reflect boundary slices around ``x`` along ``axis``.
    Reflect index for size n > 1 is 1 / n-2; a size-1 axis replicates its
    only element (numpy/jnp reflect semantics)."""
    n = x.shape[axis]
    il = 1 if n > 1 else 0
    ir = n - 2 if n > 1 else n - 1
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(il, il + 1)
    left = x[tuple(sl)]
    sl[axis] = slice(ir, ir + 1)
    right = x[tuple(sl)]
    return jnp.concatenate([left, x, right], axis=axis)


def _unpad_axis(g: jax.Array, axis: int, n: int) -> jax.Array:
    """Transpose of :func:`_pad_axis`: interior slice plus two one-slice
    in-place adds (the dynamic-update-slice indices coincide harmlessly
    for n <= 2 — the adds still accumulate)."""
    il = 1 if n > 1 else 0
    ir = n - 2 if n > 1 else 0
    sl = [slice(None)] * g.ndim
    sl[axis] = slice(1, n + 1)
    dx = g[tuple(sl)]
    sl[axis] = slice(0, 1)
    first = g[tuple(sl)]
    sl[axis] = slice(n + 1, n + 2)
    last = g[tuple(sl)]
    ixl = [slice(None)] * g.ndim
    ixl[axis] = slice(il, il + 1)
    dx = dx.at[tuple(ixl)].add(first)
    ixr = [slice(None)] * g.ndim
    ixr[axis] = slice(ir, ir + 1)
    dx = dx.at[tuple(ixr)].add(last)
    return dx


@jax.custom_vjp
def reflect_pad1_h(x: jax.Array) -> jax.Array:
    """``[B, H, W, C] -> [B, H+2, W, C]``: reflect-pad rows by one."""
    return _pad_axis(x, 1)


def _rp1h_fwd(x):
    return reflect_pad1_h(x), x.shape[1]


def _rp1h_bwd(h, g):
    return (_unpad_axis(g, 1, h),)


reflect_pad1_h.defvjp(_rp1h_fwd, _rp1h_bwd)


@jax.custom_vjp
def reflect_pad1_hw(x: jax.Array) -> jax.Array:
    """``[N, H, W] -> [N, H+2, W+2]``: reflect-pad the two trailing axes
    by one (separable, so H-then-W concat equals ``jnp.pad`` exactly)."""
    return _pad_axis(_pad_axis(x, 1), 2)


def _rp1hw_fwd(x):
    return reflect_pad1_hw(x), (x.shape[1], x.shape[2])


def _rp1hw_bwd(res, g):
    h, w = res
    return (_unpad_axis(_unpad_axis(g, 2, w), 1, h),)


reflect_pad1_hw.defvjp(_rp1hw_fwd, _rp1hw_bwd)


@jax.custom_vjp
def reflect_pad1_hw4(x: jax.Array) -> jax.Array:
    """``[B, H, W, C] -> [B, H+2, W+2, C]``: reflect-pad H and W by one."""
    return _pad_axis(_pad_axis(x, 1), 2)


def _rp1hw4_fwd(x):
    return reflect_pad1_hw4(x), (x.shape[1], x.shape[2])


def _rp1hw4_bwd(res, g):
    h, w = res
    return (_unpad_axis(_unpad_axis(g, 2, w), 1, h),)


reflect_pad1_hw4.defvjp(_rp1hw4_fwd, _rp1hw4_bwd)
