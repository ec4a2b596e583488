"""Lane-packed 3x3 convolutions: full TPU lane utilization at tiny C.

The DispNet decoder runs 3x3 convs with 16-64 channels at up to full
832x256 resolution (reference: /root/reference/models/DispResNet.py:27-54).
On TPU, XLA lays NHWC activations out with C on the 128-wide vector lanes,
so C=16 tensors waste ~88% of every lane — the compiled production step
spent ~half its device time in the decoder's convs/pads/upsamples at
estimated-cycle efficiencies of a few percent (see docs/DESIGN.md §1).

Fix: pack P = consecutive W-pixels into the channel dimension so the
packed channel count P*C lands on a multiple of 128:

    pack:   [B, H, W, C]  ->  [B, H, W/P, P*C]     (pure reshape)

A 3x3 stride-1 conv on the unpacked tensor is EXACTLY a 3x3 conv on the
packed tensor with a zero-structured dense kernel: output sub-pixel p's
horizontal tap t in {-1,0,1} reads input sub-pixel p+t, which lives in
packed group offset g = floor((p+t)/P) in {-1,0,1} at position
q = (p+t) mod P. Expanding the [3,3,Cin,Cout] weights into
[3, 3, P*Cin, P*Cout] (one Cin x Cout block per (p,t), zeros elsewhere)
reproduces the original conv bit-for-bit up to fp32 accumulation order —
at 8x the MACs for P=8, but at ~100% lane utilization instead of ~12%,
a large net win. The expansion is a few dozen static slice-writes, fully
differentiable, so gradients flow to the ORIGINAL [3,3,Cin,Cout]
parameters and the checkpoint/param tree is unchanged.

Reflection padding (the reference decoder's mode) is applied as one
reflect row-pad in H plus hand-built boundary groups in W: the left pad
group is only ever read at position P-1 (output pixel 0's left tap) and
must hold reflect pixel x[..., 1, :]; the right pad group only at
position 0 (reflect pixel x[..., W-2, :]).
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def pack_w(x: jax.Array, p: int) -> jax.Array:
    """[B, H, W, C] -> [B, H, W//p, p*C] (consecutive-pixel groups)."""
    if p == 1:
        return x
    b, h, w, c = x.shape
    if w % p:
        raise ValueError(f"W={w} not divisible by pack factor {p}")
    return x.reshape(b, h, w // p, p * c)


def unpack_w(x: jax.Array, p: int, c: int) -> jax.Array:
    """Inverse of :func:`pack_w`."""
    if p == 1:
        return x
    b, h, wp, pc = x.shape
    return x.reshape(b, h, wp * p, c)


@functools.lru_cache(maxsize=None)
def _dup_matrix(p: int, c: int) -> np.ndarray:
    """Binary [p*c, 2p*c] with M[q*c+ci, (2q+d)*c+ci] = 1 (d in {0,1}):
    right-multiplying duplicates every packed pixel. One nonzero per
    output column, so the matmul is exact in any dtype."""
    m = np.zeros((p * c, 2 * p * c), np.float32)
    for q in range(p):
        for ci in range(c):
            m[q * c + ci, (2 * q) * c + ci] = 1.0
            m[q * c + ci, (2 * q + 1) * c + ci] = 1.0
    return m


def upsample2x_packed(x: jax.Array, p: int, c: int) -> Tuple[jax.Array, int]:
    """Nearest x2 upsample of a packed tensor; returns (packed, new_p).

    H doubles as a plain row duplication; W doubles INSIDE the groups
    (pixel p -> 2p, 2p+1) via one binary lane matmul — MXU-friendly in
    both directions (the VJP is the transposed matmul), unlike the 7-D
    broadcast+reshape formulation whose transpose lowered to a slow
    strided reduce. Exact match of models.disp_net.upsample2x.
    """
    b, h, wp, pc = x.shape
    xh = jnp.broadcast_to(x[:, :, None], (b, h, 2, wp, pc))
    xh = xh.reshape(b, 2 * h, wp, pc)
    dup = jnp.asarray(_dup_matrix(p, c), x.dtype)
    return jnp.einsum("bhwk,km->bhwm", xh, dup), 2 * p


@functools.lru_cache(maxsize=None)
def _placement(kw: int, p: int, stride: int, pad: int):
    """Constant binary placement tensor S[kt, d, q, pi] = 1 iff output
    sub-pixel ``pi``'s tap ``kt`` reads packed-group offset ``d`` at
    position ``q``: stride*pi + kt - pad == (d + d_min)*p + q. Contracting
    the original weights against S builds the packed dense kernel as pure
    broadcast-multiply — no scatter chains (a .at[].set sequence cost tens
    of est-ms per step inside the scan)."""
    offs = sorted({(stride * pi + kt - pad) // p
                   for pi in range(p) for kt in range(kw)})
    d_min, d_max = offs[0], offs[-1]
    s = np.zeros((kw, d_max - d_min + 1, p, p), np.float32)
    for pi in range(p):
        for kt in range(kw):
            src = stride * pi + kt - pad
            s[kt, src // p - d_min, src % p, pi] = 1.0
    return s, -d_min


def _expand_kernel(kernel: jax.Array, p: int, stride: int = 1) -> Tuple[jax.Array, int]:
    """[kh, kw, Cin, Cout] -> packed dense [kh, kw', p*Cin, p*Cout]."""
    kh, kw, c_in, c_out = kernel.shape
    s, pad_groups = _placement(kw, p, stride, kw // 2)
    dense = jnp.einsum(
        "tdqp,htio->hdqipo", jnp.asarray(s, kernel.dtype), kernel
    )
    return dense.reshape(kh, s.shape[1], p * c_in, p * c_out), pad_groups


def _dense_packed_kernel(
    kernel: jax.Array,
    seg_channels: Sequence[int],
    p: int,
) -> jax.Array:
    """Expand [3, 3, sum(C_j), Cout] weights into the packed dense kernel
    [3, 3, p*sum(C_j), p*Cout] for segment-concatenated packed inputs.

    The packed input columns are [seg0: p*C_0 | seg1: p*C_1 | ...], each
    segment px-major (position q's channels at q*C_j..(q+1)*C_j).
    """
    kh, kw, c_total, c_out = kernel.shape
    assert kh == 3 and kw == 3 and c_total == sum(seg_channels)
    parts, off = [], 0
    for cj in seg_channels:
        dense_j, _ = _expand_kernel(kernel[:, :, off : off + cj, :], p, 1)
        parts.append(dense_j)
        off += cj
    return jnp.concatenate(parts, axis=2)


def _pad_packed_reflect(x: jax.Array, p: int, c: int) -> jax.Array:
    """Reflect-pad a packed segment by one pixel on every side.

    H: ordinary reflect row pad. W: one pad GROUP per side; only position
    P-1 of the left group (holding reflect pixel index 1) and position 0
    of the right group (reflect pixel W-2) are ever read by the dense
    kernel — remaining positions stay zero.
    """
    from ..ops.reflect_pad import reflect_pad1_h

    b, h, wp, pc = x.shape
    x = reflect_pad1_h(x)
    # reflect pixel 1 -> group 1 // p, position 1 % p
    g1, q1 = divmod(1, p)
    left_px = x[:, :, g1, q1 * c : (q1 + 1) * c]
    w2 = wp * p - 2  # reflect pixel W-2
    g2, q2 = divmod(w2, p)
    right_px = x[:, :, g2, q2 * c : (q2 + 1) * c]
    left = jnp.zeros((b, h + 2, 1, pc), x.dtype)
    left = left.at[:, :, 0, (p - 1) * c :].set(left_px)
    right = jnp.zeros((b, h + 2, 1, pc), x.dtype)
    right = right.at[:, :, 0, :c].set(right_px)
    return jnp.concatenate([left, x, right], axis=2)


class PackedReflectConv3x3(nn.Module):
    """Reflect-pad-1 3x3 conv over one or more packed input segments.

    Parameter tree is IDENTICAL to models.disp_net.ReflectConv3x3
    (child "conv" holding kernel [3, 3, sum(C_j), features] + bias), so
    checkpoints and the torch converter are untouched; only the on-TPU
    compute layout differs. Segments: [(x_packed, C_j), ...] all packed
    with the same factor ``p`` (same W'), concatenated channel-wise in
    the reference's concat order.

    ``wide[j]`` marks segment j as an already-lane-full (C_j >= 128)
    input passed UNPACKED: expanding such a segment into the packed dense
    kernel multiplies its MACs by P for zero lane benefit (the ResNet-50+
    decoder's stage-2 skip is 256-channel). By conv linearity
    ``conv(concat(a, b), K) = conv(a, K_a) + conv(b, K_b)``, so wide
    segments run a native NHWC reflect conv on the original [3,3,C_j,F]
    kernel slice and their output is W-packed and added — identical math
    up to the fp summation split between the two partial sums.
    """

    features: int
    in_channels: Tuple[int, ...]
    pack: int
    dtype: Any = jnp.float32
    wide: Tuple[bool, ...] = ()

    @nn.compact
    def __call__(self, segments: List[jax.Array]) -> jax.Array:
        from .disp_net import conv_torch_default_init
        from ..ops.reflect_pad import reflect_pad1_hw4

        p = self.pack
        c_total = sum(self.in_channels)
        wide = self.wide or (False,) * len(self.in_channels)
        kernel = self.param(
            "kernel", conv_torch_default_init,
            (3, 3, c_total, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(),
            (self.features,), jnp.float32,
        )
        packed_segs, packed_chans, packed_k = [], [], []
        wide_out = None
        off = 0
        for s, cj, is_wide in zip(segments, self.in_channels, wide):
            kj = kernel[:, :, off : off + cj, :].astype(self.dtype)
            if is_wide:
                xw = reflect_pad1_hw4(s.astype(self.dtype))
                ow = jax.lax.conv_general_dilated(
                    xw, kj, window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                ow = pack_w(ow, p)
                wide_out = ow if wide_out is None else wide_out + ow
            else:
                packed_segs.append(s)
                packed_chans.append(cj)
                packed_k.append(kj)
            off += cj
        dense = _dense_packed_kernel(
            jnp.concatenate(packed_k, axis=2), packed_chans, p
        )
        padded = [
            _pad_packed_reflect(s.astype(self.dtype), p, cj)
            for s, cj in zip(packed_segs, packed_chans)
        ]
        x = padded[0] if len(padded) == 1 else jnp.concatenate(padded, -1)
        out = jax.lax.conv_general_dilated(
            x, dense,
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if wide_out is not None:
            out = out + wide_out
        pbias = jnp.tile(bias, p).astype(out.dtype)
        return out + pbias


# flax module classes bind params by NAME; wrap so the child is "conv"
# exactly like nn.Conv inside ReflectConv3x3.
class PackedConvBlock(nn.Module):
    """Drop-in packed twin of ReflectConv3x3: child module named "conv"."""

    features: int
    in_channels: Tuple[int, ...]
    pack: int
    dtype: Any = jnp.float32
    wide: Tuple[bool, ...] = ()

    @nn.compact
    def __call__(self, segments: List[jax.Array]) -> jax.Array:
        return PackedReflectConv3x3(
            self.features, tuple(self.in_channels), self.pack, self.dtype,
            wide=self.wide, name="conv",
        )(segments)


# ---------------------------------------------------------------------------
# Encoder-side packed ops: zero-padded strided convs + BatchNorm.
# The ResNet encoder's layer1 runs 3x3 zero-padded convs at C=64 over
# half/quarter resolution — the same lane-starved regime as the decoder.
# ---------------------------------------------------------------------------


def _dense_packed_kernel_zeros(
    kernel: jax.Array, p: int, stride: int = 1
) -> Tuple[jax.Array, int]:
    """Dense packed kernel for a SAME-zero-padded (pad = kw//2) conv with
    W-stride ``stride`` on a P-packed input; output keeps P px/group (so
    the packed-group stride is ``stride``). Returns (dense, pad_groups):
    dense [kh, kw', p*Cin, p*Cout]; pad the packed W' axis by
    ``pad_groups`` zero groups on each side and conv VALID with
    window_strides (stride, stride)."""
    return _expand_kernel(kernel, p, stride)


class PackedConvSame(nn.Module):
    """Packed twin of ``nn.Conv(features, (k,k), stride, SAME-zeros)`` on a
    P-packed input; params identical to nn.Conv (kernel [k,k,Cin,Cout], no
    bias — ResNet convs are bias-free). Output stays P-packed; W' shrinks
    by the stride."""

    features: int
    in_features: int
    kernel_size: int
    strides: int
    pack: int
    dtype: Any = jnp.float32
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from .resnet import conv_kaiming_init

        p = self.pack
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init or conv_kaiming_init,
            (k, k, self.in_features, self.features), jnp.float32,
        )
        dense, pad_groups = _dense_packed_kernel_zeros(
            kernel.astype(self.dtype), p, self.strides
        )
        pad_h = k // 2
        # Zero padding rides the conv op's native window padding: an
        # explicit jnp.pad materializes the padded activation (one extra
        # HBM pass) and differentiates into a pad-transpose slice; the
        # conv handles both directions internally for free.
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), dense,
            window_strides=(self.strides, self.strides),
            padding=((pad_h, pad_h), (pad_groups, pad_groups)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def space_to_depth2(x: jax.Array) -> jax.Array:
    """[B, 2Y, 2X, C] -> [B, Y, X, 4C] with sub-pixel order (by, bx, ci)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def expand_stem_kernel(
    kernel: jax.Array, p: int
) -> Tuple[jax.Array, int]:
    """[7, 7, C, F] stride-2 pad-3 conv1 weights -> dense packed kernel
    [4, kw', p*4C, p*F] over the space-to-depth-2, P-packed input.

    A 7x7 stride-2 conv is exactly a 4x4 stride-1 conv on the s2d grid:
    tap (dy, dx) of the original maps to s2d cell offset
    (floor(dy/2), floor(dx/2)) at sub-pixel (dy%2, dx%2); zero-padding one
    leading row/col of the 7x7 kernel realizes the mapping as a reshape.
    The X axis additionally lane-packs P s2d cells per group via the same
    placement tensor as :func:`_expand_kernel` (kw=4, stride=1, pad=2).
    """
    kh, kw, c, f = kernel.shape
    assert kh == 7 and kw == 7
    wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    # wp[2ky+by, 2kx+bx] == w[2ky+by-1, 2kx+bx-1] (zero when index -1)
    wr = wp.reshape(4, 2, 4, 2, c, f)  # [ky, by, kx, bx, ci, co]
    s, pad_groups = _placement(4, p, 1, 2)
    dense = jnp.einsum(
        "xdqp,yaxbio->ydqabipo", jnp.asarray(s, kernel.dtype), wr
    )
    # input order (q, by, bx, ci); output order (p, co)
    return dense.reshape(4, s.shape[1], p * 4 * c, p * f), pad_groups


def max_pool3x3s2_packed(x: jax.Array, p: int, c: int) -> Tuple[jax.Array, int]:
    """torch-style MaxPool(3, stride 2, pad 1) on a P-packed tensor.

    Returns (packed output with P/2 pixels per group, new pack factor).
    Matches the encoder's -inf-padded reduce_window exactly.
    """
    b, h, wp_, pc = x.shape
    neg = jnp.asarray(-jnp.inf, x.dtype)
    # W-shifted views (one pixel left/right across group boundaries)
    left_px = jnp.concatenate(
        [jnp.full((b, h, 1, c), neg, x.dtype), x[:, :, :-1, -c:]], axis=2
    )
    y_m1 = jnp.concatenate([left_px, x[..., : (p - 1) * c]], axis=-1)
    right_px = jnp.concatenate(
        [x[:, :, 1:, :c], jnp.full((b, h, 1, c), neg, x.dtype)], axis=2
    )
    y_p1 = jnp.concatenate([x[..., c:], right_px], axis=-1)
    wmax = jnp.maximum(jnp.maximum(y_m1, x), y_p1)
    # H: pad one -inf row each side, 3-row max, stride-2 rows
    hp = jnp.pad(wmax, ((0, 0), (1, 1), (0, 0), (0, 0)),
                 constant_values=-jnp.inf)
    hmax = jnp.maximum(jnp.maximum(hp[:, :-2], hp[:, 1:-1]), hp[:, 2:])
    hmax = hmax[:, 0::2]
    # W stride 2: keep even sub-pixels; groups shrink to P/2 px
    out = hmax.reshape(b, h // 2, wp_, p, c)[:, :, :, 0::2, :]
    return out.reshape(b, h // 2, wp_, (p // 2) * c), p // 2


class PackedBatchNorm(nn.Module):
    """BatchNorm over a P-packed tensor with nn.BatchNorm's exact
    semantics and variable tree (params scale/bias [C]; batch_stats
    mean/var [C]): statistics reduce over batch, H, W' AND the packed
    pixel axis, so they equal the unpacked per-channel statistics."""

    channels: int
    pack: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c, p = self.channels, self.pack
        scale = self.param(
            "scale", nn.initializers.ones_init(), (c,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (c,), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros_init(),
            jax.random.PRNGKey(0), (c,), jnp.float32,
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones_init(),
            jax.random.PRNGKey(0), (c,), jnp.float32,
        )

        b, h, wp, pc = x.shape
        xr = x.reshape(b, h, wp, p, c)
        if train:
            # stats in at-least-fp32 (fp64 under x64), like nn.BatchNorm
            stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
            xf = xr.astype(stat_dtype)
            mean = jnp.mean(xf, axis=(0, 1, 2, 3))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3))
            if self.axis_name is not None:
                mean, mean2 = jax.lax.pmean(
                    (mean, mean2), axis_name=self.axis_name
                )
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        # nn.BatchNorm's exact normalize recipe (flax _normalize): the
        # rsqrt runs in the STATS' dtype (fp32 running stats in eval),
        # multiplies propagate by numpy promotion, and the final result is
        # cast to self.dtype — reproduced op-for-op so packed == unpacked
        # to the last ulp.
        y = xr - mean
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = y * mul + bias
        return y.astype(self.dtype).reshape(b, h, wp, pc)
