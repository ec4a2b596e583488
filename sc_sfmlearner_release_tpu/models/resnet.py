"""ResNet feature-pyramid encoder in Flax (NHWC, TPU-native).

Behavioral parity target: /root/reference/models/resnet_encoder.py —
a torchvision-structured ResNet (18/34/50/101/152) truncated to its 5 feature
stages, with optional multi-image input (first conv takes
``3 * num_input_images`` channels; pretrained weights are channel-averaged at
conversion time, see models/convert.py).

Module names mirror torchvision's parameter tree (conv1/bn1/layerX_Y with
conv1..conv3, bn1..bn3, downsample_conv/downsample_bn inside each block) so
ImageNet / reference checkpoints convert mechanically.

BatchNorm: pass ``axis_name`` to synchronize batch statistics across a device
mesh axis (sync-BN) — essential at small per-device batch under data
parallelism (SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision kaiming_normal_(mode='fan_out', nonlinearity='relu')
conv_kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")

STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
BOTTLENECK = {18: False, 34: False, 50: True, 101: True, 152: True}


def encoder_channels(num_layers: int) -> Tuple[int, ...]:
    """Per-stage output channels (reference: resnet_encoder.py:68,84-85)."""
    base = (64, 64, 128, 256, 512)
    if BOTTLENECK[num_layers]:
        return (64,) + tuple(c * 4 for c in base[1:])
    return base


class _Norm(nn.Module):
    """BatchNorm with optional cross-device stat sync, torch-compatible
    hyperparameters (momentum 0.1 torch == 0.9 flax, eps 1e-5)."""

    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = lambda name: _Norm(self.axis_name, self.dtype, name=name)
        conv = lambda f, s, name: nn.Conv(
            f, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, kernel_init=conv_kaiming_init,
            name=name,
        )

        identity = x
        out = conv(self.features, self.strides, "conv1")(x)
        out = norm("bn1")(out, train)
        out = nn.relu(out)
        out = conv(self.features, 1, "conv2")(out)
        out = norm("bn2")(out, train)

        if self.strides != 1 or identity.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, kernel_init=conv_kaiming_init,
                name="downsample_conv",
            )(identity)
            identity = norm("downsample_bn")(identity, train)

        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (stride on the 3x3 conv, expansion 4)."""

    features: int  # bottleneck width; output is 4x
    strides: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = lambda name: _Norm(self.axis_name, self.dtype, name=name)
        out_features = self.features * 4

        identity = x
        out = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=conv_kaiming_init, name="conv1",
        )(x)
        out = norm("bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            kernel_init=conv_kaiming_init, name="conv2",
        )(out)
        out = norm("bn2")(out, train)
        out = nn.relu(out)
        out = nn.Conv(
            out_features, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=conv_kaiming_init, name="conv3",
        )(out)
        out = norm("bn3")(out, train)

        if self.strides != 1 or identity.shape[-1] != out_features:
            identity = nn.Conv(
                out_features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, kernel_init=conv_kaiming_init,
                name="downsample_conv",
            )(identity)
            identity = norm("downsample_bn")(identity, train)

        return nn.relu(out + identity)


class PackedBasicBlock(nn.Module):
    """Lane-packed twin of a stride-1, channel-preserving BasicBlock
    (layer1 of ResNet-18/34: C=64 at quarter resolution runs at ~50% lane
    waste unpacked — see models/packed_conv.py). Identical math and
    parameter/stat tree (conv1/conv2 kernels; bn1/bn2 -> bn children)."""

    features: int
    pack: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        from .packed_conv import PackedBatchNorm, PackedConvSame

        class _NormWrap(nn.Module):
            features: int
            pack: int
            axis_name: Optional[str]
            dtype: Any

            @nn.compact
            def __call__(self, x, train):
                return PackedBatchNorm(
                    self.features, self.pack, axis_name=self.axis_name
                    if train else None, dtype=self.dtype, name="bn",
                )(x, train)

        conv = lambda name: PackedConvSame(
            self.features, self.features, 3, 1, self.pack, self.dtype,
            name=name,
        )
        norm = lambda name: _NormWrap(
            self.features, self.pack, self.axis_name, self.dtype, name=name
        )
        identity = x
        out = nn.relu(norm("bn1")(conv("conv1")(x), train))
        out = norm("bn2")(conv("conv2")(out), train)
        return nn.relu(out + identity)


class PackedBottleneck(nn.Module):
    """Lane-packed twin of a stride-1 torchvision Bottleneck (layer1 of
    ResNet-50/101/152: the 1x1 convs run at C=64 — half the 128 lanes —
    over quarter resolution). Identical math and parameter/stat tree
    (conv1..conv3, bn1..bn3, downsample_conv/downsample_bn)."""

    features: int  # bottleneck width; output is 4x
    in_features: int
    pack: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        from .packed_conv import PackedBatchNorm, PackedConvSame

        class _NormWrap(nn.Module):
            features: int
            pack: int
            axis_name: Optional[Any]
            dtype: Any

            @nn.compact
            def __call__(self, x, train):
                return PackedBatchNorm(
                    self.features, self.pack, axis_name=self.axis_name
                    if train else None, dtype=self.dtype, name="bn",
                )(x, train)

        p = self.pack
        f, out_f = self.features, self.features * 4
        norm = lambda feats, name: _NormWrap(
            feats, p, self.axis_name, self.dtype, name=name
        )
        conv = lambda feats, in_f, k, name: PackedConvSame(
            feats, in_f, k, 1, p, self.dtype, name=name
        )

        identity = x
        out = nn.relu(norm(f, "bn1")(conv(f, self.in_features, 1, "conv1")(x), train))
        out = nn.relu(norm(f, "bn2")(conv(f, f, 3, "conv2")(out), train))
        out = norm(out_f, "bn3")(conv(out_f, f, 1, "conv3")(out), train)
        if self.in_features != out_f:
            identity = norm(out_f, "downsample_bn")(
                conv(out_f, self.in_features, 1, "downsample_conv")(x), train
            )
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """5-stage feature pyramid: [relu(bn(conv1)), layer1..layer4].

    Returns features at strides 2, 4, 8, 16, 32 with channels
    ``encoder_channels(num_layers)``.

    ``packed=True`` (default): layer1 of the basic-block depths runs
    lane-packed (2 W-pixels folded into channels — exact same math, same
    parameter tree; models/packed_conv.py) when the width allows it.
    """

    num_layers: int = 18
    num_input_images: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    packed: bool = True
    # Space-to-depth stem: the 7x7/2 conv1 becomes a 4x4/1 conv on the
    # s2d-2 grid with 4x the input channels. ``stem_pack`` additionally
    # lane-packs P s2d cells into channels. Exact same math/params either
    # way (tested), but MEASURED SLOWER on v5e both times it was tried:
    # P=8 (round 3: x8-FLOP dense expansion; full step 120 -> 140 ms) and
    # P=1 (round 4: pure s2d, x1.3 FLOPs for x4 input lanes — pose-only
    # 15.5 -> 19.8, disp-only 34.5 -> 38.5, full step 96.9 -> 105.3
    # ms/step; the s2d reshape/layout traffic outweighs conv1's lane
    # waste, which XLA's native path evidently handles well). Kept as a
    # documented negative result; enable to re-measure on new hardware.
    packed_stem: bool = False
    stem_pack: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Sequence[jax.Array]:
        if self.num_layers not in STAGE_BLOCKS:
            raise ValueError(f"unsupported num_layers: {self.num_layers}")
        blocks = STAGE_BLOCKS[self.num_layers]
        block_cls = Bottleneck if BOTTLENECK[self.num_layers] else BasicBlock

        from .packed_conv import pack_w, unpack_w

        b, h, w, c_in = x.shape
        x = x.astype(self.dtype)
        # Lane-packed stem: the 7x7/2 conv at C_in=3/6 plus the maxpool run
        # at a few percent lane utilization unpacked. space-to-depth-2 +
        # 8-pixel W-packing makes conv1 a dense [4,3,P*4C,P*64] conv with
        # full lanes; BN/relu/maxpool stay packed. Exact same math/params.
        p0 = self.stem_pack
        stem_packed = (
            self.packed
            and self.packed_stem
            and h % 4 == 0
            and w % (2 * max(p0, 2)) == 0
            and w // (2 * p0) >= 2
        )
        if stem_packed:
            from .packed_conv import (
                max_pool3x3s2_packed, space_to_depth2,
            )

            x2p = pack_w(space_to_depth2(x), p0)
            xs = _StemConv(64, c_in, p0, self.dtype, name="conv1")(x2p)
            xs = _StemNorm(64, p0, self.axis_name, self.dtype, name="bn1")(
                xs, train
            )
            feat0_p = nn.relu(xs)
            feat0 = unpack_w(feat0_p, p0, 64)
            if p0 >= 2:
                x, p_cur = max_pool3x3s2_packed(feat0_p, p0, 64)
            else:
                x = _max_pool3x3s2(feat0)
                p_cur = 1
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                use_bias=False, dtype=self.dtype,
                kernel_init=conv_kaiming_init, name="conv1",
            )(x)
            x = _Norm(self.axis_name, self.dtype, name="bn1")(x, train)
            feat0 = nn.relu(x)
            # NOTE: routing this maxpool through max_pool3x3s2_packed was
            # measured SLOWER (disp 34.5 -> 40.2, pose 15.8 -> 23.6
            # ms/step on v5e): the packed shifted-view maximum's lane-dim
            # concats cost more than reduce_window's half-empty lanes.
            # The packed maxpool remains in use where it is structurally
            # required (the optional packed stem).
            x = _max_pool3x3s2(feat0)
            p_cur = 1

        features = [feat0]
        widths = (64, 128, 256, 512)
        pool_w = (w // 4) if stem_packed else x.shape[2]
        pack_layer1 = (
            self.packed
            and not BOTTLENECK[self.num_layers]
            and pool_w % 2 == 0
        )
        pack_layer1_bneck = (
            self.packed
            and BOTTLENECK[self.num_layers]
            and pool_w % 2 == 0
        )
        for stage, (width, n_blocks) in enumerate(zip(widths, blocks)):
            if stage == 0 and pack_layer1_bneck:
                # Bottleneck layer1 (r50/101/152): 1x1 convs at C=64 run
                # at half lane width over quarter resolution — same
                # lane-starved regime the basic-block packing fixes.
                if p_cur != 2:
                    xp = pack_w(unpack_w(x, p_cur, 64), 2) if p_cur != 1 \
                        else pack_w(x, 2)
                else:
                    xp = x
                in_f = 64
                for i in range(n_blocks):
                    xp = PackedBottleneck(
                        features=width, in_features=in_f, pack=2,
                        axis_name=self.axis_name, dtype=self.dtype,
                        name=f"layer1_{i}",
                    )(xp, train)
                    in_f = width * 4
                x = unpack_w(xp, 2, width * 4)
                features.append(x)
                continue
            if stage == 0 and pack_layer1:
                if p_cur != 2:  # pure reshape between pack factors
                    xp = pack_w(unpack_w(x, p_cur, 64), 2) if p_cur != 1 \
                        else pack_w(x, 2)
                else:
                    xp = x
                for i in range(n_blocks):
                    xp = PackedBasicBlock(
                        features=width, pack=2, axis_name=self.axis_name,
                        dtype=self.dtype, name=f"layer1_{i}",
                    )(xp, train)
                x = unpack_w(xp, 2, width)
                features.append(x)
                continue
            if stage == 0 and p_cur != 1:
                x = unpack_w(x, p_cur, 64)
            for i in range(n_blocks):
                strides = 2 if (stage > 0 and i == 0) else 1
                x = block_cls(
                    features=width,
                    strides=strides,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train)
            features.append(x)

        return features


def _max_pool3x3s2(x: jax.Array, shifted: bool = False) -> jax.Array:
    """torch MaxPool2d(3, stride 2, pad 1) via reduce_window's built-in
    padding (init value = -inf, so the pad IS -inf padding). An explicit
    jnp.pad(-inf) + VALID pool is the same math but materializes the
    padded stem tensor (~330 MB bf16 at the canonical config) and pays a
    pad-transpose in the backward pass — both visible in the compiled
    HLO's top ops.

    ``shifted=True`` is a KEPT MEASURED-NEGATIVE alternative: a separable
    shifted-slice maximum tree whose backward is plain fused selects
    instead of reduce_window's ``select-and-scatter`` (~8 ESTIMATED
    ms/step in the compiled production step — the HLO cost model's
    largest non-conv backward op). Measured on v5e it is far SLOWER
    (disp-only 34.2 -> 40.4, pose-only 14.4 -> 22.7, full production
    step 81.1 -> 96.8 ms): the -inf row pad plus six strided slices cost
    more than select-and-scatter actually runs, the third case this round
    where estimated_cycles mis-ranked a memory-layout op. It also SPLITS
    tie cotangents across equal window elements (post-relu zero windows)
    where torch and select-and-scatter route to the first — a gradient
    semantics deviation (tests/test_packed_decoder.py::
    test_maxpool_shifted_matches_reduce_window documents both)."""
    if not shifted:
        # nn.max_pool routes to reduce_window_max (which has the proper
        # reverse-mode rule for bf16; calling lax.reduce_window with a
        # generic lax.max computation misses that specialization and
        # fails to differentiate).
        return nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    # Row max first, on stride-2 rows only (3x less work than max-all-rows)
    rows = jnp.maximum(
        jnp.maximum(xp[:, 0:-2:2], xp[:, 1:-1:2]), xp[:, 2::2]
    )
    out = jnp.maximum(
        jnp.maximum(rows[:, :, 0:-2:2], rows[:, :, 1:-1:2]),
        rows[:, :, 2::2],
    )
    return out


class _StemConv(nn.Module):
    """conv1's packed twin: param tree = encoder/conv1/kernel unchanged."""

    features: int
    in_ch: int
    pack: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x2p: jax.Array) -> jax.Array:
        from .packed_conv import expand_stem_kernel

        kernel = self.param(
            "kernel", conv_kaiming_init,
            (7, 7, self.in_ch, self.features), jnp.float32,
        )
        dense, pad_groups = expand_stem_kernel(
            kernel.astype(self.dtype), self.pack
        )
        # group-tap range is asymmetric in general (e.g. pack=1: taps at
        # offsets -2..1): left pad = -d_min (pad_groups), right = d_max.
        # Zero padding rides the conv's native window padding (no
        # materialized padded activation, no pad-transpose in backward).
        pad_right = dense.shape[1] - 1 - pad_groups
        return jax.lax.conv_general_dilated(
            x2p.astype(self.dtype), dense, window_strides=(1, 1),
            padding=((2, 1), (pad_groups, pad_right)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class _StemNorm(nn.Module):
    """bn1's packed twin: tree = encoder/bn1/bn/{scale,bias,mean,var}."""

    channels: int
    pack: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        from .packed_conv import PackedBatchNorm

        return PackedBatchNorm(
            self.channels, self.pack,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype, name="bn",
        )(x, train)
