"""Monocular disparity network: ResNet encoder + multi-scale skip decoder.

Behavioral parity target: /root/reference/models/DispResNet.py —
decoder channels [16, 32, 64, 128, 256], reflection-padded 3x3 convs + ELU,
nearest x2 upsampling with encoder skips, and per-scale disparity heads
``disp = 10 * sigmoid(x) + 0.01`` (DispResNet.py:53-54,98). Training returns
4 scales (full, 1/2, 1/4, 1/8 resolution, fine-to-coarse); eval uses scale 0.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNetEncoder, encoder_channels

# torch's default Conv2d init: kaiming_uniform(a=sqrt(5)) == uniform with
# bound sqrt(1/fan_in); variance_scaling(1/3, fan_in, uniform) reproduces it.
conv_torch_default_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

ALPHA = 10.0
BETA = 0.01
DEC_CHANNELS = (16, 32, 64, 128, 256)


class ReflectConv3x3(nn.Module):
    """Reflection-pad-1 then 3x3 valid conv (reference: DispResNet.py:27-42)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.reflect_pad import reflect_pad1_hw4

        x = reflect_pad1_hw4(x)
        return nn.Conv(
            self.features, (3, 3), padding="VALID", dtype=self.dtype,
            kernel_init=conv_torch_default_init, name="conv",
        )(x)


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor x2 upsample via repeat (exact, layout-friendly)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class DepthDecoder(nn.Module):
    """Skip-connected decoder emitting sigmoid disparity at 4 scales.

    ``packed=True`` (default) runs every stage lane-packed
    (models/packed_conv.py): P consecutive W-pixels fold into the channel
    dim so the 16-64-channel full/half-resolution stages — which dominated
    the compiled train step at ~12% TPU lane utilization — execute with
    >=128 effective channels. Identical math (zero-structured dense
    kernels built from the SAME parameters; exact nearest upsample;
    reflect padding reproduced at group boundaries) and an identical
    parameter tree, so checkpoints/converters are unaffected. Falls back
    to the plain path when a stage's width is not divisible by its pack
    factor (non-canonical input sizes).
    """

    scales: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Any = jnp.float32
    packed: bool = True
    # Optional per-stage override of the pack factors (stage 0..4);
    # None = _stage_pack defaults. Measurement knob: r50's skip concats
    # are 4x wider than r18's, which shifts where packing pays.
    pack_caps: Optional[Tuple[int, ...]] = None
    # Lane-full (>=128-ch) skips can bypass W-packing via the linearity
    # split (PackedReflectConv3x3.wide) — only meaningful on bottleneck
    # encoders (r18/34 skips are all <128-ch). MEASURED NEUTRAL on v5e
    # (r50 production step 104.2 -> 104.0 ms; disp-only 56.5 -> 56.4):
    # the P x MAC saving on the 256-ch stage-2 skip is offset by the
    # second conv dispatch + add pass. Kept as an opt-in measurement
    # knob; default off preserves the single-contraction packed conv
    # (bit-exact vs the unpacked path).
    split_wide_skips: bool = False

    def _pack(self, i: int) -> int:
        if self.pack_caps is not None:
            return self.pack_caps[i]
        return _stage_pack(i)

    def _can_pack(self, features) -> bool:
        w = features[0].shape[2] * 2  # full input width
        for i in range(5):
            p = self._pack(i)
            if (w // (2**i)) % (2 * p):
                return False
        return True

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]) -> Tuple[jax.Array, ...]:
        if self.packed and self._can_pack(features):
            return self._packed_call(features)

        def conv_block(x, f, name):
            return nn.elu(ReflectConv3x3(f, self.dtype, name=name)(x))

        outputs = {}
        x = features[-1]
        for i in range(4, -1, -1):
            x = conv_block(x, DEC_CHANNELS[i], f"upconv_{i}_0")
            x = upsample2x(x)
            if i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = conv_block(x, DEC_CHANNELS[i], f"upconv_{i}_1")
            if i in self.scales:
                disp = ReflectConv3x3(1, self.dtype, name=f"dispconv_{i}")(x)
                outputs[i] = ALPHA * nn.sigmoid(disp.astype(jnp.float32)) + BETA

        return tuple(outputs[s] for s in sorted(outputs))

    def _packed_call(self, features) -> Tuple[jax.Array, ...]:
        from .packed_conv import (
            PackedConvBlock, pack_w, unpack_w, upsample2x_packed,
        )

        outputs = {}
        x = features[-1]
        c = x.shape[-1]
        p = 1  # features[-1] has >=128 channels on every ResNet depth

        def repack(x, p_from, p_to, c):
            # pure reshape: the flat (W-major, C-minor) order is identical
            # for every pack factor, so XLA bitcasts this.
            return pack_w(unpack_w(x, p_from, c), p_to)

        for i in range(4, -1, -1):
            f = DEC_CHANNELS[i]
            pi = self._pack(i)
            x = repack(x, p, pi, c)
            p = pi
            x = nn.elu(
                PackedConvBlock(f, (c,), p, self.dtype,
                                name=f"upconv_{i}_0")([x])
            )
            c = f
            x, p = upsample2x_packed(x, p, c)
            x = repack(x, p, pi, c)
            p = pi
            segs, seg_c, seg_wide = [x], [c], [False]
            if i > 0:
                skip = features[i - 1]
                # A skip that already fills the 128 lanes gains nothing
                # from W-packing but pays P x the MACs in the expanded
                # dense kernel (ResNet-50+: stage-2 skip is 256-ch).
                # Run it as a native-layout conv branch instead
                # (linearity split, see PackedReflectConv3x3).
                wide = self.split_wide_skips and p > 1 and \
                    skip.shape[-1] >= 128
                segs.append(skip if wide else pack_w(skip, p))
                seg_c.append(skip.shape[-1])
                seg_wide.append(wide)
            x = nn.elu(
                PackedConvBlock(f, tuple(seg_c), p, self.dtype,
                                wide=tuple(seg_wide),
                                name=f"upconv_{i}_1")(segs)
            )
            c = f
            if i in self.scales:
                disp = PackedConvBlock(1, (c,), p, self.dtype,
                                       name=f"dispconv_{i}")([x])
                disp = unpack_w(disp, p, 1)
                outputs[i] = ALPHA * nn.sigmoid(disp.astype(jnp.float32)) + BETA

        return tuple(outputs[s] for s in sorted(outputs))


def _stage_pack(i: int) -> int:
    """Pack factor per decoder stage: enough W-pixels that the stage's
    OUTPUT channels (DEC_CHANNELS[i]) fill the 128 lanes, capped at 8."""
    return max(1, min(8, 128 // DEC_CHANNELS[i]))


class DispNet(nn.Module):
    """Depth network. ``__call__`` returns the 4-scale disparity tuple
    (fine to coarse); use ``[0]`` for inference (reference: DispResNet.py:114-121).
    """

    num_layers: int = 18
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    packed_decoder: bool = True
    packed_stem: bool = False
    stem_pack: int = 8
    decoder_pack_caps: Optional[Tuple[int, ...]] = None
    decoder_split_wide_skips: bool = False  # see DepthDecoder

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, ...]:
        features = ResNetEncoder(
            num_layers=self.num_layers,
            num_input_images=1,
            axis_name=self.axis_name,
            dtype=self.dtype,
            packed_stem=self.packed_stem,
            stem_pack=self.stem_pack,
            name="encoder",
        )(x, train)
        return DepthDecoder(
            dtype=self.dtype, packed=self.packed_decoder,
            pack_caps=self.decoder_pack_caps,
            split_wide_skips=self.decoder_split_wide_skips, name="decoder"
        )(features)
