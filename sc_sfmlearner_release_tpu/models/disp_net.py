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
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
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
    """Skip-connected decoder emitting sigmoid disparity at 4 scales."""

    scales: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]) -> Tuple[jax.Array, ...]:
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


class DispNet(nn.Module):
    """Depth network. ``__call__`` returns the 4-scale disparity tuple
    (fine to coarse); use ``[0]`` for inference (reference: DispResNet.py:114-121).
    """

    num_layers: int = 18
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, ...]:
        features = ResNetEncoder(
            num_layers=self.num_layers,
            num_input_images=1,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="encoder",
        )(x, train)
        return DepthDecoder(dtype=self.dtype, name="decoder")(features)
