"""6-DoF relative pose network.

Behavioral parity target: /root/reference/models/PoseResNet.py — a 2-image
ResNet encoder (6-channel input) followed by a small conv head: 1x1 squeeze
to 256 + ReLU, two 3x3 convs + ReLU, 1x1 to 6 channels, global mean pooling,
scaled by 0.01 (PoseResNet.py:35-51). Output ``[B, 6]`` = (tx, ty, tz, rx,
ry, rz), the target->source transform consumed by pose_vec2mat.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .disp_net import conv_torch_default_init
from .resnet import ResNetEncoder


class PoseDecoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array) -> jax.Array:
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding=((k // 2, k // 2), (k // 2, k // 2)),
            dtype=self.dtype, kernel_init=conv_torch_default_init, name=name,
        )
        x = nn.relu(conv(256, 1, "squeeze")(feat))
        x = nn.relu(conv(256, 3, "pose_0")(x))
        x = nn.relu(conv(256, 3, "pose_1")(x))
        x = conv(6, 1, "pose_2")(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return 0.01 * x.reshape(-1, 6)


class PoseNet(nn.Module):
    """Relative pose from a concatenated image pair."""

    num_layers: int = 18
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    packed_stem: bool = False
    stem_pack: int = 8

    @nn.compact
    def __call__(
        self, img1: jax.Array, img2: jax.Array, train: bool = False
    ) -> jax.Array:
        x = jnp.concatenate([img1, img2], axis=-1)
        features = ResNetEncoder(
            num_layers=self.num_layers,
            num_input_images=2,
            axis_name=self.axis_name,
            dtype=self.dtype,
            packed_stem=self.packed_stem,
            stem_pack=self.stem_pack,
            name="encoder",
        )(x, train)
        return PoseDecoder(dtype=self.dtype, name="decoder")(features[-1])
