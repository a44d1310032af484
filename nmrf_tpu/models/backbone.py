"""Feature extraction backbones.

ResNet-ish CNN backbone: behavioral parity target reference
``nmrf/models/backbone.py:16-98`` (``ResidualBlock``, ``Backbone``).
Outputs a [1/4-res, 1/8-res] feature pyramid (channel-last).

The Swin-T + DeformNeck backbone lives in ``swin.py`` / ``adaptor.py``.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, instance_norm_2d


def _in(x, dtype):
    """float32 instance norm, back to compute dtype (the norm upcasts
    lazily — pre-upcasting here would materialize an f32 activation)."""
    y = instance_norm_2d(x)
    return y.astype(dtype) if dtype is not None else y


class ResidualBlock(nn.Module):
    """conv3x3(stride)-IN-relu -> conv3x3-IN-relu -> +identity -> relu
    (reference ``backbone.py:16-45``)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_planes = x.shape[-1]
        identity = x
        y = Conv(self.planes, (3, 3), strides=self.stride,
                 kernel_dilation=self.dilation, padding=self.dilation,
                 use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(_in(y, self.dtype))
        y = Conv(self.planes, (3, 3), kernel_dilation=self.dilation,
                 padding=self.dilation, use_bias=False, dtype=self.dtype,
                 name="conv2")(y)
        y = jax.nn.relu(_in(y, self.dtype))
        if not (self.stride == 1 and in_planes == self.planes):
            identity = Conv(self.planes, (1, 1), strides=self.stride,
                            dtype=self.dtype, name="downsample")(identity)
            identity = _in(identity, self.dtype)
        return jax.nn.relu(y + identity)


class Backbone(nn.Module):
    """CNN backbone (reference ``backbone.py:48-98``).

    Input [B, H, W, 3] in 0..255; normalized to [-1, 1] internally.
    Returns [1/4-res [B,H/4,W/4,out], 1/8-res avg-pooled] (high to low).
    """

    output_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # bf16 path: normalize in bf16 — the [H, W, 3] image lane-pads
        # 3 -> 128 (42x HBM bloat), so the f32 normalize + separate cast
        # cost two full-res passes (profiled r4); f32 path unchanged
        if self.dtype is not None:
            x = x.astype(self.dtype) * jnp.asarray(2.0 / 255.0, self.dtype) \
                - jnp.asarray(1.0, self.dtype)
        else:
            x = 2.0 * (x / 255.0) - 1.0
        x = Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                 dtype=self.dtype, name="conv1")(x)
        x = jax.nn.relu(_in(x, self.dtype))
        # layer1: 64 @ 1/2
        x = ResidualBlock(64, dtype=self.dtype, name="layer1_0")(x)
        x = ResidualBlock(64, dtype=self.dtype, name="layer1_1")(x)
        # layer2: 96 @ 1/4
        x = ResidualBlock(96, stride=2, dtype=self.dtype, name="layer2_0")(x)
        x = ResidualBlock(96, dtype=self.dtype, name="layer2_1")(x)
        # layer3: 128 @ 1/4
        x = ResidualBlock(128, dtype=self.dtype, name="layer3_0")(x)
        x = ResidualBlock(128, dtype=self.dtype, name="layer3_1")(x)
        x = Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)
        pooled = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return [x, pooled]  # high to low res
