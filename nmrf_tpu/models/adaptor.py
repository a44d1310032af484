"""Swin backbone adaptor: DeformNeck with multi-scale deformable attention.

Behavioral parity targets:
  * ``MSDeformAttn`` module — reference ``ops/modules/ms_deform_attn.py:28-130``
    (directional bias init of sampling offsets, softmax attention weights,
    value/output projections, ratio-scaled value dim).
  * ``DeformNeck``/``Extractor``/``ConvFFN``/``ConvStem`` — reference
    ``nmrf/models/adaptor_modules.py`` (norm eps 1e-6 in extractors).
  * ``SwinAdaptor`` — reference ``nmrf/models/backbone.py:101-158``
    (ImageNet normalization — NOT in-place, fixing defect SURVEY.md §2.9.7).
"""

import math
from typing import Any, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.msda import ms_deform_attn, ms_deform_attn_taps
from .layers import Conv, Dense, DropPath, gelu_exact, instance_norm_2d
from .swin import SwinTransformer


class AdaptorLayerNorm(nn.LayerNorm):
    epsilon: float = 1e-6  # reference adaptor norm eps (adaptor_modules.py:74)
    dtype: Any = jnp.float32  # norms always compute/return float32


def _cast(x, dtype):
    return x.astype(dtype) if dtype is not None else x


def _offset_bias_init(n_heads, n_levels, n_points):
    """Directional grid bias (reference ms_deform_attn.py:64-75)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(n_heads, 1, 1, 2), (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


def _xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention wrapper around the core sampling op."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    ratio: float = 1.0
    dtype: Any = None
    # tap-based TPU fast path (ops/pallas/msda.py): active when > 0 AND the
    # queries form a regular grid of shape ``query_shape`` (the adaptor's
    # case).  Exact while learned offsets stay within tap_radius - 1 level
    # pixels; 0 selects the exact gather path.
    tap_radius: int = 0

    @nn.compact
    def __call__(self, query, reference_points, input_flatten,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 query_shape: Tuple[int, int] = None):
        """
        query: [B, Lq, C]; reference_points: [B, Lq, n_levels, 2] in [0,1];
        input_flatten: [B, S, C]; spatial_shapes: static [(H,W), ...].
        query_shape: static (Hq, Wq) when queries are a regular grid.
        """
        B, Lq, _ = query.shape
        S = input_flatten.shape[1]
        v_dim = int(self.d_model * self.ratio)

        value = Dense(v_dim, kernel_init=_xavier_uniform, dtype=self.dtype,
                      name="value_proj")(input_flatten)
        value = value.reshape(B, S, self.n_heads, v_dim // self.n_heads)

        offsets = Dense(self.n_heads * self.n_levels * self.n_points * 2,
                        kernel_init=nn.initializers.zeros,
                        bias_init=lambda k, s, d=jnp.float32: jnp.asarray(
                            _offset_bias_init(self.n_heads, self.n_levels, self.n_points), d),
                        name="sampling_offsets")(query.astype(jnp.float32))
        offsets = offsets.reshape(B, Lq, self.n_heads, self.n_levels, self.n_points, 2)

        weights = Dense(self.n_heads * self.n_levels * self.n_points,
                        kernel_init=nn.initializers.zeros,
                        name="attention_weights")(query.astype(jnp.float32))
        weights = jax.nn.softmax(
            weights.reshape(B, Lq, self.n_heads, self.n_levels * self.n_points), -1)
        weights = weights.reshape(B, Lq, self.n_heads, self.n_levels, self.n_points)

        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], jnp.float32)  # [L, 2] (x, y)
        locations = (reference_points[:, :, None, :, None, :]
                     + offsets / normalizer[None, None, None, :, None, :])

        use_taps = (self.tap_radius > 0 and query_shape is not None
                    and Lq == query_shape[0] * query_shape[1]
                    and all(query_shape[0] % h == 0 and query_shape[1] % w == 0
                            and query_shape[0] // h == query_shape[1] // w
                            for h, w in spatial_shapes))
        if use_taps:
            from ..ops.msda import tap_out_of_range_fraction

            # observability for the tap-radius exactness precondition:
            # fraction of samples whose contribution the tap kernel drops
            # (trained offsets are unconstrained — check converted
            # checkpoints with tools/check_tap_coverage.py).  sow is free
            # unless the caller requests the "intermediates" collection.
            self.sow("intermediates", "msda_tap_oob",
                     tap_out_of_range_fraction(
                         locations, spatial_shapes, tuple(query_shape),
                         self.tap_radius))
            out = ms_deform_attn_taps(value, spatial_shapes, locations,
                                      weights.astype(value.dtype),
                                      tuple(query_shape), self.tap_radius)
        else:
            out = ms_deform_attn(value, spatial_shapes, locations,
                                 weights.astype(value.dtype))
        return Dense(self.d_model, kernel_init=_xavier_uniform,
                     dtype=self.dtype, name="output_proj")(out)


class ConvFFN(nn.Module):
    """Linear -> depthwise conv -> GELU -> Linear (adaptor_modules.py:37-68)."""

    hidden: int
    out: int
    drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, H, W, deterministic: bool = True):
        B, N, C = x.shape
        x = Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        xs = x.reshape(B, H, W, self.hidden)
        kernel = self.param("dwconv_kernel", nn.initializers.variance_scaling(
            2.0, "fan_out", "truncated_normal"), (3, 3, 1, self.hidden))
        bias = self.param("dwconv_bias", nn.initializers.zeros, (self.hidden,))
        xs = jax.lax.conv_general_dilated(
            xs, _cast(kernel, self.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.hidden) + _cast(bias, self.dtype)
        x = xs.reshape(B, N, self.hidden)
        x = gelu_exact(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.drop, deterministic=deterministic)(x)


class Extractor(nn.Module):
    """Deformable cross-attention extractor block (adaptor_modules.py:71-105)."""

    dim: int
    num_heads: int = 8
    n_points: int = 4
    n_levels: int = 1
    deform_ratio: float = 1.0
    cffn_ratio: float = 0.25
    drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = None
    tap_radius: int = 0

    @nn.compact
    def __call__(self, query, reference_points, feat, spatial_shapes, H, W,
                 deterministic: bool = True):
        attn = MSDeformAttn(self.dim, self.n_levels, self.num_heads,
                            self.n_points, self.deform_ratio,
                            dtype=self.dtype, tap_radius=self.tap_radius,
                            name="attn")(
            _cast(AdaptorLayerNorm(name="query_norm")(query), self.dtype),
            reference_points,
            _cast(AdaptorLayerNorm(name="feat_norm")(feat), self.dtype),
            spatial_shapes, query_shape=(H, W))
        query = query + attn
        ffn = ConvFFN(int(self.dim * self.cffn_ratio), self.dim,
                      self.drop, dtype=self.dtype, name="ffn")
        dp = DropPath(self.drop_path)
        query = query + dp(
            ffn(_cast(AdaptorLayerNorm(name="ffn_norm")(query), self.dtype),
                H, W, deterministic),
            deterministic)
        return query


class ConvStem(nn.Module):
    """3-conv stem + maxpool to 1/4 res (adaptor_modules.py:108-142)."""

    inplanes: int = 64
    out_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = _cast(x, self.dtype)
        for i, stride in enumerate([2, 1, 1]):
            x = Conv(self.inplanes, (3, 3), strides=stride, padding=1,
                     use_bias=False, dtype=self.dtype, name=f"stem_{i}")(x)
            x = jax.nn.relu(_cast(instance_norm_2d(x), self.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = Conv(self.out_channels, (1, 1), dtype=self.dtype, name="fc")(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


def get_reference_points(spatial_shapes):
    """Normalized center-of-pixel reference grid (adaptor_modules.py:10-22)."""
    pts = []
    for H, W in spatial_shapes:
        ry, rx = np.meshgrid(np.linspace(0.5, H - 0.5, H) / H,
                             np.linspace(0.5, W - 0.5, W) / W, indexing="ij")
        pts.append(np.stack([rx.reshape(-1), ry.reshape(-1)], -1))
    return jnp.asarray(np.concatenate(pts, 0))[None, :, None]  # [1, S, 1, 2]


class DeformNeck(nn.Module):
    """ConvStem query + 4 per-level deformable extractors (adaptor_modules.py:145-188)."""

    dim: int
    in_channel_list: Sequence[int]
    num_heads: int = 8
    n_points: int = 4
    drop: float = 0.0
    drop_path: float = 0.0
    cffn_ratio: float = 0.25
    deform_ratio: float = 1.0
    dtype: Any = None
    tap_radius: int = 0

    @nn.compact
    def __call__(self, image, features: List[jnp.ndarray], deterministic: bool = True):
        """image: [B, H, W, 3]; features: [p0..p3] channel-last. -> [B, H/4, W/4, dim]"""
        B, H_img, W_img, _ = image.shape
        H, W = H_img // 4, W_img // 4
        c = ConvStem(64, self.dim, dtype=self.dtype, name="stem")(image)
        ref = get_reference_points([(H, W)])

        for idx, feat in enumerate(features):
            fb, fh, fw, fc = feat.shape
            flat = feat.reshape(fb, fh * fw, fc)
            flat = _cast(AdaptorLayerNorm(name=f"fcs_{idx}_norm")(flat), self.dtype)
            flat = Dense(self.dim, dtype=self.dtype, name=f"fcs_{idx}_linear")(flat)
            c = Extractor(self.dim, self.num_heads, self.n_points, 1,
                          self.deform_ratio, self.cffn_ratio, self.drop,
                          self.drop_path, dtype=self.dtype,
                          tap_radius=self.tap_radius,
                          name=f"extractors_{idx}")(
                c, ref, flat, [(fh, fw)], H, W, deterministic)
        return c.reshape(B, H, W, self.dim)


# ImageNet normalization constants (reference backbone.py:123-128)
_IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SwinAdaptor(nn.Module):
    """Swin-T + DeformNeck single-map backbone (reference backbone.py:101-158)."""

    out_channels: int
    drop_path_rate: float = 0.0
    dtype: Any = None
    tap_radius: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # out-of-place (defect §2.9.7 fixed).  On the bf16 path the
        # normalize runs in bf16: [H, W, 3] tensors lane-pad 3 -> 128 (42x
        # HBM bloat), so every full-res elementwise pass costs ~0.4 ms at
        # KITTI size — bf16 halves it and the downstream cast disappears
        # (profiled r4; the f32 parity path is unchanged).
        if self.dtype is not None:
            x = (x.astype(self.dtype) - _IMAGENET_MEAN.astype(self.dtype)) \
                * jnp.asarray(1.0 / _IMAGENET_STD, self.dtype)
        else:
            x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        outs = SwinTransformer(
            embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
            drop_path_rate=self.drop_path_rate, dtype=self.dtype,
            name="backbone")(x, deterministic)
        features = [outs[f"p{i}"] for i in range(4)]
        out = DeformNeck(self.out_channels, [96, 192, 384, 768],
                         drop_path=0.0, deform_ratio=0.5, dtype=self.dtype,
                         tap_radius=self.tap_radius, name="neck")(
            x, features, deterministic)
        pooled = nn.avg_pool(out, (2, 2), strides=(2, 2))
        return [out, pooled]
