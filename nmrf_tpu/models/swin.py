"""Swin-T backbone (channel-last flax).

Behavioral parity target: reference ``nmrf/models/swin.py`` (standard Swin:
patch-embed 4, depths (2,2,6,2), heads (3,6,12,24), window 7, relative
position bias, -100.0 shifted-window mask fill, no output norms); outputs a
{p0..p3} pyramid at strides 4/8/16/32.
"""

from functools import lru_cache
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, Dense, DropPath, Mlp, gelu_exact, trunc_normal_init
from .nmp import _relative_position_index


class SwinLayerNorm(nn.LayerNorm):
    epsilon: float = 1e-5
    dtype: Any = jnp.float32  # norms always compute/return float32


def _cast(x, dtype):
    return x.astype(dtype) if dtype is not None else x


@lru_cache(maxsize=32)
def _swin_shift_mask(Hp: int, Wp: int, window_size: int, shift_size: int) -> np.ndarray:
    """Shifted-window mask with -100.0 fill (reference swin.py:421-450)."""
    img_mask = np.zeros((Hp, Wp))
    h_slices = (slice(0, -window_size), slice(-window_size, -shift_size),
                slice(-shift_size, None))
    w_slices = (slice(0, -window_size), slice(-window_size, -shift_size),
                slice(-shift_size, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[hs, ws] = cnt
            cnt += 1
    mw = img_mask.reshape(Hp // window_size, window_size,
                          Wp // window_size, window_size)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Standard Swin W-MSA with relative position bias
    (reference swin.py:77-176)."""

    dim: int
    window_size: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        """x: [B_, N, C] windows; mask: [nW, N, N] or None."""
        B_, N, C = x.shape
        h = self.num_heads
        hd = C // h
        scale = hd ** -0.5
        qkv = Dense(3 * C, dtype=self.dtype, name="qkv")(x).reshape(B_, N, 3, h, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhic,bhjc->bhij", q, k)

        table = self.param("relative_position_bias_table", trunc_normal_init,
                           ((2 * self.window_size - 1) ** 2, h))
        idx = _relative_position_index(self.window_size, self.window_size)
        bias = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn.astype(jnp.float32) + bias[None]  # softmax path in f32

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.reshape(B_, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bhij,bhjc->bhic", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        out = Dense(C, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=deterministic)(out)


class SwinBlock(nn.Module):
    """Swin transformer block (reference swin.py:178-305)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, H, W, C]."""
        B, H, W, C = x.shape
        ws = self.window_size
        shortcut = x
        x = _cast(SwinLayerNorm(name="norm1")(x), self.dtype)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if self.shift_size > 0:
            x = jnp.roll(x, (-self.shift_size, -self.shift_size), axis=(1, 2))
            mask = jnp.asarray(_swin_shift_mask(Hp, Wp, ws, self.shift_size))
        else:
            mask = None

        xw = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
        attn = WindowAttention(self.dim, ws, self.num_heads, self.attn_drop,
                               self.drop, dtype=self.dtype,
                               name="attn")(xw, mask, deterministic)
        x = attn.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)

        if self.shift_size > 0:
            x = jnp.roll(x, (self.shift_size, self.shift_size), axis=(1, 2))
        x = x[:, :H, :W]

        drop_path = DropPath(self.drop_path)
        x = shortcut + drop_path(x, deterministic)
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, act=gelu_exact,
                  drop=self.drop, dtype=self.dtype, name="mlp")
        x = x + drop_path(
            mlp(_cast(SwinLayerNorm(name="norm2")(x), self.dtype), deterministic),
            deterministic)
        return x


class PatchMerging(nn.Module):
    """2x2 patch merging (reference swin.py:308-345)."""

    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = _cast(SwinLayerNorm(name="norm")(x), self.dtype)
        return Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-T pyramid backbone (reference swin.py:496-683).

    Input [B, H, W, 3] (already normalized).  Returns dict p0..p3 of
    channel-last features at strides 4/8/16/32.
    """

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # patch embed: conv 4x4 stride 4 (reference swin.py:474-493)
        x = _cast(x, self.dtype)
        x = Conv(self.embed_dim, (4, 4), strides=4, dtype=self.dtype,
                 kernel_init=trunc_normal_init, name="patch_embed_proj")(x)
        if self.patch_norm:
            x = _cast(SwinLayerNorm(name="patch_embed_norm")(x), self.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)

        total_depth = sum(self.depths)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, total_depth)]

        outs = {}
        dim = self.embed_dim
        blk_idx = 0
        for i, depth in enumerate(self.depths):
            for d in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[i], self.window_size,
                    0 if d % 2 == 0 else self.window_size // 2,
                    self.mlp_ratio, self.drop_rate, self.attn_drop_rate,
                    dpr[blk_idx], dtype=self.dtype,
                    name=f"layers_{i}_blocks_{d}")(x, deterministic)
                blk_idx += 1
            if i in self.out_indices:
                outs[f"p{i}"] = x
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"layers_{i}_downsample")(x)
                dim *= 2
        return outs
