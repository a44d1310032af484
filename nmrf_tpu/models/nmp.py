"""Neural Message Passing layers for NMRF.

TPU-first re-design of reference ``nmrf/models/NMP.py``:
  * Tokens are kept in spatial layout [B, H, W, N, C] (N = candidates);
    window partitioning is pure reshape/transpose (XLA-friendly, fuses away).
  * All attention masks are computed as static numpy constants at trace time
    (keyed on static shapes via lru_cache), not cached device buffers
    (reference ``NMP.py:764-779``).
  * Shifted windows use jnp.roll (global cyclic shift, exact reference
    semantics ``NMP.py:249-250,286-287``).

Behavioral parity targets are cited per class.
"""

import math
from functools import lru_cache
from typing import Any, Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.encodings import fourier_grid_embed
from .layers import Dense, DropPath, LayerNorm, Mlp, gelu_exact

NEG_INF = -1e9  # finite -inf stand-in; softmax-safe and grad-safe


# --------------------------------------------------------------------------- #
# Static attention masks (numpy, trace-time constants)
# --------------------------------------------------------------------------- #

@lru_cache(maxsize=64)
def window_attn_mask(window_size: Tuple[int, int, int]) -> np.ndarray:
    """Anti-same-pixel mask (reference ``gen_window_attn_mask`` NMP.py:195-208).

    Tokens are ordered (hs, ws, n).  Blocks attention between different
    candidates of the same pixel; self-attention stays allowed.
    Returns [T, T] with 0 / NEG_INF, T = wh*ww*n.
    """
    wh, ww, n = window_size
    idx = np.repeat(np.arange(wh * ww), n)
    same_pixel = idx[:, None] == idx[None, :]
    mask = np.where(same_pixel, NEG_INF, 0.0).astype(np.float32)
    np.fill_diagonal(mask, 0.0)
    return mask


@lru_cache(maxsize=64)
def shift_window_attn_mask(input_resolution: Tuple[int, int],
                           window_size: Tuple[int, int, int],
                           shift_size: int,
                           with_candidate_mask: bool = True) -> np.ndarray:
    """Swin shifted-window mask ⊗ anti-same-pixel mask
    (reference ``gen_shift_window_attn_mask`` NMP.py:210-239; the
    ``Refinement`` variant omits the candidate mask, NMP.py:801-826).

    Returns [num_windows, T, T].
    """
    H, W = input_resolution
    wh, ww, n = window_size
    img_mask = np.zeros((H, W))
    h_slices = (slice(0, -wh), slice(-wh, -shift_size), slice(-shift_size, None))
    w_slices = (slice(0, -ww), slice(-ww, -shift_size), slice(-shift_size, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[hs, ws] = cnt
            cnt += 1
    mw = img_mask.reshape(H // wh, wh, W // ww, ww).transpose(0, 2, 1, 3).reshape(-1, wh * ww)
    diff = mw[:, None, :] - mw[:, :, None]
    attn_mask = np.where(diff != 0, NEG_INF, 0.0).astype(np.float32)
    attn_mask = np.repeat(np.repeat(attn_mask, n, axis=1), n, axis=2)
    if with_candidate_mask:
        attn_mask = attn_mask + window_attn_mask(window_size)[None]
    return attn_mask


# --------------------------------------------------------------------------- #
# Attention modules
# --------------------------------------------------------------------------- #

class BasicAttention(nn.Module):
    """Self-edge attention over the N candidates of one pixel
    (reference ``BasicAttention`` NMP.py:70-139).
    """

    dim: int
    num_heads: int = 8
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    normalize_before: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, label_rep, abs_encoding, deterministic: bool = True):
        """label_rep: [M, N, C]; abs_encoding: [M, N, C']."""
        h = self.num_heads
        hd = self.dim // h
        scale = hd ** -0.5
        norm1 = LayerNorm(dtype=jnp.float32, name="norm1")

        shortcut = label_rep
        x = norm1(label_rep) if self.normalize_before else label_rep
        if self.dtype is not None:
            abs_encoding = abs_encoding.astype(self.dtype)
        qk_in = jnp.concatenate([x.astype(abs_encoding.dtype), abs_encoding], axis=-1)
        q = Dense(self.dim, dtype=self.dtype, name="q")(qk_in)
        k = Dense(self.dim, dtype=self.dtype, name="k")(qk_in)
        v = Dense(self.dim, dtype=self.dtype, name="v")(x)

        M, N = x.shape[0], x.shape[1]
        if N <= 4:
            # TPU small-N path: with N candidates per pixel the head-split
            # einsums become [N, N] x [N, hd] batched matmuls over M — the
            # MXU pads N -> 8 and hd -> 128 lanes, and the [M, h, i, j]
            # intermediates run every elementwise op at 2/128 lane
            # utilization (profiled ~2.5 ms/frame at KITTI resolution).
            # Unroll the N^2 token pairs instead and keep the full C=h*hd
            # channel axis minor: each dot product is one fused full-lane
            # pass (multiply + per-head segment-sum), and the weighted sum
            # broadcasts the [M, h] weights back across hd lanes.
            f32 = jnp.float32
            logits = jnp.stack([
                jnp.stack([
                    (q[:, i].astype(f32) * k[:, j].astype(f32))
                    .reshape(M, h, hd).sum(-1) * scale
                    for j in range(N)], axis=-1)
                for i in range(N)], axis=-2)  # [M, h, N(i), N(j)]
            attn = jax.nn.softmax(logits, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
            aw = attn.astype(v.dtype)
            out = jnp.stack([
                sum(jnp.broadcast_to(aw[:, :, i, j, None], (M, h, hd))
                    .reshape(M, self.dim) * v[:, j]
                    for j in range(N))
                for i in range(N)], axis=1)  # [M, N, C]
        else:
            def heads(t):
                return t.reshape(*t.shape[:-1], h, hd)

            qh, kh, vh = heads(q), heads(k), heads(v)  # [M,N,h,d]
            attn = jnp.einsum("mihd,mjhd->mhij", qh, kh,
                              preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
            out = jnp.einsum("mhij,mjhd->mihd", attn.astype(vh.dtype), vh)
        out = out.reshape(*label_rep.shape[:-1], self.dim)
        out = Dense(self.dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        x = shortcut + out
        if not self.normalize_before:
            x = norm1(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)
        return x


class WindowAttention(nn.Module):
    """Windowed positional-sensitive attention over (wh, ww, N) token blocks
    (reference ``WindowAttention`` NMP.py:142-292): learnable relative-position
    table of width 3*dim contributing q/k/v positional terms.
    """

    dim: int
    window_size: Tuple[int, int]
    shift_size: int
    num_heads: int
    attn_drop: float = 0.0
    dtype: Any = None
    # fused Pallas attention kernel (ops/pallas/attention.py); falls
    # back to the XLA path when attention dropout is active
    use_pallas: bool = False
    pallas_interpret: bool = False
    # static mirror of the stage mask semantics for the fused path: block
    # different candidates of the same pixel (Inference True, Refinement
    # False — reference gen_window_attn_mask, NMP.py:195-208)
    candidate_mask: bool = False
    # mesh axis name when H is sharded under shard_map: the shifted-window
    # cyclic roll becomes a ppermute ring exchange (parallel/spatial.py)
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, qkv, attn_mask, deterministic: bool = True, shift=None):
        """qkv: [B, H, W, N, 3C]; attn_mask: [nW, T, T] or None;
        shift: optional traced shift override (for nn.scan layer stacks).
        -> [B, H, W, N, C]"""
        B, H, W, N, _ = qkv.shape
        wh, ww = self.window_size
        h = self.num_heads
        hd = self.dim // h
        scale = hd ** -0.5

        table = self.param(
            "relative_position_enc_table",
            nn.initializers.zeros,
            ((2 * wh - 1) * (2 * ww - 1), self.dim * 3),
        )
        rel_index = _relative_position_index(wh, ww)  # np [wh*ww, wh*ww]

        if shift is None:
            shift = self.shift_size
        static_zero = isinstance(shift, int) and shift == 0
        if not static_zero:
            if self.spatial_axis is not None:
                # Per-layer shifts in the scan stack are 0 or wh//2: roll by
                # the static wh//2 (H-roll = ppermute ring, W-roll local)
                # and select by the traced per-layer shift.
                from ..parallel.spatial import global_roll_h

                s_ = wh // 2
                rolled = global_roll_h(qkv, -s_, self.spatial_axis, h_axis=1)
                rolled = jnp.roll(rolled, -s_, axis=2)
                qkv = jnp.where(shift > 0, rolled, qkv)
            else:
                # (r4 probe: a lax.cond skipping the roll for shift=0
                # layers measured NEUTRAL-to-worse — the conditional breaks
                # fusion and forces operand materialization.  r5 probe:
                # STATIC roll + jnp.where select — on paper fewer passes
                # than _roll_dynamic's pad+DS+max — measured WORSE on the
                # swin frame (51.9 -> 53.1 ms) and neutral on the train
                # step (832 -> 827): every layer pays the roll+select
                # passes while XLA fuses the dynamic form well.  Both
                # reverted; the traced roll stands.)
                qkv = jnp.roll(qkv, (-shift, -shift), axis=(1, 2))

        # window partition: [B*nW, h, T, 3hd] with token order (hs, ws, n)
        nwh, nww = H // wh, W // ww
        x = qkv.reshape(B, nwh, wh, nww, ww, N, 3, h, hd)
        x = x.transpose(6, 0, 1, 3, 7, 2, 4, 5, 8)  # [3, B, nwh, nww, h, wh, ww, N, hd]
        x = x.reshape(3, B * nwh * nww, h, wh * ww * N, hd)
        q, k, v = x[0], x[1], x[2]

        # Positional contributions.  The tables index PIXELS (wh*ww), not
        # tokens: the candidate axis N never enters them (reference repeats
        # the table over N, NMP.py:259).  Computing the positional terms at
        # pixel granularity and broadcasting over N does N^2 = 16x less work
        # and avoids materializing/permuting [T, T, h, c] tensors.
        P = wh * ww
        rpe = table[rel_index.reshape(-1)].reshape(P, P, h, 3 * hd)
        if self.dtype is not None:
            rpe = rpe.astype(self.dtype)
        q_embed, k_embed, v_embed = jnp.split(rpe, 3, axis=-1)

        Bw = q.shape[0]
        use_pallas = self.use_pallas and (
            self.attn_drop == 0.0 or deterministic)
        if use_pallas:
            # window-native fused path (ops/pallas/attention.py): the
            # candidate / cross-window / shifted-region masks are computed
            # IN-KERNEL from coordinates + the static ``candidate_mask``
            # flag (``attn_mask`` is ignored — the stages build it with
            # exactly these semantics, asserted by tests/test_pallas.py),
            # and the positional tables stay VMEM-resident per head.  WB
            # adjacent windows pack per grid cell so small windows still
            # feed the MXU >=128-row tiles.
            import os as _os

            from ..ops.pallas.attention import (
                choose_column_block, window_attention_native,
                window_attention_native_op, window_attention_pos_op,
                window_meta, window_positional_terms)

            T = P * N
            WB = choose_column_block(nww, T)
            meta, sel = window_meta(wh, ww, WB, N)
            pixs = meta[:, 0]
            R = len(pixs)
            # r5 probe (NMRF_FUSED_POS=1 opt-in): window_attention_pos_op
            # fuses the ENTIRE positional backward into the kernel — no
            # dqr/dkr HBM round trip, no einsum-VJP — and measured
            # -7 GB/step HBM traffic (207.7 -> 200.8) but NEUTRAL wall
            # clock on the production resnet train step (832.2 -> 836.7
            # ms, same-day A/B at one HEAD): the 4 extra in-kernel dots +
            # sequential table accumulators cost what the traffic saves.
            # Kept opt-in per the re-measure-before-crediting convention;
            # cotangent parity for both paths is pinned by
            # tests/test_pallas.py::TestWindowPosOp and
            # test_kernel_partitioning.py::test_window_pos_op_dp_grad.
            fused_pos = _os.environ.get("NMRF_FUSED_POS", "0") != "0"
            if self.pallas_interpret or not fused_pos:
                # pixel-granular positional logits, computed HERE with
                # tiny batched einsums (K = hd) — the kernel DMAs the
                # compact [R, P] per-cell blocks and only spreads them
                # over token pairs
                qr_blk, kr_blk = window_positional_terms(
                    qkv, k_embed, q_embed, scale, wh, ww, WB, h)
            # value table stays in-kernel (it contracts the attention
            # probabilities): CHANNEL-major (c, s) [h, R, hd*P]
            ve_flat = v_embed.transpose(2, 0, 3, 1)[:, pixs].reshape(
                h, R, hd * P)
            if self.spatial_axis is not None:
                # H-sharded under shard_map: the kernel evaluates the
                # shifted-region mask in GLOBAL coordinates — this tile's
                # row offset rides in as an SMEM scalar (VERDICT r2 item 2)
                from jax import lax as _lax

                row0 = _lax.axis_index(self.spatial_axis) * H
                hp_total = H * _lax.axis_size(self.spatial_axis)
            else:
                row0 = 0
                hp_total = H
            # batch-partitioned outside shard_map so a DP jit keeps the
            # batch sharded through the opaque pallas call (partitioning.py)
            part = self.spatial_axis is None
            if self.pallas_interpret:
                out = window_attention_native(
                    qkv, qr_blk, kr_blk, ve_flat, shift, scale,
                    wh, ww, WB, h, self.candidate_mask, interpret=True,
                    row0=row0, hp_total=hp_total)
            elif fused_pos:
                out = window_attention_pos_op(
                    qkv, k_embed, q_embed, ve_flat, shift, row0, scale,
                    wh, ww, WB, h, self.candidate_mask, NEG_INF, hp_total,
                    part)
            else:
                out = window_attention_native_op(
                    qkv, qr_blk, kr_blk, ve_flat, shift, row0, scale,
                    wh, ww, WB, h, self.candidate_mask, NEG_INF, hp_total,
                    part)
            if not static_zero:
                if self.spatial_axis is not None:
                    from ..parallel.spatial import global_roll_h

                    s_ = wh // 2
                    rolled = jnp.roll(out, s_, axis=2)
                    rolled = global_roll_h(rolled, s_, self.spatial_axis,
                                           h_axis=1)
                    out = jnp.where(shift > 0, rolled, out)
                else:
                    out = jnp.roll(out, (shift, shift), axis=(1, 2))
            return out
        q = q * scale
        f32 = dict(preferred_element_type=jnp.float32)
        attn = jnp.einsum("bhic,bhjc->bhij", q, k, **f32)
        q5 = q.reshape(Bw, h, P, N, hd)
        k5 = k.reshape(Bw, h, P, N, hd)
        # qr[i=(p,n), j=(s,m)] = q_i . k_embed[p, s]  (independent of m)
        qr = jnp.einsum("bhpnc,pshc->bhpns", q5, k_embed, **f32)
        # kr[i=(p,n), j=(s,m)] = k_j . q_embed[p, s]  (independent of n)
        kr = jnp.einsum("bhsmc,pshc->bhpsm", k5, q_embed * scale, **f32)
        attn = attn.reshape(Bw, h, P, N, P, N)
        attn = attn + qr[:, :, :, :, :, None] + kr[:, :, :, None, :, :]
        attn = attn.reshape(Bw, h, P * N, P * N)

        if attn_mask is not None:
            nW = nwh * nww  # attn_mask broadcasts when it has leading dim 1
            attn = attn.reshape(B, nW, h, *attn.shape[-2:])
            attn = attn + attn_mask[None, :, None]
            attn = attn.reshape(B * nW, h, *attn.shape[-2:])

        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        attn = attn.astype(v.dtype)

        out = jnp.einsum("bhij,bhjc->bhic", attn, v)
        # out_pos[i=(p,n), c] = sum_j attn[i, j] ve[p, s_j] — sum over the
        # candidate axis of j first, then contract pixels
        attn_s = attn.reshape(Bw, h, P * N, P, N).sum(-1)
        out = out + jnp.einsum("bhpns,pshc->bhpnc",
                               attn_s.reshape(Bw, h, P, N, P),
                               v_embed).reshape(Bw, h, P * N, hd)

        # un-partition
        out = out.reshape(B, nwh, nww, h, wh, ww, N, hd)
        out = out.transpose(0, 1, 4, 2, 5, 6, 3, 7).reshape(B, H, W, N, self.dim)
        if not static_zero:
            if self.spatial_axis is not None:
                from ..parallel.spatial import global_roll_h

                s_ = wh // 2
                rolled = jnp.roll(out, s_, axis=2)
                rolled = global_roll_h(rolled, s_, self.spatial_axis, h_axis=1)
                out = jnp.where(shift > 0, rolled, out)
            else:
                out = jnp.roll(out, (shift, shift), axis=(1, 2))
        return out


@lru_cache(maxsize=16)
def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


class SwinNMP(nn.Module):
    """Swin message-passing block (reference ``SwinNMP`` NMP.py:295-398)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    act: Callable = gelu_exact
    normalize_before: bool = False
    dtype: Any = None
    use_pallas: bool = False
    candidate_mask: bool = False
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, label_rep, abs_encoding, attn_mask,
                 deterministic: bool = True, shift=None, drop_path_rate=None):
        """label_rep: [B, H, W, N, C]; abs_encoding: [B, H, W, N, C'].
        shift/drop_path_rate: traced overrides for nn.scan layer stacks."""
        norm1 = LayerNorm(dtype=jnp.float32, name="norm1")
        norm2 = LayerNorm(dtype=jnp.float32, name="norm2")
        drop_path = DropPath(self.drop_path)

        shortcut = label_rep
        x = norm1(label_rep) if self.normalize_before else label_rep
        if self.dtype is not None:
            abs_encoding = abs_encoding.astype(self.dtype)
        x = jnp.concatenate([x.astype(abs_encoding.dtype), abs_encoding], axis=-1)
        qkv = Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        msg = WindowAttention(
            self.dim, (self.window_size, self.window_size), self.shift_size,
            self.num_heads, self.attn_drop, dtype=self.dtype,
            use_pallas=self.use_pallas, candidate_mask=self.candidate_mask,
            spatial_axis=self.spatial_axis,
            name="attn",
        )(qkv, attn_mask, deterministic, shift=shift)
        msg = Dense(self.dim, dtype=self.dtype, name="proj")(msg)
        msg = nn.Dropout(self.drop, deterministic=deterministic)(msg)
        x = shortcut + drop_path(msg, deterministic, rate=drop_path_rate)
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, act=self.act,
                  drop=self.drop, dtype=self.dtype, name="mlp")
        if self.normalize_before:
            x = x + drop_path(mlp(norm2(x), deterministic), deterministic,
                              rate=drop_path_rate)
        else:
            x = norm1(x)
            x = x + drop_path(mlp(x, deterministic), deterministic,
                              rate=drop_path_rate)
            x = norm2(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)
        return x


class CSWinAttention(nn.Module):
    """Cross-shaped-window stripe attention with conv positional term
    (reference ``CSWinAttention`` NMP.py:401-505).

    idx=0: vertical stripes (H_sp=H, W_sp=split); idx=1: horizontal.
    The depthwise-conv positional term sums candidate planes and removes
    other-candidates' center-tap contributions (self-edge removal,
    NMP.py:433-449).
    """

    dim: int
    idx: int
    split_size: int = 7
    num_heads: int = 8
    attn_drop: float = 0.0
    dtype: Any = None
    # fused Pallas stripe attention (ops/pallas/attention.py)
    use_pallas: bool = False
    pallas_interpret: bool = False
    # mesh axis name when H is sharded under shard_map: vertical stripes
    # (idx=0) span the global H — queries stay local, keys/values are
    # all-gathered along the axis (the CSWin analog of ring attention)
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, query, key, value, deterministic: bool = True):
        """query/key/value: [B, H, W, N, C] -> [B, H, W, N, C]."""
        B, H, W, N, C = query.shape
        h = self.num_heads
        hd = self.dim // h
        scale = hd ** -0.5

        kernel = self.param("get_v_kernel", _torch_conv_default_init,
                            (3, 3, 1, self.dim))  # HWIO, depthwise
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)

        if self.spatial_axis is not None and self.idx == 0:
            return self._vertical_sharded(query, key, value, kernel,
                                          deterministic)

        if self.idx == 0:
            H_sp, W_sp = H, self.split_size
        elif self.idx == 1:
            H_sp, W_sp = self.split_size, W
        else:
            H_sp, W_sp = H, W
        if self.spatial_axis is not None:
            # horizontal stripes must not cross tile boundaries
            assert H % H_sp == 0, (H, H_sp)

        # pad to stripe multiples (centered, reference NMP.py:474-485)
        H_pad = (H_sp - H % H_sp) % H_sp
        W_pad = (W_sp - W % W_sp) % W_sp
        tp, lp = H_pad // 2, W_pad // 2
        bp, rp = H_pad - tp, W_pad - lp
        pad = ((0, 0), (tp, bp), (lp, rp), (0, 0), (0, 0))
        q = jnp.pad(query, pad)
        k = jnp.pad(key, pad)
        v = jnp.pad(value, pad)
        Hp, Wp = H + H_pad, W + W_pad
        ni, nj = Hp // H_sp, Wp // W_sp

        def to_stripes(t):  # [B,Hp,Wp,N,C] -> [B*ni*nj, h, H_sp*W_sp*N, hd]
            t = t.reshape(B, ni, H_sp, nj, W_sp, N, h, hd)
            return t.transpose(0, 1, 3, 6, 2, 4, 5, 7).reshape(
                B * ni * nj, h, H_sp * W_sp * N, hd)

        # depthwise 3x3 conv positional term on stripe-local planes.
        # Implemented as 9 shifted multiplies instead of a conv primitive:
        # identical math (depthwise = per-channel elementwise), and the XLA
        # TPU backward of a depthwise conv over degenerate width-1 stripe
        # images produces NaN kernel gradients (observed on v5e).
        vs = v.reshape(B, ni, H_sp, nj, W_sp, N, self.dim)
        vs = vs.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B * ni * nj * N, H_sp, W_sp, self.dim)
        vs_pad = jnp.pad(vs, ((0, 0), (1, 1), (1, 1), (0, 0)))
        rpe_full = None
        for dy in range(3):
            for dx in range(3):
                tap = vs_pad[:, dy:dy + H_sp, dx:dx + W_sp, :] * kernel[dy, dx, 0]
                rpe_full = tap if rpe_full is None else rpe_full + tap
        rpe_full = rpe_full.reshape(B * ni * nj, N, H_sp, W_sp, self.dim)
        rpe_sum = rpe_full.sum(axis=1, keepdims=True)  # sum over candidates
        # self-edge removal: subtract other-candidates' center-tap contribution
        w_center = kernel[1, 1, 0, :]  # [dim]
        center = vs.reshape(B * ni * nj, N, H_sp, W_sp, self.dim) * w_center
        others = center.sum(axis=1, keepdims=True) - center  # sum over k != j
        rpe_si = rpe_sum - others  # [B', N, H_sp, W_sp, dim]

        T = H_sp * W_sp * N
        mask = jnp.asarray(window_attn_mask((H_sp, W_sp, N)))
        # under H-sharding only idx=1 reaches here (idx=0 takes
        # _vertical_sharded above) and its stripes are tile-local, so the
        # fused kernel applies unchanged
        use_fused = (self.use_pallas and self.idx in (0, 1) and T <= 1024
                     and (self.attn_drop == 0.0 or deterministic))
        if use_fused:
            # direct-packing fused stripe attention: BlockSpecs address
            # each stripe in the padded image layout (no host stripe
            # transposes); the conv positional term stays in XLA and is
            # added back in image layout.
            from ..ops.pallas.attention import (
                stripe_attention_direct, stripe_attention_op)

            if self.pallas_interpret:
                out = stripe_attention_direct(q, k, v, mask, scale,
                                              H_sp, W_sp, h, interpret=True)
            else:
                # batch-partitioned outside shard_map (partitioning.py)
                out = stripe_attention_op(q, k, v, mask, scale,
                                          H_sp, W_sp, h,
                                          self.spatial_axis is None)
            rpe_img = rpe_si.reshape(B, ni, nj, N, H_sp, W_sp, self.dim)
            rpe_img = rpe_img.transpose(0, 1, 4, 2, 5, 3, 6).reshape(
                B, Hp, Wp, N, self.dim)
            out = out + rpe_img.astype(out.dtype)
            return out[:, tp:tp + H, lp:lp + W]
        rpe = rpe_si.transpose(0, 2, 3, 1, 4).reshape(
            B * ni * nj, H_sp * W_sp * N, h, hd).transpose(0, 2, 1, 3)

        qs, ks = to_stripes(q), to_stripes(k)
        vv = v.reshape(B, ni, H_sp, nj, W_sp, N, self.dim)
        vv = vv.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B * ni * nj, N, H_sp, W_sp, self.dim)
        vv = vv.transpose(0, 2, 3, 1, 4).reshape(
            B * ni * nj, H_sp * W_sp * N, h, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhic,bhjc->bhij", qs * scale, ks,
                          preferred_element_type=jnp.float32)
        attn = attn + mask[None, None]
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bhij,bhjc->bhic", attn.astype(vv.dtype), vv) + rpe

        out = out.transpose(0, 2, 1, 3).reshape(B, ni, nj, H_sp, W_sp, N, self.dim)
        out = out.transpose(0, 1, 3, 2, 4, 5, 6).reshape(B, Hp, Wp, N, self.dim)
        return out[:, tp:tp + H, lp:lp + W]


    def _vertical_sharded(self, query, key, value, kernel,
                          deterministic: bool = True):
        """Vertical stripes (H_sp = GLOBAL H) under H-sharding.

        Reference semantics NMP.py:401-505 with the stripe spanning the full
        image column; this is the model's long-context axis (SURVEY.md §5):
        local queries attend to the all-gathered global stripe, and the
        depthwise positional term is computed on the gathered column with
        this tile's rows sliced out (crossing-tile taps included exactly).
        """
        from jax import lax

        from ..parallel.spatial import all_gather_h

        B, H, W, N, C = query.shape  # H = local tile height
        h = self.num_heads
        hd = self.dim // h
        scale = hd ** -0.5
        W_sp = self.split_size
        n = lax.axis_size(self.spatial_axis)
        tix = lax.axis_index(self.spatial_axis)
        Hg = H * n

        W_pad = (W_sp - W % W_sp) % W_sp
        lp = W_pad // 2
        rp = W_pad - lp
        pad = ((0, 0), (0, 0), (lp, rp), (0, 0), (0, 0))
        q = jnp.pad(query, pad)
        kf = all_gather_h(jnp.pad(key, pad), self.spatial_axis, h_axis=1)
        vf = all_gather_h(jnp.pad(value, pad), self.spatial_axis, h_axis=1)
        Wp = W + W_pad
        nj = Wp // W_sp

        def to_stripes(t, Hs):
            t = t.reshape(B, Hs, nj, W_sp, N, h, hd)
            return t.transpose(0, 2, 5, 1, 3, 4, 6).reshape(
                B * nj, h, Hs * W_sp * N, hd)

        qs = to_stripes(q, H)
        ks = to_stripes(kf, Hg)
        vv = to_stripes(vf, Hg)

        # positional conv term on the gathered full column; slice local rows
        vs = vf.reshape(B, Hg, nj, W_sp, N, self.dim)
        vs = vs.transpose(0, 2, 4, 1, 3, 5).reshape(
            B * nj * N, Hg, W_sp, self.dim)
        vs_pad = jnp.pad(vs, ((0, 0), (1, 1), (1, 1), (0, 0)))
        rpe_full = None
        for dy in range(3):
            for dx in range(3):
                tap = vs_pad[:, dy:dy + Hg, dx:dx + W_sp, :] * kernel[dy, dx, 0]
                rpe_full = tap if rpe_full is None else rpe_full + tap
        rpe_full = rpe_full.reshape(B * nj, N, Hg, W_sp, self.dim)
        rpe_sum = rpe_full.sum(axis=1, keepdims=True)
        w_center = kernel[1, 1, 0, :]
        center = vs.reshape(B * nj, N, Hg, W_sp, self.dim) * w_center
        others = center.sum(axis=1, keepdims=True) - center
        rpe = rpe_sum - others  # [B*nj, N, Hg, W_sp, dim]
        rpe = lax.dynamic_slice_in_dim(rpe, tix * H, H, axis=2)
        rpe = rpe.transpose(0, 2, 3, 1, 4).reshape(
            B * nj, H * W_sp * N, h, hd).transpose(0, 2, 1, 3)

        # same-pixel mask between local query tokens and global key tokens:
        # this tile's query rows are a contiguous block of the global mask
        mfull = window_attn_mask((Hg, W_sp, N))  # [Tg, Tg]
        tiles = mfull.reshape(n, H * W_sp * N, Hg * W_sp * N)
        mask = jnp.take(jnp.asarray(tiles), tix, axis=0)

        if self.use_pallas and (self.attn_drop == 0.0 or deterministic):
            # fused rectangular attention: local query rows x gathered
            # global stripe (masked_attention handles Rq != Rk)
            from ..ops.pallas.attention import (
                masked_attention, masked_attention_op)

            qh = qs.transpose(1, 0, 2, 3)  # [h, B*nj, Rq, hd]
            kh = ks.transpose(1, 0, 2, 3)
            vh = vv.transpose(1, 0, 2, 3)
            if self.pallas_interpret:
                out = masked_attention(qh, kh, vh, mask[None], scale,
                                       interpret=True)
            else:
                out = masked_attention_op(qh, kh, vh, mask[None], scale)
            out = out.transpose(1, 0, 2, 3) + rpe
        else:
            attn = jnp.einsum("bhic,bhjc->bhij", qs * scale, ks,
                              preferred_element_type=jnp.float32)
            attn = attn + mask[None, None]
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop,
                              deterministic=deterministic)(attn)
            out = jnp.einsum("bhij,bhjc->bhic", attn.astype(vv.dtype),
                             vv) + rpe

        out = out.transpose(0, 2, 1, 3).reshape(B, nj, H, W_sp, N, self.dim)
        out = out.transpose(0, 2, 1, 3, 4, 5).reshape(B, H, Wp, N, self.dim)
        return out[:, :, lp:lp + W]


def _torch_conv_default_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default init: kaiming_uniform(a=sqrt(5)) => U(-b, b),
    b = 1/sqrt(fan_in), fan_in = kh*kw*in_ch_per_group (HWIO shape[0:3])."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class CSWinNMP(nn.Module):
    """CSWin message-passing block (reference ``CSWinNMP`` NMP.py:508-600).

    dim is split in half: one half attends in vertical stripes, the other in
    horizontal stripes.  qk input is (embedding ++ visual context); v gets a
    fourier grid pos-embed when v_dim > dim.
    """

    dim: int
    qk_dim: int
    v_dim: int
    num_heads: int
    split_size: int = 7
    mlp_ratio: float = 4.0
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    dropout: float = 0.0
    act: Callable = gelu_exact
    normalize_before: bool = False
    dtype: Any = None
    use_pallas: bool = False
    candidate_mask: bool = False
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, tgt, context, deterministic: bool = True,
                 drop_path_rate=None):
        """tgt: [B, H, W, N, C]; context: [B, H, W, N, C_ctx] or None."""
        B, H, W, N, C = tgt.shape
        norm1 = LayerNorm(dtype=jnp.float32, name="norm1")
        norm2 = LayerNorm(dtype=jnp.float32, name="norm2")
        drop_path = DropPath(self.drop_path)

        shortcut = tgt
        x = norm1(tgt) if self.normalize_before else tgt
        if self.dtype is not None:
            x = x.astype(self.dtype)
            if context is not None:
                context = context.astype(self.dtype)
        qk = jnp.concatenate([x, context], axis=-1) if context is not None else x
        if self.v_dim > self.dim:
            if self.spatial_axis is not None:
                # positional embed indexes GLOBAL rows: build the global
                # grid and slice this tile's rows
                from jax import lax as _lax

                from ..parallel.spatial import global_fourier_rows

                n_sp = _lax.axis_size(self.spatial_axis)
                pe = fourier_grid_embed((H * n_sp, W), self.v_dim - self.dim,
                                        dtype=x.dtype)
                pe = global_fourier_rows(pe, H, self.spatial_axis)
            else:
                pe = fourier_grid_embed((H, W), self.v_dim - self.dim, dtype=x.dtype)
            pe = jnp.broadcast_to(pe[None, :, :, None, :], (B, H, W, N, self.v_dim - self.dim))
            v_in = jnp.concatenate([x, pe], axis=-1)
        else:
            v_in = x
        query = Dense(self.dim, dtype=self.dtype, name="q")(qk)
        key = Dense(self.dim, dtype=self.dtype, name="k")(qk)
        value = Dense(self.dim, dtype=self.dtype, name="v")(v_in)

        half = self.dim // 2
        x1 = CSWinAttention(half, idx=0, split_size=self.split_size,
                            num_heads=self.num_heads // 2,
                            attn_drop=self.attn_drop, dtype=self.dtype,
                            use_pallas=self.use_pallas,
                            spatial_axis=self.spatial_axis,
                            name="attns_0")(
            query[..., :half], key[..., :half], value[..., :half], deterministic)
        x2 = CSWinAttention(half, idx=1, split_size=self.split_size,
                            num_heads=self.num_heads // 2,
                            attn_drop=self.attn_drop, dtype=self.dtype,
                            use_pallas=self.use_pallas,
                            spatial_axis=self.spatial_axis,
                            name="attns_1")(
            query[..., half:], key[..., half:], value[..., half:], deterministic)
        msg = jnp.concatenate([x1, x2], axis=-1)
        msg = Dense(self.dim, dtype=self.dtype, name="proj")(msg)
        msg = nn.Dropout(self.proj_drop, deterministic=deterministic)(msg)
        x = shortcut + drop_path(msg, deterministic, rate=drop_path_rate)
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, act=self.act,
                  drop=self.dropout, dtype=self.dtype, name="mlp")
        if self.normalize_before:
            x = x + drop_path(mlp(norm2(x), deterministic), deterministic,
                              rate=drop_path_rate)
        else:
            x = norm1(x)
            x = x + drop_path(mlp(x, deterministic), deterministic,
                              rate=drop_path_rate)
            x = norm2(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)
        return x
