"""Fused NMP attention kernels — Pallas TPU.

The NMP stages are HBM-bandwidth/layout bound, not FLOP bound: the profiled
XLA lowering spends most of each layer materializing [Bw, h, T, T] logits,
softmax temporaries and window-partition copies (see tools/profile_model.py).
These kernels keep the whole attention of one (head, window-group) in VMEM:

  ``masked_attention``          logits = q k^T * scale + mask; softmax @ v
  ``window_attention_native``   windowed attention + the pixel-granular
                                relative-position q/k/v terms of
                                ``models.nmp.WindowAttention``, with the
                                candidate/cross-window/shifted-region masks
                                built in-kernel from iota coordinates

Design rules (this backend's Mosaic restrictions — see CLAUDE.md):
  * only 2-D ``dot_general`` contractions; the candidate/pixel
    factorization is handled with constant 0/1 *selector matmuls*
    (``hd_group_selectors``) instead of reshapes.  Cross-window selector
    hits are junk but always masked to -inf before softmax (exp underflows
    to exactly 0), so packing several windows into one attention is exact.
  * no minor-dim reshapes — callers pass tokens pre-flattened [*, R, hd];
  * elementwise 3-D multiply + middle-axis reduce is used only for the
    value-table term (same pattern as the v1 kernel, known-good).

Block-diagonal packing: a grid cell processes WB windows as one R = WB*T
token block.  For the refinement stage (T = 16) this is the difference
between starving the MXU and feeding it [128, 128] tiles.

Training: fused Pallas BACKWARD kernels (r4) — each op's custom VJP
recomputes the attention inside the backward kernel (flash-attention-style
rematerialization; the TPU answer to the reference's atomic CUDA backwards,
ops/src/cuda/ms_deform_im2col_cuda.cuh:301-922) instead of linearizing the
dense jnp reference, which paid the dense forward twice plus [G, R, R]
mask/attention HBM traffic.  ``NMRF_PALLAS_BWD=0`` restores the dense
backward (A/B timing + remote-Mosaic insurance); interpret mode + the
tests/test_pallas.py analytic-VJP and numeric gradchecks pin parity.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = dict(preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------- #
# Host-side constant builders
# --------------------------------------------------------------------------- #

# --------------------------------------------------------------------------- #
# Plain masked attention (CSWin stripes, BasicAttention candidate blocks)
# --------------------------------------------------------------------------- #

def _masked_attention_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *,
                             scale):
    # f32 inputs keep f32 dot inputs (parity contract); bf16 inputs stay
    # bf16 into the MXU (single pass) with f32 accumulation
    cd = jnp.float32 if q_ref.dtype == jnp.float32 else q_ref.dtype
    q = q_ref[0, 0].astype(cd) * scale                   # [R, hd]
    k = k_ref[0, 0].astype(cd)
    v = v_ref[0, 0]
    logits = lax.dot_general(q, k, (((1,), (1,)), ((), ())), **_F32)
    logits = logits + mask_ref[0]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    out = lax.dot_general(attn.astype(v.dtype), v,
                          (((1,), (0,)), ((), ())), **_F32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def masked_attention(q, k, v, mask, scale, interpret=None):
    """Fused ``softmax(q k^T * scale + mask) v``.

    q: [h, G, Rq, hd]; k, v: [h, G, Rk, hd] (Rk may exceed Rq — the
    H-sharded CSWin vertical stripe attends local queries against the
    all-gathered global stripe); mask: [Gm, Rq, Rk] additive f32 with Gm in
    {1, G} (Gm=1 broadcasts).  Returns [h, G, Rq, hd] in q.dtype.

    Grid is (G, h) with h innermost: the mask block's index map is
    constant across the h steps, so Mosaic fetches each [Rq, Rk] mask once
    per group instead of once per (head, group).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, G, Rq, hd = q.shape
    Rk = k.shape[2]
    Gm = mask.shape[0]

    def tok(R):
        return pl.BlockSpec((1, 1, R, hd), lambda g, i: (i, g, 0, 0),
                            memory_space=pltpu.VMEM)

    msk = pl.BlockSpec((1, Rq, Rk), lambda g, i: (g % Gm, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_masked_attention_kernel, scale=scale),
        grid=(G, h),
        in_specs=[tok(Rq), tok(Rk), tok(Rk), msk],
        out_specs=tok(Rq),
        out_shape=jax.ShapeDtypeStruct((h, G, Rq, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, mask)


def masked_attention_reference(q, k, v, mask, scale):
    """jnp golden of ``masked_attention`` (tests + custom-VJP backward)."""
    h, G, Rq, hd = q.shape
    Rk = k.shape[2]
    Gm = mask.shape[0]
    logits = jnp.einsum("hgic,hgjc->hgij", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    m = mask if Gm == G else jnp.broadcast_to(mask, (G, Rq, Rk))
    logits = logits + m[None]
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("hgij,hgjc->hgic", attn.astype(v.dtype),
                      v).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_attention_op(q, k, v, mask, scale):
    """Differentiable fused masked attention (Pallas fwd, remat bwd)."""
    return masked_attention(q, k, v, mask, scale)


def _ma_fwd(q, k, v, mask, scale):
    return masked_attention(q, k, v, mask, scale), (q, k, v, mask)


def _masked_attention_bwd_kernel(q_ref, k_ref, v_ref, g_ref, mask_ref,
                                 dq_ref, dk_ref, dv_ref, *, scale):
    """d(q, k, v) of one (group, head) block — recompute + softmax bwd."""
    cd = jnp.float32 if q_ref.dtype == jnp.float32 else q_ref.dtype
    _P = dict(_F32, precision=lax.Precision.HIGHEST) \
        if q_ref.dtype == jnp.float32 else _F32
    q = q_ref[0, 0].astype(cd) * scale                   # [Rq, hd]
    k = k_ref[0, 0].astype(cd)
    v = v_ref[0, 0]
    g = g_ref[0, 0].astype(cd)
    logits = lax.dot_general(q, k, (((1,), (1,)), ((), ())), **_P)
    logits = logits + mask_ref[0]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cd)
    dattn = lax.dot_general(g, v.astype(cd), (((1,), (1,)), ((), ())), **_P)
    dlog = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
    dq_ref[0, 0] = (lax.dot_general(dlog, k, (((1,), (0,)), ((), ())),
                                    **_P) * scale).astype(dq_ref.dtype)
    dk_ref[0, 0] = lax.dot_general(dlog, q, (((0,), (0,)), ((), ())),
                                   **_P).astype(dk_ref.dtype)
    dv_ref[0, 0] = lax.dot_general(attn, g, (((0,), (0,)), ((), ())),
                                   **_P).astype(dv_ref.dtype)


def _ma_bwd(scale, res, g):
    import os

    q, k, v, mask = res
    if os.environ.get("NMRF_PALLAS_BWD", "1") == "0":
        # escape hatch: pre-r4 dense backward
        _, vjp = jax.vjp(
            lambda q, k, v: masked_attention_reference(q, k, v, mask, scale),
            q, k, v)
        return vjp(g) + (None,)
    interpret = jax.default_backend() == "cpu"
    h, G, Rq, hd = q.shape
    Rk = k.shape[2]
    Gm = mask.shape[0]

    def tok(R):
        return pl.BlockSpec((1, 1, R, hd), lambda gg, i: (i, gg, 0, 0),
                            memory_space=pltpu.VMEM)

    msk = pl.BlockSpec((1, Rq, Rk), lambda gg, i: (gg % Gm, 0, 0),
                       memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_masked_attention_bwd_kernel, scale=scale),
        grid=(G, h),
        in_specs=[tok(Rq), tok(Rk), tok(Rk), tok(Rq), msk],
        out_specs=(tok(Rq), tok(Rk), tok(Rk)),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        interpret=interpret,
    )(q, k, v, g, mask)
    return dq, dk, dv, None


masked_attention_op.defvjp(_ma_fwd, _ma_bwd)


# --------------------------------------------------------------------------- #
# Direct-packing stripe attention (CSWin): image-layout blocks, no caller
# stripe transposes
# --------------------------------------------------------------------------- #

def _stripe_attention_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *,
                             scale, num_heads, hd):
    """One stripe's attention, tokens in natural (hs, ws, n) image order.

    Blocks arrive [1, H_sp, W_sp*N, C] (a leading-dim collapse restores
    [T, C]); heads unroll via static hd-lane slices, exactly like
    ``_window_native_kernel_direct``.
    """
    x_q = q_ref[0, 0, :, 0]                         # [H_sp, W_sp*N, C]
    T = x_q.shape[0] * x_q.shape[1]
    C = num_heads * hd
    q2 = x_q.reshape(T, C)
    k2 = k_ref[0, 0, :, 0].reshape(T, C)
    v2 = v_ref[0, 0, :, 0].reshape(T, C)
    cd = jnp.float32 if q2.dtype == jnp.float32 else q2.dtype
    mask = mask_ref[:]
    outs = []
    for i in range(num_heads):
        q = q2[:, i * hd:(i + 1) * hd].astype(cd) * scale
        k = k2[:, i * hd:(i + 1) * hd].astype(cd)
        v = v2[:, i * hd:(i + 1) * hd]
        logits = lax.dot_general(q, k, (((1,), (1,)), ((), ())), **_F32)
        logits = logits + mask
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - mx)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(lax.dot_general(attn.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())), **_F32))
    out = jnp.concatenate(outs, axis=-1)
    out_ref[0, 0, :, 0] = out.reshape(*x_q.shape[:2], C).astype(out_ref.dtype)


def stripe_attention_direct(q, k, v, mask, scale, H_sp, W_sp, num_heads,
                            interpret=None, partition=False):
    """Fused CSWin stripe attention on image-layout tensors.

    q/k/v: [B, Hp, Wp, N, C] already padded to stripe multiples; the stripe
    grid is (B, ni, nj) with ni = Hp//H_sp, nj = Wp//W_sp, and BlockSpecs
    address each [H_sp, W_sp*N, C] stripe in place — no host-side stripe
    packing transposes (the ``to_stripes`` path cost ~1 ms/frame across the
    propagation layers at KITTI shapes).  mask: [T, T] additive f32 with
    T = H_sp*W_sp*N (the anti-same-pixel stripe mask).
    Returns [B, Hp, Wp, N, C] in q.dtype.

    partition: declare the batch dim SPMD-partitionable (custom_
    partitioning) so a data-parallel jit keeps the batch sharded instead of
    replicating the opaque pallas call on every device (partitioning.py).
    Must stay False inside shard_map (tensors already per-device).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if partition:
        from .partitioning import shard_over_batch

        return shard_over_batch(
            _stripe_direct_core, (0, 0, 0, None), 5, (q, k, v, mask),
            (("scale", scale), ("H_sp", H_sp), ("W_sp", W_sp),
             ("num_heads", num_heads), ("interpret", interpret)))
    return _stripe_direct_core(q, k, v, mask, scale=scale, H_sp=H_sp,
                               W_sp=W_sp, num_heads=num_heads,
                               interpret=interpret)


def _stripe_direct_core(q, k, v, mask, *, scale, H_sp, W_sp, num_heads,
                        interpret):
    B, Hp, Wp, N, C = q.shape
    ni, nj = Hp // H_sp, Wp // W_sp
    hd = C // num_heads
    T = H_sp * W_sp * N

    def img(t):
        return t.reshape(B, ni, H_sp, nj, W_sp * N, C)

    blk = pl.BlockSpec((1, 1, H_sp, 1, W_sp * N, C),
                       lambda b, i, j: (b, i, 0, j, 0, 0),
                       memory_space=pltpu.VMEM)
    msk = pl.BlockSpec((T, T), lambda b, i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_stripe_attention_kernel, scale=scale,
                          num_heads=num_heads, hd=hd),
        grid=(B, ni, nj),
        in_specs=[blk, blk, blk, msk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, ni, H_sp, nj, W_sp * N, C),
                                       q.dtype),
        interpret=interpret,
    )(img(q), img(k), img(v), mask)
    return out.reshape(B, Hp, Wp, N, C)


def stripe_attention_reference(q, k, v, mask, scale, H_sp, W_sp, num_heads):
    """jnp golden of :func:`stripe_attention_direct` (tests + VJP bwd)."""
    B, Hp, Wp, N, C = q.shape
    ni, nj = Hp // H_sp, Wp // W_sp
    hd = C // num_heads
    T = H_sp * W_sp * N

    def st(t):  # [B,Hp,Wp,N,C] -> [B*ni*nj, h, T, hd]
        t = t.reshape(B, ni, H_sp, nj, W_sp, N, num_heads, hd)
        return t.transpose(0, 1, 3, 6, 2, 4, 5, 7).reshape(
            B * ni * nj, num_heads, T, hd)

    qs, ks, vs = st(q), st(k), st(v)
    logits = jnp.einsum("ghic,ghjc->ghij", qs.astype(jnp.float32) * scale,
                        ks.astype(jnp.float32))
    attn = jax.nn.softmax(logits + mask[None, None], axis=-1)
    out = jnp.einsum("ghij,ghjc->ghic", attn.astype(vs.dtype), vs)
    out = out.reshape(B, ni, nj, num_heads, H_sp, W_sp, N, hd)
    out = out.transpose(0, 1, 4, 2, 5, 6, 3, 7)
    return out.reshape(B, Hp, Wp, N, C).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def stripe_attention_op(q, k, v, mask, scale, H_sp, W_sp, num_heads,
                        partition=False):
    """Differentiable direct stripe attention (Pallas fwd, remat bwd)."""
    return stripe_attention_direct(q, k, v, mask, scale, H_sp, W_sp,
                                   num_heads, partition=partition)


def _sa_fwd(q, k, v, mask, scale, H_sp, W_sp, num_heads, partition=False):
    return stripe_attention_direct(q, k, v, mask, scale, H_sp, W_sp,
                                   num_heads,
                                   partition=partition), (q, k, v, mask)


def _stripe_bwd_kernel(q_ref, k_ref, v_ref, g_ref, mask_ref, dq_ref,
                       dk_ref, dv_ref, *, scale, num_heads, hd):
    """d(q, k, v) of one stripe — recompute + softmax backward in VMEM
    (mirror of ``_stripe_attention_kernel``; heads unrolled)."""
    x_q = q_ref[0, 0, :, 0]                         # [H_sp, W_sp*N, C]
    T = x_q.shape[0] * x_q.shape[1]
    C = num_heads * hd
    q2 = x_q.reshape(T, C)
    k2 = k_ref[0, 0, :, 0].reshape(T, C)
    v2 = v_ref[0, 0, :, 0].reshape(T, C)
    g2 = g_ref[0, 0, :, 0].reshape(T, C)
    cd = jnp.float32 if q2.dtype == jnp.float32 else q2.dtype
    _P = dict(_F32, precision=lax.Precision.HIGHEST) \
        if q2.dtype == jnp.float32 else _F32
    mask = mask_ref[:]
    dqs, dks, dvs = [], [], []
    for i in range(num_heads):
        q = q2[:, i * hd:(i + 1) * hd].astype(cd) * scale
        k = k2[:, i * hd:(i + 1) * hd].astype(cd)
        v = v2[:, i * hd:(i + 1) * hd]
        g = g2[:, i * hd:(i + 1) * hd].astype(cd)
        logits = lax.dot_general(q, k, (((1,), (1,)), ((), ())), **_P)
        logits = logits + mask
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - mx)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        attn_c = attn.astype(cd)
        dattn = lax.dot_general(g, v.astype(cd),
                                (((1,), (1,)), ((), ())), **_P)
        dlog = attn_c * (dattn
                         - jnp.sum(dattn * attn_c, axis=-1, keepdims=True))
        dqs.append(lax.dot_general(dlog, k, (((1,), (0,)), ((), ())),
                                   **_P) * scale)
        dks.append(lax.dot_general(dlog, q, (((0,), (0,)), ((), ())), **_P))
        dvs.append(lax.dot_general(attn_c, g, (((0,), (0,)), ((), ())),
                                   **_P))
    sh = (*x_q.shape[:2], C)
    dq_ref[0, 0, :, 0] = jnp.concatenate(dqs, -1).reshape(sh).astype(
        dq_ref.dtype)
    dk_ref[0, 0, :, 0] = jnp.concatenate(dks, -1).reshape(sh).astype(
        dk_ref.dtype)
    dv_ref[0, 0, :, 0] = jnp.concatenate(dvs, -1).reshape(sh).astype(
        dv_ref.dtype)


def _stripe_bwd_core(g, q, k, v, mask, *, scale, H_sp, W_sp, num_heads,
                     interpret):
    B, Hp, Wp, N, C = q.shape
    ni, nj = Hp // H_sp, Wp // W_sp
    hd = C // num_heads
    T = H_sp * W_sp * N

    def img(t):
        return t.reshape(B, ni, H_sp, nj, W_sp * N, C)

    blk = pl.BlockSpec((1, 1, H_sp, 1, W_sp * N, C),
                       lambda b, i, j: (b, i, 0, j, 0, 0),
                       memory_space=pltpu.VMEM)
    msk = pl.BlockSpec((T, T), lambda b, i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((B, ni, H_sp, nj, W_sp * N, C), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_stripe_bwd_kernel, scale=scale,
                          num_heads=num_heads, hd=hd),
        grid=(B, ni, nj),
        in_specs=[blk, blk, blk, blk, msk],
        out_specs=(blk, blk, blk),
        out_shape=(shp, shp, shp),
        interpret=interpret,
    )(img(q), img(k), img(v), img(g), mask)
    return tuple(t.reshape(B, Hp, Wp, N, C) for t in (dq, dk, dv))


def _stripe_bwd_part(g, q, k, v, mask, **kw):
    # stacked along axis 1 so the result keeps batch at dim 0 (the
    # partitioning contract of shard_over_batch)
    return jnp.stack(_stripe_bwd_core(g, q, k, v, mask, **kw), axis=1)


def _sa_bwd(scale, H_sp, W_sp, num_heads, partition, res, g):
    import os

    q, k, v, mask = res
    if os.environ.get("NMRF_PALLAS_BWD", "1") == "0":
        # escape hatch: pre-r4 dense backward (remat through jnp reference)
        _, vjp = jax.vjp(
            lambda q, k, v: stripe_attention_reference(
                q, k, v, mask, scale, H_sp, W_sp, num_heads), q, k, v)
        return vjp(g) + (None,)
    interpret = jax.default_backend() == "cpu"
    kw = dict(scale=scale, H_sp=H_sp, W_sp=W_sp, num_heads=num_heads,
              interpret=interpret)
    if partition:
        from .partitioning import shard_over_batch

        dqkv = shard_over_batch(_stripe_bwd_part, (0, 0, 0, 0, None), 6,
                                (g, q, k, v, mask), tuple(sorted(kw.items())))
        return dqkv[:, 0], dqkv[:, 1], dqkv[:, 2], None
    dq, dk, dv = _stripe_bwd_core(g, q, k, v, mask, **kw)
    return dq, dk, dv, None


stripe_attention_op.defvjp(_sa_fwd, _sa_bwd)


# --------------------------------------------------------------------------- #
# Window-native attention: coordinate masks + resident positional tables
# --------------------------------------------------------------------------- #
#
# An earlier "v2 rpe" kernel (git history: rpe_window_attention) paid per
# grid cell for (a) [R, R] mask blocks streamed from HBM and (b) TOKEN-
# expanded [R, R]-sized qr/kr/ve tensors materialized by the caller and
# re-fetched every step — measured 75.1 vs 61.1 ms full-forward.  The
# r3 successor computed everything in-kernel: masks from trace-time
# coordinate constants (plus one SMEM shift scalar), and the q·ke / k·qe
# relative-position logits from VMEM-resident [h, R, P*hd] tables via
# ``pltpu.repeat`` lane expansions + constant 0/1 selector matmuls.  Those
# selector dots carried a P=49x K-blowup (K = P*hd where only hd lanes per
# output are live): at production shapes they were ~8x the FLOPs of the
# attention itself (r4 trace: the two window kernels = 10.6 of 65.8
# ms/frame on swin).
#
# Current design (r4): the positional logits are PIXEL-granular —
# qr[i, s] = q_i . k_embed[pixel(i), s] depends only on (token, key
# PIXEL), an [R, P] block per (cell, head) — so the caller computes them
# with tiny batched einsums on the MXU (``nmp.py
# window_positional_terms``: batch dims (wh, ww, h), K = hd — the
# irreducible R*P*hd contraction, ~30x fewer FLOPs than the in-kernel
# selector algebra) and the kernel DMAs the compact [R, P] blocks
# (~150 KB/cell) and only SPREADS them over token pairs with cheap K=P
# selector dots.  Masks stay in-kernel (unlike v2).  The value-table term
# needs the attention probabilities and stays in-kernel via the (c, s)
# channel-major lane expansion:
#
#   logits += qr @ S_st            S_st[s, j] = (s == pixel(j))       [R, R]
#   logits += S_q @ kr^T           S_q[i, p]  = (p == pixel(i))       [R, R]
#   atile = repeat(attn_s, hd)    (c, s) lane expansion (ve c-major)  [R, hd*P]
#   vterm = (ve_c ⊙ atile) @ S_ch_c  S_ch_c[c*P+s, c'] = (c == c')    [R, hd]

def window_meta(wh, ww, WB, N):
    """Constants for the window-native token order.

    A grid cell covers WB adjacent windows along W: token
    i = (lr * WB*ww + wx) * N + n with lr the row inside the window band,
    wx the column inside the block, n the candidate.

    Returns int32 ``meta`` [R, 4] with columns (pixel-in-window, window-in-
    block, lr, wx), and f32 ``sel`` [R, P] with sel[i, p] = 1 iff
    pixel(i) == p (cross-window hits handled by the in-kernel window mask).
    """
    WBww = WB * ww
    lr = np.repeat(np.arange(wh), WBww * N)
    wx = np.tile(np.repeat(np.arange(WBww), N), wh)
    pix = lr * ww + (wx % ww)
    win = wx // ww
    meta = np.stack([pix, win, lr, wx], 1).astype(np.int32)  # [R, 4]
    P = wh * ww
    sel = (pix[:, None] == np.arange(P)[None, :]).astype(np.float32)
    return meta, sel


def window_positional_terms(qkv, k_embed, q_embed, scale, wh, ww, WB,
                            num_heads):
    """Pixel-granular relative-position logits for the window kernels.

    qr[b, gh, gw, h, i, s] = (q_i * scale) . k_embed[pixel(i), s];
    kr[b, gh, gw, h, j, p] = k_j . (q_embed[p, pixel(j)] * scale)
    (reference ``WindowAttention`` einsums, NMP.py:258-262 — computed at
    pixel granularity, the candidate axis never enters the tables).

    Batched einsums over (wh, ww, head) with K = hd — the irreducible
    R*P*hd contraction, ~30x fewer FLOPs than the in-kernel selector
    algebra they replace (see the section header below).  The window
    split reshape is an adjacent-dim split (free); the kernel DMAs the
    compact [R, P] blocks per cell.

    qkv: [B, Hp, Wp, N, 3C] (already rolled), channel order (component,
    head, hd); k_embed/q_embed: [P, P, h, hd].
    Returns (qr, kr): [B, nwh, nwwB, h, R, P] in qkv.dtype.
    """
    B, Hp, Wp, N, C3 = qkv.shape
    h = num_heads
    hd = C3 // (3 * h)
    P = wh * ww
    WBww = WB * ww
    nwh, nwwB = Hp // wh, Wp // WBww
    R = wh * WBww * N
    # r5 HLO finding: per-einsum lhs repacks used to TRANSPOSE THE WHOLE
    # qkv tensor (113 MB at the production batch) at ~14 GB/s effective —
    # twice per layer, re-run under remat, doubled in the VJP: the single
    # largest copy cluster in the train step.  Mitigations:
    #   * lane-slice q|k off FIRST (cheap, 128-aligned) so v's third is
    #     never repacked;
    #   * ONE merged einsum over a stacked (ke, qe) table — one lhs repack
    #     for both qr and kr;
    #   * natural (batch-leading) output order + bf16 convert BEFORE the
    #     explicit permute to the kernel's block order.
    qk9 = qkv[..., :2 * h * hd].reshape(
        B, nwh, wh, nwwB, WB, ww, N, 2, h, hd)
    acc = dict(preferred_element_type=jnp.float32)
    if qkv.dtype == jnp.float32:
        acc["precision"] = lax.Precision.HIGHEST
    keW = (k_embed * scale).reshape(wh, ww, P, h, hd)
    qeW = (q_embed * scale).transpose(1, 0, 2, 3).reshape(wh, ww, P, h, hd)
    tbl = jnp.stack([keW, qeW], 0)              # [2, wh, ww, P, h, hd]
    qrkr = jnp.einsum("belfwxnghc,glxshc->lxghbefwns", qk9, tbl, **acc)
    # (l,x,g,h,b,e,f,w,n,s) -> (g,b,e,f,h,l,w,x,n,s), in the kernel dtype
    qrkr = qrkr.astype(qkv.dtype).transpose(2, 4, 5, 6, 3, 0, 7, 1, 8, 9)
    qrkr = qrkr.reshape(2, B, nwh, nwwB, h, R, P)
    return qrkr[0], qrkr[1]


def choose_column_block(nww, T, target=512):
    """Largest WB dividing nww with WB*T <= target (one grid cell spans WB
    adjacent windows along W so small windows still feed the MXU)."""
    wb = 1
    for cand in range(2, nww + 1):
        if nww % cand == 0 and cand * T <= target:
            wb = cand
    return wb


def hd_group_selectors(P, hd):
    """Constant 0/1 matrix for the value-table lane-group algebra.

    s_ch_c reduces a CHANNEL-major (c, s) flattened [*, hd*P] product over
    s per channel (``pltpu.repeat(attn_s, hd)`` is exactly the matching
    (c, s) lane expansion, see ``_attend_head``)."""
    c_ids_c = np.repeat(np.arange(hd), P)        # [hd*P] channel, c-major
    s_ch_c = (c_ids_c[:, None] == np.arange(hd)[None, :]).astype(np.float32)
    return s_ch_c                                # [PH, hd]


def _head_probs(q_s, k, qr, kr, selq, selst, cellmask, _P, cd):
    """Masked window-attention probabilities of one head (q PRE-scaled).

    qr/kr: [R, P] pixel-granular positional logits precomputed by the
    caller's batched einsums (``nmp.py window_positional_terms``) —
    qr[i, s] = (q_i * scale) . k_embed[pixel(i), s] and
    kr[j, p] = k_j . (q_embed[p, pixel(j)] * scale); the kernel only
    spreads them over token pairs with K=P selector dots.

    Shared by the forward kernels and the backward kernels' recompute —
    identical math keeps the rematerialized softmax bit-consistent with
    the forward.

    r5: the three logit terms are K-PACKED into ONE dot.  Each term's K is
    tiny (hd=32 or P<=36) against the MXU's 128-deep spine, so the three
    dots cost 3x the passes of one; concatenating along K computes
    q_i.k_j + sum_s qr[i,s]*selq[j,s] + sum_p selq[i,p]*kr[j,p] in a
    single [R, hd+2P] @ [R, hd+2P]^T pass set (note selst == selq^T, so
    the spread-over-j factor of the qr term IS selq).  Few-ulp f32
    accumulation-order drift vs the 3-dot form; within every parity tol."""
    sq = selq.astype(cd)
    lhs = jnp.concatenate([q_s, qr.astype(cd), sq], axis=1)
    rhs = jnp.concatenate([k, sq, kr.astype(cd)], axis=1)
    logits = lax.dot_general(lhs, rhs, (((1,), (1,)), ((), ())), **_P)

    logits = logits + cellmask
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _attend_head(q, k, v, qr, kr, ve_c, selq, selst, sch_c,
                 cellmask, scale, _P, cd, P, hd):
    """One head's windowed attention on [R, hd] tokens.

    cellmask: [R, R] f32 — candidate/cross-window base mask plus this grid
    cell's shifted-region mask, already summed.  qr/kr: [R, P] positional
    logit blocks (see ``_head_probs``); ve_c is the CHANNEL-major
    [R, hd*P] value table.  Returns [R, hd].
    """
    q = q.astype(cd) * scale
    k = k.astype(cd)
    attn = _head_probs(q, k, qr, kr, selq, selst, cellmask, _P, cd)
    # r5: attn@v and the per-key-pixel attention mass attn@selq are
    # N-PACKED into one dot (independent output lanes -> bit-identical to
    # the two separate dots; saves a full pass set over attn's R-deep K)
    ab = attn.astype(v.dtype)
    ov = lax.dot_general(ab, jnp.concatenate(
        [v, selq.astype(v.dtype)], axis=1), (((1,), (0,)), ((), ())), **_P)
    out = ov[:, :hd]
    # value-table term: attention mass per key pixel, channel-tiled, then
    # reduced per channel over the P lane groups
    attn_s = ov[:, hd:]                                       # [R, P]
    atile = pltpu.repeat(attn_s.astype(cd), hd, 1)            # [R, hd*P]
    out = out + lax.dot_general(
        ve_c.astype(cd) * atile, sch_c.astype(cd),
        (((1,), (0,)), ((), ())), **_P)
    return out


def _shifted_region_mask(s, row0, gh, gw, R, wh, ww, WB, N, Hp, Wp, neg):
    """Shifted-window region mask of one grid cell, from iota coordinates.

    Region boundaries on the rolled image sit at {Hp-wh, Hp-shift} on y and
    {Wp-ww, Wp-shift} on x (reference gen_shift_window_attn_mask,
    NMP.py:210-239); token i = (lr * WB*ww + wx) * N + n.  Hp is the GLOBAL
    padded height; under H-sharding each tile passes its global row offset
    ``row0`` so y is evaluated in global coordinates (VERDICT r2 item 2).
    """
    WBww = WB * ww

    def region(i):
        lr = i // (WBww * N)
        wx = (i // N) % WBww
        y = row0 + gh * wh + lr
        x = gw * WBww + wx
        ry = (y >= Hp - wh).astype(jnp.int32) + (y >= Hp - s).astype(jnp.int32)
        rx = (x >= Wp - ww).astype(jnp.int32) + (x >= Wp - s).astype(jnp.int32)
        return 3 * ry + rx

    reg_c = region(lax.broadcasted_iota(jnp.int32, (R, 1), 0))
    reg_r = region(lax.broadcasted_iota(jnp.int32, (1, R), 1))
    shifted = (s > 0) & (reg_c != reg_r)
    return jnp.where(shifted, neg, 0.0)


def _window_native_kernel(shift_ref, q_ref, k_ref, v_ref, qr_ref, kr_ref,
                          ve_ref, selq_ref, selst_ref,
                          sch_ref, mask_ref, out_ref, *, scale, wh,
                          ww, WB, N, Hp, Wp, neg, exact):
    # exact: f32 inputs demand HIGHEST (multi-pass) MXU precision to match
    # the XLA reference bit-for-bit-ish; bf16 inputs keep the dots in native
    # bf16 (single MXU pass, f32 accumulate via preferred_element_type).
    _P = dict(_F32, precision=lax.Precision.HIGHEST) if exact else _F32
    cd = jnp.float32 if exact else q_ref.dtype  # dot-input compute dtype
    q = q_ref[0, 0, 0]                                   # [R, hd]
    k = k_ref[0, 0, 0]
    v = v_ref[0, 0, 0]
    R, hd = q.shape
    P = wh * ww
    # candidate / cross-window base mask (a constant input block, fetched
    # once ever — reference gen_window_attn_mask, NMP.py:195-208) + this
    # cell's shifted-region mask
    cellmask = mask_ref[:] + _shifted_region_mask(
        shift_ref[0], shift_ref[1], pl.program_id(2), pl.program_id(3),
        R, wh, ww, WB, N, Hp, Wp, neg)
    out = _attend_head(q, k, v, qr_ref[0, 0, 0, 0], kr_ref[0, 0, 0, 0],
                       ve_ref[0], selq_ref[:], selst_ref[:],
                       sch_ref[:], cellmask, scale, _P, cd, P, hd)
    out_ref[0, 0, 0] = out.astype(out_ref.dtype)


def _window_native_kernel_direct(shift_ref, x_ref, qr_ref, kr_ref,
                                 ve_ref, selq_ref, selst_ref,
                                 sch_ref, mask_ref,
                                 out_ref, *, scale, wh, ww, WB, N, Hp, Wp,
                                 neg, exact, num_heads, hd):
    """Direct-packing variant: the qkv block arrives in the natural
    [wh, WB*ww*N, 3C] image layout (BlockSpec-addressed packing — no caller
    transpose; contiguous 3C-lane DMA runs), the row-major (lr, wx, n)
    order IS the kernel token order (leading-dim collapse restores
    [R, 3C]), heads are unrolled in-kernel via static hd-lane slices, and
    the output is written back in image layout."""
    _P = dict(_F32, precision=lax.Precision.HIGHEST) if exact else _F32
    cd = jnp.float32 if exact else x_ref.dtype
    h = num_heads
    x = x_ref[0, 0, :, 0]                           # [wh, WBww*N, 3C]
    R = wh * x.shape[1]
    x2 = x.reshape(R, 3 * h * hd)
    cellmask = mask_ref[:] + _shifted_region_mask(
        shift_ref[0], shift_ref[1], pl.program_id(1), pl.program_id(2),
        R, wh, ww, WB, N, Hp, Wp, neg)
    selq = selq_ref[:]
    selst = selst_ref[:]
    sch = sch_ref[:]
    P = wh * ww
    outs = []
    for i in range(h):                  # channel order (component, head, hd)
        q = x2[:, i * hd:(i + 1) * hd]
        k = x2[:, (h + i) * hd:(h + i + 1) * hd]
        v = x2[:, (2 * h + i) * hd:(2 * h + i + 1) * hd]
        outs.append(_attend_head(
            q, k, v, qr_ref[0, 0, 0, i], kr_ref[0, 0, 0, i], ve_ref[i],
            selq, selst, sch, cellmask, scale, _P, cd, P, hd))
    out = jnp.concatenate(outs, axis=-1)            # [R, h*hd]
    out_ref[0, 0, :, 0] = out.reshape(wh, x.shape[1], h * hd).astype(
        out_ref.dtype)


def window_attention_native(qkv, qr, kr, ve_flat, shift,
                            scale, wh, ww, WB, num_heads, candidate_mask,
                            neg=-1e9, interpret=None, row0=0, hp_total=None,
                            direct=True, partition=False):
    """Fused windowed NMP attention with in-kernel masks and caller-
    precomputed pixel-granular positional logits.

    Args:
      qkv: [B, Hp, Wp, N, 3*C] with channel order (component, head, hd)
        (already rolled for shifted layers).
      qr: [B, nwh, nwwB, h, R, P] per-cell positional logits
        ``(q_i * scale) . k_embed[pixel(i), s]`` (see ``nmp.py
        window_positional_terms`` — tiny batched einsums, K = hd).
      kr: [B, nwh, nwwB, h, R, P] per-cell positional logits
        ``k_j . (q_embed[p, pixel(j)] * scale)``.
      ve_flat: [h, R, hd*P] ``v_embed[pixel(i), s, head]`` CHANNEL-major
        ((c, s) lane order — ``pltpu.repeat(attn_s, hd)`` is exactly this
        expansion, see ``_attend_head``).
      shift: int32 scalar (traced ok) — shifted-window shift of this layer.
      candidate_mask: block different candidates of the same pixel
        (Inference stage; Refinement passes False).
      row0: int32 scalar (traced ok) — this tile's global row offset when
        H is sharded under shard_map (0 unsharded): the shifted-region mask
        is evaluated at global y = row0 + local y.
      hp_total: global padded image height (defaults to qkv's local Hp).
      partition: declare the batch dim SPMD-partitionable so a data-
        parallel jit keeps the batch sharded instead of replicating the
        opaque pallas call (partitioning.py).  Requires a STATIC row0
        (i.e. not under shard_map, where it must stay False anyway).
    Returns [B, Hp, Wp, N, h*hd] in qkv.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if partition:
        from .partitioning import shard_over_batch

        return shard_over_batch(
            _wan_core, (0, 0, 0, None, None, None,
                        None, None, None, None), 5,
            (qkv, qr, kr, ve_flat,
             jnp.asarray(shift, jnp.int32), jnp.asarray(row0, jnp.int32))
            + _wan_consts(wh, ww, WB, int(qkv.shape[3]),
                          int(qkv.shape[4]) // (3 * num_heads),
                          candidate_mask, neg),
            (("scale", scale), ("wh", wh), ("ww", ww), ("WB", WB),
             ("num_heads", num_heads), ("candidate_mask", candidate_mask),
             ("neg", neg), ("interpret", interpret),
             ("hp_total", hp_total), ("direct", direct)))
    consts = _wan_consts(wh, ww, WB, int(qkv.shape[3]),
                         int(qkv.shape[4]) // (3 * num_heads),
                         candidate_mask, neg)
    return _wan_core(qkv, qr, kr, ve_flat, shift, row0, *consts,
                     scale=scale, wh=wh, ww=ww, WB=WB, num_heads=num_heads,
                     candidate_mask=candidate_mask, neg=neg,
                     interpret=interpret, hp_total=hp_total,
                     direct=direct)


def _wan_consts(wh, ww, WB, N, hd, candidate_mask, neg):
    """The kernel's trace-time constant tables, built OUTSIDE the core so
    custom_partitioning sees them as (replicated) operands — it rejects
    functions closing over materialized jnp constants."""
    P = wh * ww
    s_ch_c = hd_group_selectors(P, hd)
    meta, sel = window_meta(wh, ww, WB, N)
    pix, win = meta[:, 0], meta[:, 1]
    basemask = np.where(win[:, None] != win[None, :], neg, 0.0)
    if candidate_mask:
        same_pix = (pix[:, None] == pix[None, :]) & \
            (win[:, None] == win[None, :])
        np.fill_diagonal(same_pix, False)
        basemask = basemask + np.where(same_pix, neg, 0.0)
    return (jnp.asarray(sel), jnp.asarray(np.ascontiguousarray(sel.T)),
            jnp.asarray(s_ch_c),
            jnp.asarray(basemask.astype(np.float32)))


def _wan_core(qkv, qr, kr, ve_flat, shift, row0,
              sel, selT, s_ch_c, basemask, *, scale, wh,
              ww, WB, num_heads, candidate_mask, neg, interpret, hp_total,
              direct):
    B, Hp, Wp, N, C3 = qkv.shape
    if hp_total is None:
        hp_total = Hp
    h = num_heads
    hd = C3 // (3 * h)
    P = wh * ww
    WBww = WB * ww
    R = wh * WBww * N
    nwh = Hp // wh
    nwwB = Wp // WBww
    G = B * nwh * nwwB

    PH = P * hd
    shift_arr = jnp.stack([jnp.asarray(shift, jnp.int32).reshape(()),
                           jnp.asarray(row0, jnp.int32).reshape(())])
    consts = (sel, selT, s_ch_c, basemask)

    if direct:
        # Direct-packing path (default): no host-side qkv transpose at all.
        # [B, Hp, Wp, N, 3C] -> [B, nwh, wh, nwwB, WBww*N, 3C] is a pure
        # adjacent-dim split/merge (free bitcast); the qkv block DMA runs
        # are whole 3C-lane rows (contiguous), heads unroll in-kernel, and
        # the output returns in image layout (another free reshape).  The
        # transposed path below cost ~3.8 ms/frame at KITTI shapes across
        # the NMP stages (profiled reshape/copy ops, 2026-08-19).
        x = qkv.reshape(B, nwh, wh, nwwB, WBww * N, C3)
        pos = pl.BlockSpec((1, 1, 1, h, R, P),
                           lambda b, gh, gw: (b, gh, gw, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        tbl = pl.BlockSpec((h, R, hd * P), lambda b, gh, gw: (0, 0, 0),
                           memory_space=pltpu.VMEM)
        cst = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda b, gh, gw: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _window_native_kernel_direct, scale=scale, wh=wh, ww=ww, WB=WB,
            N=N, Hp=hp_total, Wp=Wp, neg=neg,
            exact=qkv.dtype == jnp.float32, num_heads=h, hd=hd)
        out = pl.pallas_call(
            kernel,
            grid=(B, nwh, nwwB),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, wh, 1, WBww * N, C3),
                             lambda b, gh, gw: (b, gh, 0, gw, 0, 0),
                             memory_space=pltpu.VMEM),
                pos, pos, tbl,
                cst((R, P)), cst((P, R)),
                cst((PH, hd)),
                cst((R, R)),
            ],
            out_specs=pl.BlockSpec((1, 1, wh, 1, WBww * N, h * hd),
                                   lambda b, gh, gw: (b, gh, 0, gw, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (B, nwh, wh, nwwB, WBww * N, h * hd), qkv.dtype),
            interpret=interpret,
        )(shift_arr, x, qr, kr, ve_flat, *consts)
        return out.reshape(B, Hp, Wp, N, h * hd)

    # transposed path (A/B reference): one fused XLA transpose packs tokens
    # to [3, h, G, R, hd]; the kernel reads full-dim per-head blocks
    x = qkv.reshape(B, nwh, wh, nwwB, WBww, N, 3, h, hd)
    x = x.transpose(6, 7, 0, 1, 3, 2, 4, 5, 8)
    x = x.reshape(3, h, G, R, hd)

    def comp_spec(comp):
        return pl.BlockSpec(
            (1, 1, 1, R, hd),
            lambda b, i, gh, gw, comp=comp:
            (comp, i, (b * nwh + gh) * nwwB + gw, 0, 0),
            memory_space=pltpu.VMEM)

    pos = pl.BlockSpec((1, 1, 1, 1, R, P),
                       lambda b, i, gh, gw: (b, gh, gw, i, 0, 0),
                       memory_space=pltpu.VMEM)
    tbl = pl.BlockSpec((1, R, hd * P), lambda b, i, gh, gw: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    cst = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, i, gh, gw: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, 1, 1, R, hd),
        lambda b, i, gh, gw: (i, 0, (b * nwh + gh) * nwwB + gw, 0, 0),
        memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _window_native_kernel, scale=scale, wh=wh, ww=ww, WB=WB, N=N,
        Hp=hp_total, Wp=Wp, neg=neg, exact=qkv.dtype == jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(B, h, nwh, nwwB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            comp_spec(0), comp_spec(1), comp_spec(2),
            pos, pos, tbl,
            cst((R, P)), cst((P, R)),
            cst((PH, hd)),
            cst((R, R)),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((h, 1, G, R, hd), qkv.dtype),
        interpret=interpret,
    )(shift_arr, x, x, x, qr, kr, ve_flat, *consts)

    out = out.reshape(h, B, nwh, nwwB, wh, WBww, N, hd)
    out = out.transpose(1, 2, 4, 3, 5, 6, 0, 7)
    return out.reshape(B, Hp, Wp, N, h * hd)


def window_attention_native_reference(qkv, qr, kr, ve_flat, shift,
                                      scale, wh, ww, WB,
                                      num_heads, candidate_mask, neg=-1e9,
                                      row0=0, hp_total=None):
    """jnp golden of :func:`window_attention_native` (tests + VJP backward).

    Mirrors the kernel math exactly, including the coordinate-derived masks
    (evaluated at global y = row0 + local y against the global hp_total).
    qr/kr: [B, nwh, nwwB, h, R, P] caller-precomputed positional logits
    (``nmp.py window_positional_terms``).
    """
    B, Hp, Wp, N, C3 = qkv.shape
    if hp_total is None:
        hp_total = Hp
    h = num_heads
    hd = C3 // (3 * h)
    P = wh * ww
    WBww = WB * ww
    R = wh * WBww * N
    nwh, nwwB = Hp // wh, Wp // WBww
    f32 = jnp.float32
    x = qkv.reshape(B, nwh, wh, nwwB, WBww, N, 3, h, hd)
    x = x.transpose(6, 7, 0, 1, 3, 2, 4, 5, 8)   # [3, h, B, nwh, nwwB, ...]
    x = x.reshape(3, h, B * nwh * nwwB, R, hd)
    meta, sel = window_meta(wh, ww, WB, N)
    q = x[0].astype(f32) * scale
    k = x[1].astype(f32)
    v = x[2]
    logits = jnp.einsum("hgic,hgjc->hgij", q, k,
                        preferred_element_type=f32)
    ve = ve_flat.reshape(h, R, hd, P).astype(f32)  # channel-major
    qr_g = qr.reshape(B * nwh * nwwB, h, R, P).transpose(1, 0, 2, 3)
    kr_g = kr.reshape(B * nwh * nwwB, h, R, P).transpose(1, 0, 2, 3)
    logits = logits + jnp.einsum("hgis,js->hgij", qr_g.astype(f32),
                                 jnp.asarray(sel))
    logits = logits + jnp.einsum("ip,hgjp->hgij", jnp.asarray(sel),
                                 kr_g.astype(f32))

    pix, win, lr, wx = (np.asarray(meta[:, c]) for c in range(4))
    mask = np.where(win[:, None] != win[None, :], neg, 0.0)
    if candidate_mask:
        same_pix = (pix[:, None] == pix[None, :]) & \
            (win[:, None] == win[None, :])
        np.fill_diagonal(same_pix, False)
        mask = mask + np.where(same_pix, neg, 0.0)
    mask = jnp.asarray(mask, f32)
    # per-(gh, gw) shifted-region mask
    ghs = np.arange(nwh).repeat(nwwB)
    gws = np.tile(np.arange(nwwB), nwh)
    y = jnp.asarray(ghs[:, None] * wh + lr[None, :]) \
        + jnp.asarray(row0, jnp.int32)           # [nW_groups, R] global rows
    xg = gws[:, None] * WBww + wx[None, :]
    s = jnp.asarray(shift, jnp.int32)

    def region(y, x):
        ry = jnp.asarray(y >= hp_total - wh, jnp.int32) + \
            jnp.asarray(y >= hp_total - s, jnp.int32)
        rx = (x >= Wp - ww).astype(np.int32) + \
            jnp.asarray(x >= Wp - s, jnp.int32)
        return 3 * ry + rx

    reg = region(y, xg)                           # [G0, R]
    shifted = (s > 0) & (reg[:, :, None] != reg[:, None, :])
    gmask = mask[None] + jnp.where(shifted, neg, 0.0)   # [G0, R, R]
    gmask = jnp.tile(gmask, (B, 1, 1))
    logits = logits + gmask[None]
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hgij,hgjc->hgic", attn.astype(v.dtype), v,
                     preferred_element_type=f32)
    attn_s = jnp.einsum("hgij,js->hgis", attn, jnp.asarray(sel))
    out = out + jnp.einsum("hgis,hics->hgic", attn_s, ve)
    out = out.astype(qkv.dtype)
    out = out.reshape(h, B, nwh, nwwB, wh, WBww, N, hd)
    out = out.transpose(1, 2, 4, 3, 5, 6, 0, 7)
    return out.reshape(B, Hp, Wp, N, h * hd)


# --------------------------------------------------------------------------- #
# Window-native attention: fused Pallas BACKWARD
# --------------------------------------------------------------------------- #
#
# Training previously rematerialized through the jnp reference above: the
# backward paid the DENSE forward twice (linearize + VJP) including the
# [B*G0, R, R] f32 mask/attention tensors in HBM that the forward kernel
# specifically eliminated (the dense formulation measured ~18% slower
# full-model; the train step runs it 2x per layer).
# ``_wan_bwd_fused_kernel`` gives the backward the same treatment: per
# (head, grid-cell) it recomputes the attention probabilities ONCE with
# ``_head_probs`` (identical math = bit-consistent remat) and emits the
# d(q,k,v) blocks (head-major; one fused transpose reassembles image
# layout), the per-cell [R, P] positional-logit cotangents d(qr)/d(kr)
# (plain block outputs — the caller's einsum VJP carries them to the
# table and the positional d(q)/d(k) halves), and the f32-accumulated
# value-table cotangent d(ve) (constant index map over the trailing grid
# dims — sequential revisit accumulation).  Under batch partitioning the
# d(ve) accumulator gains a leading batch dim and the cross-shard
# reduction happens in the (sharded) ``sum`` outside.
#
# All contractions are 2-D dots mirroring the forward's selector algebra;
# the backward needs two more constant 0/1 selectors (``_bwd_selectors``):
# the transposed channel expansion sch_cT and the (c, s)-major lane ->
# pixel reducer p_red for the value-table branch.

def _bwd_selectors(P, hd):
    """Constant selectors for the backward's value-table lane algebra."""
    PH = P * hd
    c_ids_c = np.repeat(np.arange(hd), P)    # (c, s) c-major lane -> channel
    s_ids_c = np.tile(np.arange(P), hd)      # (c, s) c-major lane -> pixel
    sch_cT = (np.arange(hd)[:, None] == c_ids_c[None, :]).astype(np.float32)
    p_red = (s_ids_c[:, None] == np.arange(P)[None, :]).astype(np.float32)
    assert sch_cT.shape == (hd, PH) and p_red.shape == (PH, P)
    return (jnp.asarray(sch_cT), jnp.asarray(p_red))


def _bwd_head_core(q_s, k, v, qr, kr, ve_c, g, selq, selst,
                   sch_cT, p_red, cellmask, scale, _P, cd, P, hd,
                   want_dx, want_tbl, emit_tbl=None,
                   ke_c=None, qe_c=None, emit_ke=None, emit_qe=None):
    """One head's backward on [R, hd] tokens (q_s PRE-scaled, like fwd).

    Returns (dq, dk, dv, dqr, dkr, dve_c).  dqr/dkr are the [R, P]
    cotangents of the caller-precomputed positional-logit blocks — the
    caller's einsum VJP turns them into d(table) and the positional halves
    of d(q)/d(k) (the in-kernel [R, P*hd] expansions of the old
    formulation are gone).  With ``emit_tbl(val)`` the [R, hd*P] value-
    table cotangent is handed off as soon as computed and None returned in
    its slot (scoped-VMEM budget).  d(q) is the cotangent of the UNSCALED
    q; d(qr)/d(kr) of the scale-folded blocks exactly as passed.

    FUSED-POSITIONAL mode (r5, ``ke_c``/``qe_c`` given): dqr/dkr never
    leave the kernel.  Their d(q)/d(k) halves are folded in-kernel via the
    channel-major lane algebra (``ke_c[i, c*P+s] = scale *
    k_embed[pix(i), s, c]``, ``qe_c[j, c*P+p] = scale *
    q_embed[p, pix(j), c]`` — same gather-by-pixel layout as ``ve_c``),
    and the positional-TABLE cotangents are accumulated via
    ``emit_ke``/``emit_qe`` as [P, hd*P] blocks:
    ``d_ke[p, c*P+s] = sum_i selst[p, i] q_s[i, c] dqr[i, s]`` (q_s
    pre-scaled, so this IS d(k_embed) — the qr scale folds cancel) and
    ``d_qe[p, c*P+t] = sum_j dkr[j, p] k[j, c] selq[j, t]`` (raw k — the
    caller multiplies by ``scale`` once).  This replaces the caller-side
    einsum VJP whose d(qk) output repack (h, c lane interleave at hd < 128)
    ran at ~14 GB/s effective and whose dqr/dkr operands cost two
    qr-sized HBM round trips per backward call (r5 train trace).
    """
    attn = _head_probs(q_s, k, qr, kr, selq, selst, cellmask, _P, cd)
    attn_c = attn.astype(cd)
    g = g.astype(cd)
    # value-table branch: gexp[i, c*P+s] = g[i, c] (channel-major lanes).
    # The [R, hd*P] transients are kept in the COMPUTE dtype (bf16 on the
    # production path): the head-unrolled direct kernel holds several per
    # head and f32 copies blew Mosaic's 16 MB scoped-vmem stack by 2.2 MB
    # at the inference-NMP production shape (d(ve) still ACCUMULATES f32
    # in its output ref — only the per-cell addend is bf16-rounded, the
    # same rounding class as the bf16 dots feeding it).
    gexp = lax.dot_general(g, sch_cT.astype(cd),
                           (((1,), (0,)), ((), ())),
                           **_P).astype(cd)                    # [R, hd*P]
    datt_s = lax.dot_general((gexp * ve_c.astype(cd)), p_red.astype(cd),
                             (((1,), (0,)), ((), ())), **_P)   # [R, P]
    dve_c = None
    if want_tbl:
        attn_sT = lax.dot_general(attn_c, selq.astype(cd),
                                  (((1,), (0,)), ((), ())),
                                  **_P).astype(cd)             # [R, P]
        dve_c = gexp * pltpu.repeat(attn_sT, hd, 1)
        if emit_tbl is not None:
            emit_tbl(dve_c)
            dve_c = None
    # d(attn) = g v^T + spread of the per-pixel value-table mass — ONE
    # K-packed dot (r5, same argument as _head_probs: tiny per-term K vs
    # the MXU's 128-deep spine; selst == selq^T so the spread factor along
    # K is selq)
    dattn = lax.dot_general(
        jnp.concatenate([g, datt_s], axis=1),
        jnp.concatenate([v.astype(cd), selq.astype(cd)], axis=1),
        (((1,), (1,)), ((), ())), **_P)
    # softmax backward
    dlog = attn_c * (dattn - jnp.sum(dattn * attn_c, axis=-1, keepdims=True))
    # positional-logit branches (fwd: logits += qr @ selst + selq @ kr^T);
    # N-packed with d(q)/d(k) when those are wanted — independent output
    # lanes, bit-identical to the separate dots
    dq = dk = dv = None
    if want_dx:
        dqq = lax.dot_general(
            dlog, jnp.concatenate([k, selq.astype(k.dtype)], axis=1),
            (((1,), (0,)), ((), ())), **_P)
        dq, dqr = dqq[:, :hd] * scale, dqq[:, hd:]
        dkk = lax.dot_general(
            dlog, jnp.concatenate([q_s, selq.astype(q_s.dtype)], axis=1),
            (((0,), (0,)), ((), ())), **_P)
        dk, dkr = dkk[:, :hd], dkk[:, hd:]
        dv = lax.dot_general(attn_c, g, (((0,), (0,)), ((), ())), **_P)
    else:
        dqr = lax.dot_general(dlog, selq, (((1,), (0,)), ((), ())), **_P)
        dkr = lax.dot_general(dlog, selq, (((0,), (0,)), ((), ())), **_P)
    if ke_c is not None:
        # positional d(q)/d(k) halves: spread dqr/dkr over channels
        # ((c, s) c-major block tile), gate by the per-token gathered
        # tables, reduce the P lane groups per channel
        schT = sch_cT.astype(cd)
        dqr_e = pltpu.repeat(dqr.astype(cd), hd, 1)         # [R, hd*P]
        dq = dq + lax.dot_general(dqr_e * ke_c.astype(cd), schT,
                                  (((1,), (1,)), ((), ())), **_P)
        dkr_e = pltpu.repeat(dkr.astype(cd), hd, 1)
        dk = dk + lax.dot_general(dkr_e * qe_c.astype(cd), schT,
                                  (((1,), (1,)), ((), ())), **_P)
        # table cotangents, accumulated across grid revisits by the caller
        qexp = lax.dot_general(q_s, schT, (((1,), (0,)), ((), ())), **_P)
        emit_ke(lax.dot_general(selst.astype(cd),
                                qexp.astype(cd) * dqr_e,
                                (((1,), (0,)), ((), ())), **_P))  # [P, PH]
        kexp = lax.dot_general(k, schT, (((1,), (0,)), ((), ())), **_P)
        sqe = pltpu.repeat(selq.astype(cd), hd, 1)          # [R, hd*P]
        emit_qe(lax.dot_general(dkr.astype(cd),
                                kexp.astype(cd) * sqe,
                                (((0,), (0,)), ((), ())), **_P))  # [P, PH]
        dqr = dkr = None
    return dq, dk, dv, dqr, dkr, dve_c


def _wan_bwd_fused_kernel(shift_ref, q_ref, k_ref, v_ref, g_ref, qr_ref,
                          kr_ref, ve_ref, selq_ref, selst_ref,
                          schT_ref, pred_ref, mask_ref,
                          dq_ref, dk_ref, dv_ref, dqr_ref, dkr_ref,
                          dve_ref, *, scale, wh,
                          ww, WB, N, Hp, Wp, neg, exact, hd, batch_out):
    """One (head, grid-cell) backward: d(q,k,v) blocks (head-major), the
    per-cell d(qr)/d(kr) positional-logit cotangents, and the accumulated
    d(ve) — off a SINGLE probability recompute.

    An earlier two-kernel split (dx with heads unrolled + a separate
    table-grad kernel) recomputed the attention probabilities twice per
    (head, cell); merging them was worth ~9% of the whole train step
    (r4 trace: the two bwd pallas regions carried 203 of 888 ms).
    dve accumulates f32 across sequential grid revisits — per head
    (``batch_out=False``) or per (batch, head) partials whose sharded sum
    outside carries the cross-shard reduction (``batch_out=True``).
    """
    _P = dict(_F32, precision=lax.Precision.HIGHEST) if exact else _F32
    cd = jnp.float32 if exact else q_ref.dtype
    q = q_ref[0, 0, 0, :, 0]                          # [wh, T, hd]
    T = q.shape[1]
    R = wh * T
    q_s = q.reshape(R, hd).astype(cd) * scale
    k = k_ref[0, 0, 0, :, 0].reshape(R, hd).astype(cd)
    v = v_ref[0, 0, 0, :, 0].reshape(R, hd)
    g = g_ref[0, 0, 0, :, 0].reshape(R, hd)
    cellmask = mask_ref[:] + _shifted_region_mask(
        shift_ref[0], shift_ref[1], pl.program_id(2), pl.program_id(3),
        R, wh, ww, WB, N, Hp, Wp, neg)
    P = wh * ww
    if batch_out:
        first = (pl.program_id(2) == 0) & (pl.program_id(3) == 0)
    else:
        first = ((pl.program_id(1) == 0) & (pl.program_id(2) == 0)
                 & (pl.program_id(3) == 0))

    def emit_tbl(val):
        # immediate predicated write/accumulate of the [R, hd*P] f32
        # value-table cotangent (scoped-VMEM budget)
        val = val.astype(jnp.float32)

        @pl.when(first)
        def _():
            if batch_out:
                dve_ref[0, 0] = val
            else:
                dve_ref[0] = val

        @pl.when(jnp.logical_not(first))
        def _():
            if batch_out:
                dve_ref[0, 0] += val
            else:
                dve_ref[0] += val

    dq, dk, dv, dqr, dkr, _ = _bwd_head_core(
        q_s, k, v, qr_ref[0, 0, 0, 0], kr_ref[0, 0, 0, 0], ve_ref[0], g,
        selq_ref[:], selst_ref[:],
        schT_ref[:], pred_ref[:], cellmask, scale, _P, cd, P, hd,
        True, True, emit_tbl=emit_tbl)
    sh = (wh, T, hd)
    dq_ref[0, 0, 0, :, 0] = dq.reshape(sh).astype(dq_ref.dtype)
    dk_ref[0, 0, 0, :, 0] = dk.reshape(sh).astype(dk_ref.dtype)
    dv_ref[0, 0, 0, :, 0] = dv.reshape(sh).astype(dv_ref.dtype)
    dqr_ref[0, 0, 0, 0] = dqr.astype(dqr_ref.dtype)
    dkr_ref[0, 0, 0, 0] = dkr.astype(dkr_ref.dtype)


def _acc_write(ref, val, first, batch_out):
    """Predicated first-write / accumulate into a revisited output block."""
    val = val.astype(jnp.float32)

    @pl.when(first)
    def _():
        if batch_out:
            ref[0, 0] = val
        else:
            ref[0] = val

    @pl.when(jnp.logical_not(first))
    def _():
        if batch_out:
            ref[0, 0] += val
        else:
            ref[0] += val


def _wan_bwd_fused_pos_kernel(shift_ref, q_ref, k_ref, v_ref, g_ref, qr_ref,
                              kr_ref, ve_ref, ke_ref, qe_ref, selq_ref,
                              selst_ref, schT_ref, pred_ref, mask_ref,
                              dq_ref, dk_ref, dv_ref, dke_ref, dqe_ref,
                              dve_ref, *, scale, wh, ww, WB, N, Hp, Wp, neg,
                              exact, hd, batch_out):
    """Fully-fused positional backward (r5): like ``_wan_bwd_fused_kernel``
    but dqr/dkr never leave the kernel — their d(q)/d(k) halves fold into
    the dq/dk outputs via the gathered ``ke_c``/``qe_c`` tables, and the
    positional-TABLE cotangents accumulate in-kernel ([h, P, hd*P] f32,
    same sequential-revisit scheme as d(ve)).  Kills the caller-side
    einsum VJP: two qr-sized HBM round trips plus the d(qk) output repack
    that the r5 train trace measured at ~14 GB/s effective.
    """
    _P = dict(_F32, precision=lax.Precision.HIGHEST) if exact else _F32
    cd = jnp.float32 if exact else q_ref.dtype
    q = q_ref[0, 0, 0, :, 0]                          # [wh, T, hd]
    T = q.shape[1]
    R = wh * T
    q_s = q.reshape(R, hd).astype(cd) * scale
    k = k_ref[0, 0, 0, :, 0].reshape(R, hd).astype(cd)
    v = v_ref[0, 0, 0, :, 0].reshape(R, hd)
    g = g_ref[0, 0, 0, :, 0].reshape(R, hd)
    cellmask = mask_ref[:] + _shifted_region_mask(
        shift_ref[0], shift_ref[1], pl.program_id(2), pl.program_id(3),
        R, wh, ww, WB, N, Hp, Wp, neg)
    P = wh * ww
    if batch_out:
        first = (pl.program_id(2) == 0) & (pl.program_id(3) == 0)
    else:
        first = ((pl.program_id(1) == 0) & (pl.program_id(2) == 0)
                 & (pl.program_id(3) == 0))

    dq, dk, dv, _, _, _ = _bwd_head_core(
        q_s, k, v, qr_ref[0, 0, 0, 0], kr_ref[0, 0, 0, 0], ve_ref[0], g,
        selq_ref[:], selst_ref[:],
        schT_ref[:], pred_ref[:], cellmask, scale, _P, cd, P, hd,
        True, True,
        emit_tbl=lambda val: _acc_write(dve_ref, val, first, batch_out),
        ke_c=ke_ref[0], qe_c=qe_ref[0],
        emit_ke=lambda val: _acc_write(dke_ref, val, first, batch_out),
        emit_qe=lambda val: _acc_write(dqe_ref, val, first, batch_out))
    sh = (wh, T, hd)
    dq_ref[0, 0, 0, :, 0] = dq.reshape(sh).astype(dq_ref.dtype)
    dk_ref[0, 0, 0, :, 0] = dk.reshape(sh).astype(dk_ref.dtype)
    dv_ref[0, 0, 0, :, 0] = dv.reshape(sh).astype(dv_ref.dtype)


def _wan_bwd_kernel_direct(shift_ref, x_ref, g_ref, qr_ref, kr_ref, ve_ref,
                           selq_ref, selst_ref, schT_ref, pred_ref,
                           mask_ref, dx_ref, dqr_ref, dkr_ref, dve_ref, *,
                           scale, wh, ww, WB, N, Hp, Wp, neg, exact,
                           num_heads, hd, batch_out, head0=0,
                           num_heads_total=None):
    """Direct-packing fused backward (r5): qkv and g arrive in natural
    image layout ([wh, WB*ww*N, 3C] / [.., C] blocks — whole 3C-lane DMA
    runs, no caller transpose), heads unroll in-kernel via static hd-lane
    slices (same idiom as ``_window_native_kernel_direct``), and d(qkv)
    is written back in image layout — eliminating the head-major qkv/g
    feed transposes and the d(qkv) concat+transpose reassembly of the
    transposed path (the r5 train trace put the backward's copy/layout
    class at 155 ms of the 833 ms step, led by exactly these).
    d(ve) accumulates [h, R, hd*P] f32 across sequential (b, gh, gw)
    revisits (per-sample [B, ...] partials under ``batch_out``).

    ``head0``/``num_heads_total``: when the caller splits the heads over
    several pallas_calls to fit Mosaic's 16 MB scoped-vmem stack (the
    full-head variant needs ~18 MB at the inference-NMP production
    shape), this call processes heads [head0, head0 + num_heads) of the
    ``num_heads_total`` packed in x's 3C lanes, and writes a COMPACT
    [.., 3 * num_heads * hd] d(x) block (its heads are contiguous per
    component; the caller reassembles with one lane concat)."""
    _P = dict(_F32, precision=lax.Precision.HIGHEST) if exact else _F32
    cd = jnp.float32 if exact else x_ref.dtype
    h = num_heads
    ht = num_heads_total if num_heads_total is not None else h
    x = x_ref[0, 0, :, 0]                           # [wh, WBww*N, 3C]
    T = x.shape[1]
    R = wh * T
    x2 = x.reshape(R, 3 * ht * hd)
    gb = g_ref[0, 0, :, 0].reshape(R, ht * hd)
    cellmask = mask_ref[:] + _shifted_region_mask(
        shift_ref[0], shift_ref[1], pl.program_id(1), pl.program_id(2),
        R, wh, ww, WB, N, Hp, Wp, neg)
    selq = selq_ref[:]
    selst = selst_ref[:]
    schT = schT_ref[:]
    pred = pred_ref[:]
    P = wh * ww
    if batch_out:
        first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    else:
        first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                 & (pl.program_id(2) == 0))
    dqs, dks, dvs = [], [], []
    for i in range(h):                  # channel order (component, head, hd)
        j = head0 + i
        q_s = x2[:, j * hd:(j + 1) * hd].astype(cd) * scale
        k = x2[:, (ht + j) * hd:(ht + j + 1) * hd].astype(cd)
        v = x2[:, (2 * ht + j) * hd:(2 * ht + j + 1) * hd]
        g1 = gb[:, j * hd:(j + 1) * hd]

        def emit_tbl(val, i=i):
            val = val.astype(jnp.float32)

            @pl.when(first)
            def _():
                if batch_out:
                    dve_ref[0, i] = val
                else:
                    dve_ref[i] = val

            @pl.when(jnp.logical_not(first))
            def _():
                if batch_out:
                    dve_ref[0, i] += val
                else:
                    dve_ref[i] += val

        dq, dk, dv, dqr, dkr, _ = _bwd_head_core(
            q_s, k, v, qr_ref[0, 0, 0, i], kr_ref[0, 0, 0, i], ve_ref[i],
            g1, selq, selst, schT, pred, cellmask, scale, _P, cd, P, hd,
            True, True, emit_tbl=emit_tbl)
        dqr_ref[0, 0, 0, i] = dqr.astype(dqr_ref.dtype)
        dkr_ref[0, 0, 0, i] = dkr.astype(dkr_ref.dtype)
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    dx2 = jnp.concatenate(dqs + dks + dvs, axis=-1)   # [R, 3C]
    dx_ref[0, 0, :, 0] = dx2.reshape(wh, T, 3 * h * hd).astype(dx_ref.dtype)


def _wan_bwd_core(g, qkv, qr, kr, ve_flat, shift, row0,
                  sel, selT, s_ch_c, basemask, sch_cT,
                  p_red, *, scale, wh, ww, WB, num_heads, candidate_mask,
                  neg, interpret, hp_total, batch_out, pos_tables=None,
                  direct=True):
    """The fused backward pallas_call; returns (dqkv, dqr, dkr, dve).

    dqr/dkr: [B, nwh, nwwB, h, R, P] per-cell block outputs.  dve:
    [h, R, hd*P] fully accumulated (batch_out=False) or [B, h, R, hd*P]
    per-sample partials (batch_out=True — the caller's sharded sum
    carries the cross-shard reduction under SPMD).

    With ``pos_tables=(ke_c, qe_c)`` ([h, R, hd*P] gathered positional
    tables) the FULLY-fused variant runs instead: returns
    (dqkv, dke, dqe, dve) where dke/dqe are the [h, P, hd*P]
    positional-table cotangent accumulators ([B, h, P, hd*P] partials
    under ``batch_out``) and dqr/dkr never touch HBM.
    """
    B, Hp, Wp, N, C3 = qkv.shape
    if hp_total is None:
        hp_total = Hp
    h = num_heads
    hd = C3 // (3 * h)
    P = wh * ww
    WBww = WB * ww
    T = WBww * N
    R = wh * T
    PH = P * hd
    nwh = Hp // wh
    nwwB = Wp // WBww
    exact = qkv.dtype == jnp.float32

    shift_arr = jnp.stack([jnp.asarray(shift, jnp.int32).reshape(()),
                           jnp.asarray(row0, jnp.int32).reshape(())])

    if direct and pos_tables is None:
        # Direct-packing backward (r5, default): image-layout blocks in
        # AND out, heads unrolled in-kernel — no head-major feed
        # transposes, no d(qkv) reassembly (see _wan_bwd_kernel_direct).
        #
        # Head-group splitting: the all-head kernel needs ~18 MB of
        # Mosaic scoped vmem at the inference-NMP production shape
        # (dve [h, R, PH] f32 block 5.3 MB + ve 2.65 MB + per-head
        # [R, PH] stack) vs the 16 MB limit, so the heads are split over
        # G pallas_calls with PYTHON-static head offsets: each call DMAs
        # the full x/g blocks (whole-lane runs, re-fetched G times —
        # cheap) but carries only its heads' tables/accumulators and
        # writes a COMPACT d(x) lane block; one lane concat reassembles
        # (heads of a group are contiguous in the (component, head, hd)
        # channel order).
        itm = 2 if qkv.dtype == jnp.bfloat16 else 4

        def est(hpc):
            fixed = ((2 * C3 + h * hd) * wh * T * itm       # x, dx, g
                     + 4 * hpc * R * P * itm                 # qr/kr/dqr/dkr
                     + hpc * R * PH * (itm + 4)              # ve + dve
                     + (2 * R * P + hd * PH + PH * P + R * R) * 4)
            stack = 8 * R * PH * itm + 6 * R * R * 4
            return fixed + stack

        import os as _os

        G = int(_os.environ.get("NMRF_BWD_HEAD_GROUPS", "0"))
        if G <= 0 or h % G != 0:
            G = 1
            while est(h // G) > 15e6 and G < h and h % (2 * G) == 0:
                G *= 2
        hpc = h // G
        x = qkv.reshape(B, nwh, wh, nwwB, T, C3)
        gx = g.reshape(B, nwh, wh, nwwB, T, h * hd)
        xspec = pl.BlockSpec((1, 1, wh, 1, T, C3),
                             lambda b, gh, gw: (b, gh, 0, gw, 0, 0),
                             memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((1, 1, wh, 1, T, h * hd),
                             lambda b, gh, gw: (b, gh, 0, gw, 0, 0),
                             memory_space=pltpu.VMEM)
        dxspec = pl.BlockSpec((1, 1, wh, 1, T, 3 * hpc * hd),
                              lambda b, gh, gw: (b, gh, 0, gw, 0, 0),
                              memory_space=pltpu.VMEM)
        posd = pl.BlockSpec((1, 1, 1, hpc, R, P),
                            lambda b, gh, gw: (b, gh, gw, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        tbld = pl.BlockSpec((hpc, R, PH), lambda b, gh, gw: (0, 0, 0),
                            memory_space=pltpu.VMEM)
        cstd = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda b, gh, gw: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        if batch_out:
            dve_spec = pl.BlockSpec((1, hpc, R, PH),
                                    lambda b, gh, gw: (b, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
            dve_shape = jax.ShapeDtypeStruct((B, hpc, R, PH), jnp.float32)
        else:
            dve_spec = pl.BlockSpec((hpc, R, PH),
                                    lambda b, gh, gw: (0, 0, 0),
                                    memory_space=pltpu.VMEM)
            dve_shape = jax.ShapeDtypeStruct((hpc, R, PH), jnp.float32)
        dpos = jax.ShapeDtypeStruct((B, nwh, nwwB, hpc, R, P), qr.dtype)
        dxs, dqrs, dkrs, dves = [], [], [], []
        for gi in range(G):
            kernel = functools.partial(
                _wan_bwd_kernel_direct, scale=scale, wh=wh, ww=ww, WB=WB,
                N=N, Hp=hp_total, Wp=Wp, neg=neg, exact=exact,
                num_heads=hpc, hd=hd, batch_out=batch_out,
                head0=gi * hpc, num_heads_total=h)
            h0, h1 = gi * hpc, (gi + 1) * hpc
            dx_g, dqr_g, dkr_g, dve_g = pl.pallas_call(
                kernel,
                grid=(B, nwh, nwwB),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    xspec, gspec, posd, posd, tbld,
                    cstd((R, P)), cstd((P, R)),
                    cstd((hd, PH)), cstd((PH, P)), cstd((R, R)),
                ],
                out_specs=(dxspec, posd, posd, dve_spec),
                out_shape=(jax.ShapeDtypeStruct(
                    (B, nwh, wh, nwwB, T, 3 * hpc * hd), qkv.dtype),
                    dpos, dpos, dve_shape),
                interpret=interpret,
            )(shift_arr, x, gx, qr[:, :, :, h0:h1], kr[:, :, :, h0:h1],
              ve_flat[h0:h1], sel, selT, sch_cT, p_red, basemask)
            dxs.append(dx_g)
            dqrs.append(dqr_g)
            dkrs.append(dkr_g)
            dves.append(dve_g)
        if G == 1:
            dx, dqr_o, dkr_o, dve = dxs[0], dqrs[0], dkrs[0], dves[0]
        else:
            # reassemble lanes: each group's compact [.., 3, hpc*hd]
            # channels are contiguous per component in global head order
            parts = [d.reshape(B, nwh, wh, nwwB, T, 3, hpc * hd)
                     for d in dxs]
            dx = jnp.concatenate(parts, axis=-1).reshape(
                B, nwh, wh, nwwB, T, C3)
            dqr_o = jnp.concatenate(dqrs, axis=3)
            dkr_o = jnp.concatenate(dkrs, axis=3)
            dve = jnp.concatenate(dves, axis=1 if batch_out else 0)
        return dx.reshape(B, Hp, Wp, N, C3), dqr_o, dkr_o, dve

    # head-major feeds (transposed A/B path): Mosaic requires the last two
    # block dims full (or (8, 128)-aligned), so the per-head channel
    # selection must be a LEADING blocked axis — two qkv-sized transposes
    # per backward call
    x8 = qkv.reshape(B, nwh, wh, nwwB, T, 3 * h, hd).transpose(
        5, 0, 1, 2, 3, 4, 6)                    # [3h, B, nwh, wh, nwwB, T, hd]
    g8 = g.reshape(B, nwh, wh, nwwB, T, h, hd).transpose(
        5, 0, 1, 2, 3, 4, 6)                    # [h, B, nwh, wh, nwwB, T, hd]
    blk7 = (1, 1, 1, wh, 1, T, hd)
    if batch_out:
        grid = (B, h, nwh, nwwB)
        comp = lambda c: pl.BlockSpec(  # noqa: E731
            blk7, lambda b, i, gh, gw, c=c: (c * h + i, b, gh, 0, gw, 0, 0),
            memory_space=pltpu.VMEM)
        gsp = pl.BlockSpec(blk7,
                           lambda b, i, gh, gw: (i, b, gh, 0, gw, 0, 0),
                           memory_space=pltpu.VMEM)
        dxsp = pl.BlockSpec(blk7,
                            lambda b, i, gh, gw: (i, b, gh, 0, gw, 0, 0),
                            memory_space=pltpu.VMEM)
        pos = pl.BlockSpec((1, 1, 1, 1, R, P),
                           lambda b, i, gh, gw: (b, gh, gw, i, 0, 0),
                           memory_space=pltpu.VMEM)
        tb1 = pl.BlockSpec((1, R, PH), lambda b, i, gh, gw: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        cst = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda b, i, gh, gw: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        dve_spec = pl.BlockSpec((1, 1, R, PH),
                                lambda b, i, gh, gw: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)
        dve_shape = jax.ShapeDtypeStruct((B, h, R, PH), jnp.float32)
        dtb_spec = pl.BlockSpec((1, 1, P, PH),
                                lambda b, i, gh, gw: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)
        dtb_shape = jax.ShapeDtypeStruct((B, h, P, PH), jnp.float32)
    else:
        grid = (h, B, nwh, nwwB)
        comp = lambda c: pl.BlockSpec(  # noqa: E731
            blk7, lambda i, b, gh, gw, c=c: (c * h + i, b, gh, 0, gw, 0, 0),
            memory_space=pltpu.VMEM)
        gsp = pl.BlockSpec(blk7,
                           lambda i, b, gh, gw: (i, b, gh, 0, gw, 0, 0),
                           memory_space=pltpu.VMEM)
        dxsp = pl.BlockSpec(blk7,
                            lambda i, b, gh, gw: (i, b, gh, 0, gw, 0, 0),
                            memory_space=pltpu.VMEM)
        pos = pl.BlockSpec((1, 1, 1, 1, R, P),
                           lambda i, b, gh, gw: (b, gh, gw, i, 0, 0),
                           memory_space=pltpu.VMEM)
        tb1 = pl.BlockSpec((1, R, PH), lambda i, b, gh, gw: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        cst = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i, b, gh, gw: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        dve_spec = pl.BlockSpec((1, R, PH),
                                lambda i, b, gh, gw: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        dve_shape = jax.ShapeDtypeStruct((h, R, PH), jnp.float32)
        dtb_spec = pl.BlockSpec((1, P, PH), lambda i, b, gh, gw: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        dtb_shape = jax.ShapeDtypeStruct((h, P, PH), jnp.float32)

    d8 = jax.ShapeDtypeStruct((h, B, nwh, wh, nwwB, T, hd), qkv.dtype)
    if pos_tables is not None:
        ke_c, qe_c = pos_tables
        kernel = functools.partial(
            _wan_bwd_fused_pos_kernel, scale=scale, wh=wh, ww=ww, WB=WB,
            N=N, Hp=hp_total, Wp=Wp, neg=neg, exact=exact, hd=hd,
            batch_out=batch_out)
        dq8, dk8, dv8, dke, dqe, dve = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                comp(0), comp(1), comp(2), gsp,
                pos, pos, tb1, tb1, tb1,
                cst((R, P)), cst((P, R)),
                cst((hd, PH)), cst((PH, P)), cst((R, R)),
            ],
            out_specs=(dxsp, dxsp, dxsp, dtb_spec, dtb_spec, dve_spec),
            out_shape=(d8, d8, d8, dtb_shape, dtb_shape, dve_shape),
            interpret=interpret,
        )(shift_arr, x8, x8, x8, g8, qr, kr, ve_flat, ke_c, qe_c,
          sel, selT, sch_cT, p_red, basemask)
        cat = jnp.concatenate([dq8, dk8, dv8], axis=0)
        dqkv = cat.transpose(1, 2, 3, 4, 5, 0, 6).reshape(
            B, nwh, wh, nwwB, T, C3).reshape(B, Hp, Wp, N, C3)
        return dqkv, dke, dqe, dve

    kernel = functools.partial(
        _wan_bwd_fused_kernel, scale=scale, wh=wh, ww=ww, WB=WB, N=N,
        Hp=hp_total, Wp=Wp, neg=neg, exact=exact, hd=hd,
        batch_out=batch_out)
    dpos = jax.ShapeDtypeStruct((B, nwh, nwwB, h, R, P), qr.dtype)
    dq8, dk8, dv8, dqr, dkr, dve = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            comp(0), comp(1), comp(2), gsp,
            pos, pos, tb1,
            cst((R, P)), cst((P, R)),
            cst((hd, PH)), cst((PH, P)), cst((R, R)),
        ],
        out_specs=(dxsp, dxsp, dxsp, pos, pos, dve_spec),
        out_shape=(d8, d8, d8, dpos, dpos, dve_shape),
        interpret=interpret,
    )(shift_arr, x8, x8, x8, g8, qr, kr, ve_flat, sel, selT,
      sch_cT, p_red, basemask)
    # assemble d(qkv) back to image layout (one fused transpose)
    cat = jnp.concatenate([dq8, dk8, dv8], axis=0)    # [3h, B, ...]
    dqkv = cat.transpose(1, 2, 3, 4, 5, 0, 6).reshape(
        B, nwh, wh, nwwB, T, C3).reshape(B, Hp, Wp, N, C3)
    return dqkv, dqr, dkr, dve


def _wan_bwd_part(g, qkv, qr, kr, ve_flat, shift, row0,
                  sel, selT, s_ch_c, basemask,
                  sch_cT, p_red, **kw):
    return _wan_bwd_core(g, qkv, qr, kr, ve_flat, shift, row0,
                         sel, selT, s_ch_c, basemask,
                         sch_cT, p_red, batch_out=True, **kw)


def window_attention_native_bwd(g, qkv, qr, kr, ve_flat, shift,
                                row0, scale, wh, ww, WB, num_heads,
                                candidate_mask, neg, hp_total,
                                partition=False, interpret=None,
                                direct=None):
    """Fused backward of :func:`window_attention_native` (direct layout)."""
    import os

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if direct is None:
        direct = os.environ.get("NMRF_BWD_DIRECT", "1") != "0"
    N = int(qkv.shape[3])
    hd = int(qkv.shape[4]) // (3 * num_heads)
    consts = _wan_consts(wh, ww, WB, N, hd, candidate_mask, neg)
    bsel = _bwd_selectors(wh * ww, hd)
    kw = dict(scale=scale, wh=wh, ww=ww, WB=WB, num_heads=num_heads,
              candidate_mask=candidate_mask, neg=neg, interpret=interpret,
              hp_total=hp_total, direct=direct)
    if not partition:
        dqkv, dqr, dkr, dve = _wan_bwd_core(g, qkv, qr, kr, ve_flat,
                                            shift, row0, *consts, *bsel,
                                            batch_out=False, **kw)
    else:
        # batch-partitioned path: one multi-output op — dqkv/dqr/dkr stay
        # sharded; the per-sample d(ve) partials' sharded sum below
        # inserts the cross-shard reduction
        from .partitioning import shard_over_batch

        args = (g, qkv, qr, kr, ve_flat,
                jnp.asarray(shift, jnp.int32),
                jnp.asarray(row0, jnp.int32)) + consts + bsel
        bdims = (0, 0, 0, 0) + (None,) * (len(args) - 4)
        statics = tuple(sorted(kw.items()))
        dqkv, dqr, dkr, dve = shard_over_batch(
            _wan_bwd_part, bdims, (5, 6, 6, 4), args, statics)
        dve = dve.sum(axis=0)
    return (dqkv, dqr.astype(qr.dtype), dkr.astype(kr.dtype),
            dve.astype(ve_flat.dtype))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14))
def window_attention_native_op(qkv, qr, kr, ve_flat,
                               shift, row0, scale, wh, ww, WB, num_heads,
                               candidate_mask, neg=-1e9, hp_total=None,
                               partition=False):
    """Differentiable window-native attention (Pallas fwd, remat bwd)."""
    return window_attention_native(qkv, qr, kr, ve_flat,
                                   shift, scale, wh, ww, WB, num_heads,
                                   candidate_mask, neg, row0=row0,
                                   hp_total=hp_total, partition=partition)


def _wan_fwd(qkv, qr, kr, ve_flat, shift, row0, scale, wh, ww,
             WB, num_heads, candidate_mask, neg, hp_total, partition=False):
    out = window_attention_native(qkv, qr, kr, ve_flat,
                                  shift, scale, wh, ww, WB, num_heads,
                                  candidate_mask, neg, row0=row0,
                                  hp_total=hp_total, partition=partition)
    return out, (qkv, qr, kr, ve_flat, shift, row0)


def _wan_bwd(scale, wh, ww, WB, num_heads, candidate_mask, neg, hp_total,
             partition, res, g):
    qkv, qr, kr, ve_flat, shift, row0 = res
    import os

    if os.environ.get("NMRF_PALLAS_BWD", "1") == "0":
        # escape hatch: the pre-r4 dense backward (rematerialize + VJP
        # through the jnp reference) — for A/B timing and as insurance
        # against remote-Mosaic compile regressions at new shapes
        _, vjp = jax.vjp(
            lambda qkv, qr, kr, ve: window_attention_native_reference(
                qkv, qr, kr, ve, shift, scale, wh, ww, WB, num_heads,
                candidate_mask, neg, row0=row0, hp_total=hp_total),
            qkv, qr, kr, ve_flat)
        return vjp(g) + (None, None)
    dqkv, dqr, dkr, dve = window_attention_native_bwd(
        g, qkv, qr, kr, ve_flat, shift, row0, scale, wh, ww,
        WB, num_heads, candidate_mask, neg, hp_total, partition=partition)
    return dqkv, dqr, dkr, dve, None, None


window_attention_native_op.defvjp(_wan_fwd, _wan_bwd)


# --------------------------------------------------------------------- #
# Fully-fused positional window attention (r5)
#
# ``window_attention_native_op`` leaves the positional-logit VJP to XLA:
# the backward kernel writes qr-sized dqr/dkr blocks to HBM, the caller's
# ``window_positional_terms`` einsum VJP reads them back, and its d(qk)
# output needs an (h, c) lane interleave at hd < 128 — a sublane-crossing
# repack the r5 train trace measured at ~14 GB/s effective (the largest
# copy cluster in the step).  This op moves the whole positional backward
# into the kernel: d(q)/d(k) positional halves fold into the dq/dk
# outputs via gathered per-token tables, and the table cotangents
# accumulate in-kernel like d(ve).  Forward is UNCHANGED (same einsum +
# same forward kernel, bit-identical output).
# --------------------------------------------------------------------- #

def _pos_bwd_tables(k_embed, q_embed, scale, pixs):
    """Gather the scaled positional tables by token pixel, channel-major.

    k_embed/q_embed: [P, P, h, hd] (reference WindowAttention tables,
    NMP.py:258-262; first axis = query pixel for ke, key pixel for qe).
    Returns (ke_c, qe_c) [h, R, hd*P]: ke_c[h][i, c*P+s] = scale *
    k_embed[pix(i), s, h, c]; qe_c[h][j, c*P+p] = scale *
    q_embed[p, pix(j), h, c] — the same gather-by-pixel layout as the
    value table ``ve_flat``.
    """
    P, _, h, hd = k_embed.shape
    ke = (k_embed * scale).transpose(2, 0, 3, 1).reshape(h, P, hd * P)
    qe = (q_embed * scale).transpose(2, 1, 3, 0).reshape(h, P, hd * P)
    return ke[:, pixs], qe[:, pixs]


def _wan_bwd_pos_part(g, qkv, qr, kr, ve_flat, ke_c, qe_c, shift, row0,
                      sel, selT, s_ch_c, basemask, sch_cT, p_red, **kw):
    return _wan_bwd_core(g, qkv, qr, kr, ve_flat, shift, row0,
                         sel, selT, s_ch_c, basemask, sch_cT, p_red,
                         batch_out=True, pos_tables=(ke_c, qe_c), **kw)


def window_attention_pos_bwd(g, qkv, qr, kr, ve_flat, k_embed, q_embed,
                             shift, row0, scale, wh, ww, WB, num_heads,
                             candidate_mask, neg, hp_total,
                             partition=False, interpret=None):
    """Fully-fused backward: returns (dqkv, d_k_embed, d_q_embed, dve)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N = int(qkv.shape[3])
    hd = int(qkv.shape[4]) // (3 * num_heads)
    P = wh * ww
    consts = _wan_consts(wh, ww, WB, N, hd, candidate_mask, neg)
    bsel = _bwd_selectors(P, hd)
    meta, _ = window_meta(wh, ww, WB, N)
    ke_c, qe_c = _pos_bwd_tables(k_embed, q_embed, scale, meta[:, 0])
    kw = dict(scale=scale, wh=wh, ww=ww, WB=WB, num_heads=num_heads,
              candidate_mask=candidate_mask, neg=neg, interpret=interpret,
              hp_total=hp_total)
    if not partition:
        dqkv, dke, dqe, dve = _wan_bwd_core(
            g, qkv, qr, kr, ve_flat, shift, row0, *consts, *bsel,
            batch_out=False, pos_tables=(ke_c, qe_c), **kw)
    else:
        from .partitioning import shard_over_batch

        args = (g, qkv, qr, kr, ve_flat, ke_c, qe_c,
                jnp.asarray(shift, jnp.int32),
                jnp.asarray(row0, jnp.int32)) + consts + bsel
        bdims = (0, 0, 0, 0) + (None,) * (len(args) - 4)
        statics = tuple(sorted(kw.items()))
        dqkv, dke, dqe, dve = shard_over_batch(
            _wan_bwd_pos_part, bdims, (5, 4, 4, 4), args, statics)
        dke, dqe, dve = dke.sum(axis=0), dqe.sum(axis=0), dve.sum(axis=0)
    h = num_heads
    # un-flatten the [h, P, hd*P] accumulators to table shape [P, P, h, hd].
    # d(k_embed): accumulated against PRE-SCALED q — the qr scale folds
    # cancel, no factor.  d(q_embed): accumulated against raw k — one
    # ``scale`` (kr = k . (q_embed * scale)).
    dk_embed = dke.reshape(h, P, hd, P).transpose(1, 3, 0, 2)
    dq_embed = dqe.reshape(h, P, hd, P).transpose(1, 3, 0, 2) * scale
    return (dqkv, dk_embed.astype(k_embed.dtype),
            dq_embed.astype(q_embed.dtype), dve.astype(ve_flat.dtype))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14))
def window_attention_pos_op(qkv, k_embed, q_embed, ve_flat, shift, row0,
                            scale, wh, ww, WB, num_heads, candidate_mask,
                            neg=-1e9, hp_total=None, partition=False):
    """Differentiable window attention over the RAW positional tables
    (positional-terms einsum + Pallas fwd; fully-fused Pallas bwd)."""
    qr, kr = window_positional_terms(qkv, k_embed, q_embed, scale,
                                     wh, ww, WB, num_heads)
    return window_attention_native(qkv, qr, kr, ve_flat, shift, scale,
                                   wh, ww, WB, num_heads, candidate_mask,
                                   neg, row0=row0, hp_total=hp_total,
                                   partition=partition)


def _wap_fwd(qkv, k_embed, q_embed, ve_flat, shift, row0, scale, wh, ww,
             WB, num_heads, candidate_mask, neg, hp_total, partition=False):
    qr, kr = window_positional_terms(qkv, k_embed, q_embed, scale,
                                     wh, ww, WB, num_heads)
    out = window_attention_native(qkv, qr, kr, ve_flat, shift, scale,
                                  wh, ww, WB, num_heads, candidate_mask,
                                  neg, row0=row0, hp_total=hp_total,
                                  partition=partition)
    return out, (qkv, qr, kr, ve_flat, k_embed, q_embed, shift, row0)


def _wap_bwd(scale, wh, ww, WB, num_heads, candidate_mask, neg, hp_total,
             partition, res, g):
    qkv, qr, kr, ve_flat, k_embed, q_embed, shift, row0 = res
    import os

    if os.environ.get("NMRF_PALLAS_BWD", "1") == "0":
        # escape hatch: autodiff through the jnp reference + the
        # positional-terms einsum (A/B timing / Mosaic-regression insurance)
        def f(qkv, ke, qe, ve):
            qr_, kr_ = window_positional_terms(qkv, ke, qe, scale,
                                               wh, ww, WB, num_heads)
            return window_attention_native_reference(
                qkv, qr_, kr_, ve, shift, scale, wh, ww, WB, num_heads,
                candidate_mask, neg, row0=row0, hp_total=hp_total)

        _, vjp = jax.vjp(f, qkv, k_embed, q_embed, ve_flat)
        return vjp(g) + (None, None)
    out = window_attention_pos_bwd(
        g, qkv, qr, kr, ve_flat, k_embed, q_embed, shift, row0, scale,
        wh, ww, WB, num_heads, candidate_mask, neg, hp_total,
        partition=partition)
    return out + (None, None)


window_attention_pos_op.defvjp(_wap_fwd, _wap_bwd)
