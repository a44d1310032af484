"""Fused NMP attention kernels — Pallas TPU.

The NMP stages are HBM-bandwidth/layout bound, not FLOP bound: the profiled
XLA lowering spends most of each layer materializing [Bw, h, T, T] logits,
softmax temporaries and window-partition copies (see tools/profile_model.py).
These kernels keep the whole attention of one (head, window-group) in VMEM:

  ``masked_attention``      logits = q k^T * scale + mask; out = softmax @ v
  ``rpe_window_attention``  + the relative-position q/k/v terms of
                            ``models.nmp.WindowAttention``

Design rules (this backend's Mosaic restrictions — see CLAUDE.md):
  * only 2-D ``dot_general`` contractions; the candidate/pixel factorization
    is handled with constant 0/1 *selector matmuls* instead of reshapes:
      - qr[i, s] (query-side positional logits, per query token i and key
        pixel s) is spread over key *tokens* j by ``qr @ sel_sT`` where
        ``sel_sT[s, j] = 1 iff pixel(j) == s``;
      - kr[p, j] (key-side) is spread over query tokens by ``sel_q @ kr``;
      - the value-table weights ``attn_s[i, s] = sum_{j: pixel(j)=s} attn``
        are one matmul ``attn @ sel_s``.
    Cross-window selector hits are junk but always masked to -inf before
    softmax (exp underflows to exactly 0), so block-diagonal packing of
    several windows into one [R, R] attention is exact.
  * no minor-dim reshapes — callers pass tokens pre-flattened [*, R, hd];
  * elementwise 3-D multiply + middle-axis reduce is used only for the
    value-table term (same pattern as the v1 kernel, known-good).

Block-diagonal packing: a grid cell processes WB windows as one R = WB*T
token block.  For the refinement stage (T = 16) this is the difference
between starving the MXU and feeding it [128, 128] tiles.

Forward-only fusion: training takes the custom-VJP path which recomputes
through the jnp reference (rematerialization instead of the reference's
atomic CUDA backwards, ops/src/cuda/ms_deform_im2col_cuda.cuh:301-922).
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

def pixel_selectors(P, N, WB=1):
    """0/1 selector matrices for R = WB * P * N tokens ordered
    (window, pixel, candidate).

    Returns (sel_q [R, P], sel_sT [P, R], sel_s [R, P]) float32 numpy:
      sel_q[i, p]  = 1 iff pixel(i) == p   (spread kr over query tokens)
      sel_sT[s, j] = 1 iff pixel(j) == s   (spread qr over key tokens)
      sel_s = sel_q (sum attention over each key pixel's candidates)
    """
    pix = np.repeat(np.tile(np.repeat(np.arange(P), N), WB)[:, None],
                    1, axis=1).reshape(-1)  # [R] pixel id per token
    sel = (pix[:, None] == np.arange(P)[None, :]).astype(np.float32)  # [R, P]
    return sel, np.ascontiguousarray(sel.T), sel


def block_diagonal_mask(masks, WB):
    """Pack per-window additive masks [nW, T, T] into block-diagonal
    group masks [nW/WB, WB*T, WB*T] with -inf off-diagonal blocks."""
    nW, T, _ = masks.shape
    assert nW % WB == 0, (nW, WB)
    G = nW // WB
    R = WB * T
    out = np.full((G, R, R), np.float32(-1e9))
    for a in range(WB):
        out[:, a * T:(a + 1) * T, a * T:(a + 1) * T] = \
            masks.reshape(G, WB, T, T)[:, a]
    return out


def block_diagonal_mask_jnp(masks, WB):
    """Traced variant of :func:`block_diagonal_mask` for masks selected
    inside an ``nn.scan`` body.  masks: [nWm, T, T] with nWm == 1
    (broadcast over windows) or nWm % WB == 0.  Returns [Gm, WB*T, WB*T]."""
    nWm, T, _ = masks.shape
    if WB == 1:
        return masks
    if nWm == 1:
        m = jnp.broadcast_to(masks, (WB, T, T))[None]        # [1, WB, T, T]
    else:
        m = masks.reshape(nWm // WB, WB, T, T)
    eye = np.eye(WB, dtype=np.float32)
    blocks = jnp.einsum("ab,gatu->gatbu", jnp.asarray(eye), m)
    off = jnp.asarray(np.float32(-1e9) * (1.0 - eye))[None, :, None, :, None]
    return (blocks + off).reshape(-1, WB * T, WB * T)


def choose_window_block(nW, T, target=512, max_wb=8):
    """Largest WB <= max_wb dividing nW with WB*T <= target (MXU fill vs
    VMEM: the [R, R] logits/mask tiles grow quadratically in WB)."""
    wb = 1
    for cand in range(2, max_wb + 1):
        if nW % cand == 0 and cand * T <= target:
            wb = cand
    return wb


# --------------------------------------------------------------------------- #
# Plain masked attention (CSWin stripes, BasicAttention candidate blocks)
# --------------------------------------------------------------------------- #

def _masked_attention_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *,
                             scale):
    q = q_ref[0, 0].astype(jnp.float32) * scale          # [R, hd]
    k = k_ref[0, 0].astype(jnp.float32)
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

    q, k, v: [h, G, R, hd]; mask: [Gm, R, R] additive f32 with Gm in
    {1, G} (Gm=1 broadcasts).  Returns [h, G, R, hd] in q.dtype.

    Grid is (G, h) with h innermost: the mask block's index map is
    constant across the h steps, so Mosaic fetches each [R, R] mask once
    per group instead of once per (head, group).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, G, R, hd = q.shape
    Gm = mask.shape[0]
    tok = pl.BlockSpec((1, 1, R, hd), lambda g, i: (i, g, 0, 0),
                       memory_space=pltpu.VMEM)
    msk = pl.BlockSpec((1, R, R), lambda g, i: (g % Gm, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_masked_attention_kernel, scale=scale),
        grid=(G, h),
        in_specs=[tok, tok, tok, msk],
        out_specs=tok,
        out_shape=jax.ShapeDtypeStruct((h, G, R, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, mask)


def masked_attention_reference(q, k, v, mask, scale):
    """jnp golden of ``masked_attention`` (tests + custom-VJP backward)."""
    h, G, R, hd = q.shape
    Gm = mask.shape[0]
    logits = jnp.einsum("hgic,hgjc->hgij", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    m = mask if Gm == G else jnp.broadcast_to(mask, (G, R, R))
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


def _ma_bwd(scale, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(
        lambda q, k, v: masked_attention_reference(q, k, v, mask, scale),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


masked_attention_op.defvjp(_ma_fwd, _ma_bwd)


# --------------------------------------------------------------------------- #
# Window attention with relative-position q/k/v terms
# --------------------------------------------------------------------------- #

def _rpe_attention_kernel(q_ref, k_ref, v_ref, qr_ref, kr_ref, ve_ref,
                          mask_ref, selq_ref, selst_ref, out_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32) * scale          # [R, hd]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    logits = lax.dot_general(q, k, (((1,), (1,)), ((), ())), **_F32)  # [R, R]
    # query-side positional logits, spread over each key pixel's candidates
    logits = logits + lax.dot_general(
        qr_ref[0, 0], selst_ref[:], (((1,), (0,)), ((), ())), **_F32)
    # key-side positional logits, spread over each query pixel's candidates
    logits = logits + lax.dot_general(
        selq_ref[:], kr_ref[0, 0], (((1,), (0,)), ((), ())), **_F32)
    logits = logits + mask_ref[0]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    out = lax.dot_general(attn.astype(v.dtype), v,
                          (((1,), (0,)), ((), ())), **_F32)   # [R, hd]
    # value-table term: per-key-pixel attention mass (one matmul), then a
    # 3-D multiply + middle-axis reduce against the token-expanded table
    attn_s = lax.dot_general(attn, selq_ref[:],
                             (((1,), (0,)), ((), ())), **_F32)  # [R, P]
    out = out + jnp.sum(attn_s[:, :, None] * ve_ref[0], axis=1)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def rpe_window_attention(q, k, v, qr, kr, ve_tok, mask, sel_q, sel_sT, scale,
                         interpret=None):
    """Fused windowed attention with relative-position terms.

    Token order inside a group: (window, pixel, candidate), R = WB*P*N.

    Args:
      q, k, v: [h, G, R, hd] (G window groups).
      qr: [h, G, R, P] query-side positional logits
          (``q_i . k_embed[pixel(i), s]`` for each key pixel s).
      kr: [h, G, P, R] key-side positional logits
          (``k_j . q_embed[p, pixel(j)] * scale`` for each query pixel p).
      ve_tok: [h, R, P, hd] token-expanded value table
          (``v_embed[pixel(i), s, :]``).
      mask: [Gm, R, R] additive f32, Gm in {1, G}; must be -inf on
          cross-window pairs when WB > 1.
      sel_q: [R, P] 0/1 (``pixel_selectors``); sel_sT: [P, R].
    Returns [h, G, R, hd] in q.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, G, R, hd = q.shape
    P = qr.shape[-1]
    Gm = mask.shape[0]
    tok = pl.BlockSpec((1, 1, R, hd), lambda g, i: (i, g, 0, 0),
                       memory_space=pltpu.VMEM)
    qr_s = pl.BlockSpec((1, 1, R, P), lambda g, i: (i, g, 0, 0),
                        memory_space=pltpu.VMEM)
    kr_s = pl.BlockSpec((1, 1, P, R), lambda g, i: (i, g, 0, 0),
                        memory_space=pltpu.VMEM)
    ve_s = pl.BlockSpec((1, R, P, hd), lambda g, i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    msk = pl.BlockSpec((1, R, R), lambda g, i: (g % Gm, 0, 0),
                       memory_space=pltpu.VMEM)
    sq_s = pl.BlockSpec((R, P), lambda g, i: (0, 0), memory_space=pltpu.VMEM)
    st_s = pl.BlockSpec((P, R), lambda g, i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_rpe_attention_kernel, scale=scale),
        grid=(G, h),
        in_specs=[tok, tok, tok, qr_s, kr_s, ve_s, msk, sq_s, st_s],
        out_specs=tok,
        out_shape=jax.ShapeDtypeStruct((h, G, R, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, qr, kr, ve_tok, mask, sel_q, sel_sT)


def rpe_window_attention_reference(q, k, v, qr, kr, ve_tok, mask, sel_q,
                                   sel_sT, scale):
    """jnp golden of ``rpe_window_attention`` (tests + custom-VJP backward)."""
    h, G, R, hd = q.shape
    Gm = mask.shape[0]
    logits = jnp.einsum("hgic,hgjc->hgij", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    logits = logits + jnp.einsum("hgis,sj->hgij", qr, sel_sT)
    logits = logits + jnp.einsum("ip,hgpj->hgij", sel_q, kr)
    m = mask if Gm == G else jnp.broadcast_to(mask, (G, R, R))
    logits = logits + m[None]
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hgij,hgjc->hgic", attn.astype(v.dtype),
                     v).astype(jnp.float32)
    attn_s = jnp.einsum("hgij,jp->hgip", attn, sel_q)
    out = out + jnp.einsum("hgip,hipc->hgic", attn_s, ve_tok)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def rpe_window_attention_op(q, k, v, qr, kr, ve_tok, mask, sel_q, sel_sT,
                            scale):
    """Differentiable fused rpe window attention (Pallas fwd, remat bwd)."""
    return rpe_window_attention(q, k, v, qr, kr, ve_tok, mask, sel_q, sel_sT,
                                scale)


def _rpe_fwd(q, k, v, qr, kr, ve_tok, mask, sel_q, sel_sT, scale):
    out = rpe_window_attention(q, k, v, qr, kr, ve_tok, mask, sel_q, sel_sT,
                               scale)
    return out, (q, k, v, qr, kr, ve_tok, mask, sel_q, sel_sT)


def _rpe_bwd(scale, res, g):
    q, k, v, qr, kr, ve_tok, mask, sel_q, sel_sT = res
    _, vjp = jax.vjp(
        lambda q, k, v, qr, kr, ve: rpe_window_attention_reference(
            q, k, v, qr, kr, ve, mask, sel_q, sel_sT, scale),
        q, k, v, qr, kr, ve_tok)
    dq, dk, dv, dqr, dkr, dve = vjp(g)
    return dq, dk, dv, dqr, dkr, dve, None, None, None


rpe_window_attention_op.defvjp(_rpe_fwd, _rpe_bwd)
