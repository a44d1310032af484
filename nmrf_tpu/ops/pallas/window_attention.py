"""Fused windowed NMP attention — Pallas TPU kernel.

Fuses the whole per-window attention of ``models.nmp.WindowAttention`` (the
hot op of the Inference/Refinement stages) into one kernel:

    attn = q k^T * scale + qr + kr + mask;  p = softmax(attn)
    out  = p v + pos(p, v_embed)

where qr/kr/pos are the relative-position contributions computed at PIXEL
granularity (the tables are independent of the candidate axis N).  The XLA
lowering materializes the [Bw, h, T, T] logits plus several layout copies per
layer; the kernel keeps everything in VMEM per (window, head) grid cell.

Mosaic note: the kernel is RESHAPE-FREE — the token axis stays factored as
(P pixels, N candidates) and every contraction is a ``dot_general``, because
vector shape casts that touch the minor (tiled) dims are unsupported.

Layout contract (caller = WindowAttention):
  q, k, v : [Bw, h, P, N, hd]
  k_embed, q_embed, v_embed : [h, P, P, hd]
      (k/v_embed indexed [query_pixel, key_pixel]; q_embed[query, key])
  mask    : [nW, P, N, P, N] additive f32 (window of grid cell bw = bw % nW)
  out     : [Bw, h, P, N, hd]

Forward-only fusion: the op defines a custom VJP that recomputes attention
through the pure-jnp reference formulation (rematerialization instead of the
reference CUDA backward's six atomic col2im kernel variants, reference
ops/src/cuda/ms_deform_im2col_cuda.cuh:301-922 — same design stance: no
atomics on TPU).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, ke_ref, qe_ref, ve_ref, mask_ref,
                      out_ref, *, scale):
    """One (window-batch, head) grid cell; the candidate axis N is tiny
    (4 for inference, 1 for refinement) and is unrolled as a static loop so
    that every contraction is a single-dim ``tpu.matmul`` (Mosaic does not
    support multi-dim contracting dims)."""
    k = k_ref[0, 0].astype(jnp.float32)          # [P, N, hd]
    v = v_ref[0, 0]
    ke = ke_ref[0].astype(jnp.float32)           # [P_q, P_s, hd]
    qe = qe_ref[0].astype(jnp.float32) * scale
    ve = ve_ref[0].astype(jnp.float32)

    P, N, hd = k.shape
    f32 = dict(preferred_element_type=jnp.float32)

    # kr_m[p_q, p_s] = (q_embed[p_q, p_s] * scale) . k[(p_s, m)] — shared
    # across query candidates; VPU multiply-reduce over the lane (hd) axis.
    # (int+None mixed indexing lowers to an unsupported gather; slice first)
    kr = [jnp.sum(qe * k[:, m, :][None], axis=-1) for m in range(N)]
    vs = [v[:, m, :].astype(jnp.float32) for m in range(N)]

    for n in range(N):
        q_n = q_ref[0, 0, :, n, :].astype(jnp.float32) * scale  # [P, hd]
        # qr_n[p, s] = q_n[p] . k_embed[p, s] — multiply-reduce over lanes
        qr_n = jnp.sum(q_n[:, None, :] * ke, axis=-1)  # [P, P]
        # per key-candidate logits: 2-D MXU matmuls only
        logits = []
        for m in range(N):
            qk_nm = lax.dot_general(q_n, k[:, m, :],
                                    (((1,), (1,)), ((), ())), **f32)  # [P, P]
            logits.append(qk_nm + qr_n + kr[m] + mask_ref[0, :, n, :, m])

        mx = logits[0]
        for m in range(1, N):
            mx = jnp.maximum(mx, logits[m])
        mx = jnp.max(mx, axis=-1, keepdims=True)
        exps = [jnp.exp(l - mx) for l in logits]
        denom = sum(jnp.sum(e, axis=-1, keepdims=True) for e in exps)
        probs = [e / denom for e in exps]

        out_n = lax.dot_general(probs[0], vs[0], (((1,), (0,)), ((), ())), **f32)
        for m in range(1, N):
            out_n = out_n + lax.dot_general(probs[m], vs[m],
                                            (((1,), (0,)), ((), ())), **f32)
        # pos_n[p, c] = sum_s (sum_m p[p, s, m]) v_embed[p, s, c]
        a_sum = probs[0]
        for m in range(1, N):
            a_sum = a_sum + probs[m]
        pos_n = jnp.sum(a_sum[:, :, None] * ve, axis=1)  # [P, hd]
        out_ref[0, 0, :, n, :] = (out_n + pos_n).astype(out_ref.dtype)


def fused_window_attention(q, k, v, k_embed, q_embed, v_embed, mask, scale,
                           interpret=None):
    """Fused attention core.  See module docstring for the layout contract.

    interpret: None = auto (interpreter on CPU, compiled on TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Bw, h, P, N, hd = q.shape
    nW = mask.shape[0]

    tok_spec = pl.BlockSpec((1, 1, P, N, hd), lambda b, i: (b, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    emb_spec = pl.BlockSpec((1, P, P, hd), lambda b, i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, P, N, P, N), lambda b, i: (b % nW, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(_attention_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(Bw, h),
        in_specs=[tok_spec, tok_spec, tok_spec, emb_spec, emb_spec, emb_spec,
                  mask_spec],
        out_specs=tok_spec,
        out_shape=jax.ShapeDtypeStruct((Bw, h, P, N, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, k_embed, q_embed, v_embed, mask)


def window_attention_reference(q, k, v, k_embed, q_embed, v_embed, mask, scale):
    """Pure-jnp reference of the fused kernel (same layout contract);
    golden for tests and the custom-VJP backward path."""
    Bw, h, P, N, hd = q.shape
    nW = mask.shape[0]
    qs = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    attn = jnp.einsum("bhpnc,bhsmc->bhpnsm", qs, kf)
    attn = attn + jnp.einsum("bhpnc,hpsc->bhpns", qs,
                             k_embed.astype(jnp.float32))[..., None]
    kr = jnp.einsum("hpsc,bhsmc->bhpsm",
                    q_embed.astype(jnp.float32) * scale, kf)
    attn = attn + kr[:, :, :, None]
    widx = jnp.arange(Bw) % nW
    attn = attn + mask[widx][:, None]
    mx = attn.max(axis=(4, 5), keepdims=True)
    e = jnp.exp(attn - mx)
    attn = e / e.sum(axis=(4, 5), keepdims=True)
    a = attn.astype(v.dtype)
    out = jnp.einsum("bhpnsm,bhsmc->bhpnc", a, v).astype(jnp.float32)
    a_sum = attn.sum(axis=5)
    out = out + jnp.einsum("bhpns,hpsc->bhpnc", a_sum,
                           v_embed.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def window_attention_op(q, k, v, k_embed, q_embed, v_embed, mask, scale):
    """Differentiable fused window attention (Pallas fwd, remat bwd)."""
    return fused_window_attention(q, k, v, k_embed, q_embed, v_embed, mask, scale)


def _fwd(q, k, v, k_embed, q_embed, v_embed, mask, scale):
    out = fused_window_attention(q, k, v, k_embed, q_embed, v_embed, mask, scale)
    return out, (q, k, v, k_embed, q_embed, v_embed, mask)


def _bwd(scale, res, g):
    q, k, v, k_embed, q_embed, v_embed, mask = res
    _, vjp = jax.vjp(
        lambda q, k, v, ke, qe, ve: window_attention_reference(
            q, k, v, ke, qe, ve, mask, scale), q, k, v, k_embed, q_embed, v_embed)
    dq, dk, dv, dke, dqe, dve = vjp(g)
    return dq, dk, dv, dke, dqe, dve, None


window_attention_op.defvjp(_fwd, _bwd)
