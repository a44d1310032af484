"""Standalone interpret-mode validation of ops/pallas/attention.py.

Checks, on CPU (Pallas interpreter):
  1. masked_attention == masked_attention_reference
  2. rpe_window_attention == rpe_window_attention_reference
  3. rpe_window_attention_reference == the module einsum formulation in
     models/nmp.py (pixel-granular qr/kr/ve terms), including WB>1
     block-diagonal packing + shifted-window masks.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nmrf_tpu.utils.runtime import configure_jax
configure_jax()

import numpy as np
import jax
import jax.numpy as jnp

from nmrf_tpu.ops.pallas.attention import (
    masked_attention, masked_attention_reference,
    rpe_window_attention, rpe_window_attention_reference,
    pixel_selectors, block_diagonal_mask)

rng = np.random.default_rng(0)


def chk(name, a, b, tol=2e-5):
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    status = "OK " if err < tol else "FAIL"
    print(f"{status} {name}: max|d|={err:.3e}")
    return err < tol


ok = True

# ---- 1. masked_attention ----
h, G, R, hd = 4, 6, 128, 32
q = jnp.asarray(rng.standard_normal((h, G, R, hd)), jnp.float32)
k = jnp.asarray(rng.standard_normal((h, G, R, hd)), jnp.float32)
v = jnp.asarray(rng.standard_normal((h, G, R, hd)), jnp.float32)
mask = jnp.asarray(np.where(rng.random((G, R, R)) < 0.1, -1e9, 0.0), jnp.float32)
out_p = masked_attention(q, k, v, mask, 0.17, interpret=True)
out_r = masked_attention_reference(q, k, v, mask, 0.17)
ok &= chk("masked_attention (Gm=G)", out_p, out_r)

mask1 = mask[:1]
out_p = masked_attention(q, k, v, mask1, 0.17, interpret=True)
out_r = masked_attention_reference(q, k, v, mask1, 0.17)
ok &= chk("masked_attention (Gm=1)", out_p, out_r)

# ---- 2+3. rpe_window_attention vs reference vs module math ----
def module_math(q5, k5, v5, q_embed, k_embed, v_embed, mask_tt, scale):
    """The einsum formulation from models/nmp.py WindowAttention (per window).
    q5,k5,v5: [Bw, h, P, N, hd]; tables [P, P, h, hd]; mask_tt [Bw, T, T]."""
    Bw, h, P, N, hd = q5.shape
    T = P * N
    f32 = dict(preferred_element_type=jnp.float32)
    q_ = q5 * scale
    attn = jnp.einsum("bhpnc,bhsmc->bhpnsm", q_, k5, **f32)
    qr = jnp.einsum("bhpnc,pshc->bhpns", q_ / scale, k_embed, **f32)
    kr = jnp.einsum("bhsmc,pshc->bhpsm", k5, q_embed * scale, **f32)
    attn = attn + qr[:, :, :, :, :, None] + kr[:, :, :, None, :, :]
    attn = attn.reshape(Bw, h, T, T) + mask_tt[:, None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhij,bhjc->bhic", attn, v5.reshape(Bw, h, T, hd), **f32)
    # value-table term: attn over key tokens grouped by key pixel s
    attn6 = attn.reshape(Bw, h, P, N, P, N)
    attn_s = attn6.sum(axis=-1)  # [Bw, h, P, N, Ps]
    vterm = jnp.einsum("bhpns,pshc->bhpnc", attn_s, v_embed, **f32)
    return out.reshape(Bw, h, P, N, hd) + vterm


P, N, hh, hd = 36, 4, 4, 32
WB = 2
nW = 6          # windows; groups G = nW // WB = 3
Bw = nW
T = P * N
scale = hd ** -0.5
q5 = jnp.asarray(rng.standard_normal((Bw, hh, P, N, hd)), jnp.float32)
k5 = jnp.asarray(rng.standard_normal((Bw, hh, P, N, hd)), jnp.float32)
v5 = jnp.asarray(rng.standard_normal((Bw, hh, P, N, hd)), jnp.float32)
q_embed = jnp.asarray(rng.standard_normal((P, P, hh, hd)), jnp.float32) * 0.1
k_embed = jnp.asarray(rng.standard_normal((P, P, hh, hd)), jnp.float32) * 0.1
v_embed = jnp.asarray(rng.standard_normal((P, P, hh, hd)), jnp.float32) * 0.1
# per-window shifted-style masks [nW, T, T]
mask_tt = np.where(rng.random((nW, T, T)) < 0.1, -1e9, 0.0).astype(np.float32)

want = module_math(q5, k5, v5, q_embed, k_embed, v_embed,
                   jnp.asarray(mask_tt), scale)

# pack into kernel layout
G = nW // WB
R = WB * T
sel_q, sel_sT, _ = pixel_selectors(P, N, WB)
gmask = jnp.asarray(block_diagonal_mask(mask_tt, WB))  # [G, R, R]

def pack(x5):  # [Bw, h, P, N, hd] -> [h, G, R, hd]
    return x5.reshape(G, WB, hh, T, hd).transpose(2, 0, 1, 3, 4).reshape(hh, G, R, hd)

qp, kp, vp = pack(q5), pack(k5), pack(v5)
# qr: [h, G, R, P] = q_i . k_embed[pixel(i), s]
qr5 = jnp.einsum("bhpnc,pshc->bhpns", q5, k_embed)
qr = qr5.reshape(G, WB, hh, T, P).transpose(2, 0, 1, 3, 4).reshape(hh, G, R, P)
# kr: [h, G, P, R] = k_j . q_embed[p, pixel(j)] * scale
kr5 = jnp.einsum("bhsmc,pshc->bhpsm", k5, q_embed * scale)  # [Bw, h, P, s, m]
kr = kr5.reshape(G, WB, hh, P, T).transpose(2, 0, 1, 3, 4)
kr = kr.reshape(hh, G, WB, P, T)
# interleave: kr over key tokens j = (window a, s, m); layout [h, G, P_q, R_j]
kr = kr.transpose(0, 1, 3, 2, 4).reshape(hh, G, P, R)
# ve_tok: [h, R, P, hd] = v_embed[pixel(i), s, :]
pix = np.tile(np.repeat(np.arange(P), N), WB)  # [R]
ve_tok = v_embed.transpose(2, 0, 1, 3)[:, pix]  # [h, R, P, hd]

out_ref = rpe_window_attention_reference(qp, kp, vp, qr, kr, ve_tok, gmask,
                                         jnp.asarray(sel_q),
                                         jnp.asarray(sel_sT), scale)
want_p = pack(want)
ok &= chk("rpe reference vs module math (WB=2)", out_ref, want_p, tol=5e-4)

out_pal = rpe_window_attention(qp, kp, vp, qr, kr, ve_tok, gmask,
                               jnp.asarray(sel_q), jnp.asarray(sel_sT), scale,
                               interpret=True)
ok &= chk("rpe pallas vs reference (WB=2)", out_pal, out_ref, tol=5e-4)

# ---- 4. window-native kernel vs the WindowAttention module (XLA path) ----
from nmrf_tpu.models.nmp import WindowAttention, shift_window_attn_mask, \
    window_attn_mask
from nmrf_tpu.ops.pallas.attention import (
    window_attention_native, window_attention_native_reference, window_meta)

for tag, (wh, ww, N, heads, hd, Hp, Wp, WB, cand) in {
    "inference-like": (6, 6, 2, 2, 8, 12, 24, 2, True),
    "refinement-like": (4, 4, 1, 2, 8, 8, 24, 3, False),
}.items():
    C = heads * hd
    scale = hd ** -0.5
    B = 2
    qkv = jnp.asarray(rng.standard_normal((B, Hp, Wp, N, 3 * C)), jnp.float32)
    table = jnp.asarray(
        rng.standard_normal(((2 * wh - 1) * (2 * ww - 1), 3 * C)),
        jnp.float32) * 0.1
    mod = WindowAttention(C, (wh, ww), wh // 2, heads)
    params = {"params": {"relative_position_enc_table": table}}

    # token-expanded positional tables (same construction the module will use)
    from nmrf_tpu.models.nmp import _relative_position_index
    P = wh * ww
    rel = _relative_position_index(wh, ww)
    rpe = table[rel.reshape(-1)].reshape(P, P, heads, 3 * hd)
    q_embed, k_embed, v_embed = jnp.split(rpe, 3, axis=-1)
    meta, sel = window_meta(wh, ww, WB, N)
    pixs = meta[:, 0]
    R = len(pixs)
    ke_flat = k_embed.transpose(2, 0, 1, 3)[:, pixs].reshape(heads, R, -1)
    qe_flat = (q_embed * scale).transpose(2, 1, 0, 3)[:, pixs].reshape(
        heads, R, -1)
    ve_flat = v_embed.transpose(2, 0, 1, 3)[:, pixs].reshape(heads, R, -1)

    for shift in (0, wh // 2):
        if shift == 0:
            attn_mask = None if not cand else jnp.broadcast_to(
                window_attn_mask((wh, ww, N))[None],
                ((Hp // wh) * (Wp // ww), P * N, P * N))
        else:
            attn_mask = jnp.asarray(shift_window_attn_mask(
                (Hp, Wp), (wh, ww, N), shift, with_candidate_mask=cand))
        want = mod.apply(params, qkv, attn_mask, True, shift=shift)

        rolled = jnp.roll(qkv, (-shift, -shift), axis=(1, 2))
        got_r = window_attention_native_reference(
            rolled, ke_flat, qe_flat, ve_flat, shift, scale,
            wh, ww, WB, heads, cand)
        got_r = jnp.roll(got_r, (shift, shift), axis=(1, 2))
        ok &= chk(f"native reference vs module ({tag}, shift={shift})",
                  got_r, want, tol=5e-4)

        got_k = window_attention_native(
            rolled, ke_flat, qe_flat, ve_flat, shift, scale,
            wh, ww, WB, heads, cand, interpret=True)
        got_k = jnp.roll(got_k, (shift, shift), axis=(1, 2))
        ok &= chk(f"native pallas vs module ({tag}, shift={shift})",
                  got_k, want, tol=5e-4)

print("ALL OK" if ok else "FAILURES", flush=True)
sys.exit(0 if ok else 1)
