"""Standalone interpret-mode validation of ops/pallas/attention.py.

Checks, on CPU (Pallas interpreter):
  1. masked_attention == masked_attention_reference
  2. window_attention_native (kernel + jnp reference) == the
     models/nmp.py WindowAttention module (XLA path), including shifted
     windows, candidate masks, and WB>1 window packing.
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
    masked_attention, masked_attention_reference)

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

# ---- 2. window-native kernel vs the WindowAttention module (XLA path) ----
from nmrf_tpu.models.nmp import WindowAttention, shift_window_attn_mask, \
    window_attn_mask
from nmrf_tpu.ops.pallas.attention import (
    window_attention_native, window_attention_native_reference, window_meta,
    window_positional_terms)

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

    # positional terms (same construction the module will use)
    from nmrf_tpu.models.nmp import _relative_position_index
    P = wh * ww
    rel = _relative_position_index(wh, ww)
    rpe = table[rel.reshape(-1)].reshape(P, P, heads, 3 * hd)
    q_embed, k_embed, v_embed = jnp.split(rpe, 3, axis=-1)
    meta, sel = window_meta(wh, ww, WB, N)
    pixs = meta[:, 0]
    R = len(pixs)
    ve_flat = v_embed.transpose(2, 0, 3, 1)[:, pixs].reshape(heads, R, -1)  # c-major

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
        qr_blk, kr_blk = window_positional_terms(
            rolled, k_embed, q_embed, scale, wh, ww, WB, heads)
        got_r = window_attention_native_reference(
            rolled, qr_blk, kr_blk, ve_flat, shift, scale,
            wh, ww, WB, heads, cand)
        got_r = jnp.roll(got_r, (shift, shift), axis=(1, 2))
        ok &= chk(f"native reference vs module ({tag}, shift={shift})",
                  got_r, want, tol=5e-4)

        got_k = window_attention_native(
            rolled, qr_blk, kr_blk, ve_flat, shift, scale,
            wh, ww, WB, heads, cand, interpret=True)
        got_k = jnp.roll(got_k, (shift, shift), axis=(1, 2))
        ok &= chk(f"native pallas vs module ({tag}, shift={shift})",
                  got_k, want, tol=5e-4)

print("ALL OK" if ok else "FAILURES", flush=True)
sys.exit(0 if ok else 1)
