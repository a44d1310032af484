"""On-chip probe of the window-native Pallas kernel (compile + parity).

Runs window_attention_native at real inference/refinement shapes on the TPU
and compares against the jnp reference (also on TPU).  Exercises the Mosaic
features the kernel leans on: full-dim token blocks, VMEM-resident flattened
tables, in-kernel iota coordinate masks, SMEM shift scalar.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nmrf_tpu.utils.runtime import configure_jax
configure_jax()

import numpy as np
import jax
import jax.numpy as jnp

from nmrf_tpu.ops.pallas.attention import (
    choose_column_block, window_attention_native,
    window_attention_native_reference, window_meta,
    window_positional_terms)

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

CASES = {
    # KITTI-ish shapes: (wh, ww, N, heads, hd, Hp, Wp, cand)
    "inference": (6, 6, 4, 4, 32, 48, 156, True),
    "refinement": (4, 4, 1, 4, 32, 96, 312, False),
}

for tag, (wh, ww, N, heads, hd, Hp, Wp, cand) in CASES.items():
    C = heads * hd
    scale = hd ** -0.5
    T = wh * ww * N
    WB = choose_column_block(Wp // ww, T)
    qkv = jnp.asarray(rng.standard_normal((1, Hp, Wp, N, 3 * C)), jnp.float32)
    P = wh * ww
    tabs = jnp.asarray(rng.standard_normal((3, heads, P, P, hd)),
                       jnp.float32) * 0.1
    meta, sel = window_meta(wh, ww, WB, N)
    pixs = meta[:, 0]
    R = len(pixs)
    # ve is CHANNEL-major (c, s)
    ve_flat = tabs[2][:, pixs].transpose(0, 1, 3, 2).reshape(heads, R, -1)
    shift = wh // 2
    # tables [h, P, P, hd] -> [P, P, h, hd] for window_positional_terms
    k_emb = tabs[0].transpose(1, 2, 0, 3)
    q_emb = tabs[1].transpose(1, 2, 0, 3)
    qr_blk, kr_blk = window_positional_terms(
        qkv, k_emb, q_emb, scale, wh, ww, WB, heads)

    fn = jax.jit(lambda q, qr, kr, ve: window_attention_native(
        q, qr, kr, ve, shift, scale, wh, ww, WB, heads, cand,
        interpret=False))
    ref = jax.jit(lambda q, qr, kr, ve: window_attention_native_reference(
        q, qr, kr, ve, shift, scale, wh, ww, WB, heads, cand))
    try:
        got = np.asarray(fn(qkv, qr_blk, kr_blk, ve_flat))
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {tag}: {type(e).__name__}: {str(e)[:800]}")
        continue
    with jax.default_matmul_precision("highest"):
        want = np.asarray(jax.jit(
            lambda q, qr, kr, ve: window_attention_native_reference(
                q, qr, kr, ve, shift, scale, wh, ww, WB, heads,
                cand))(qkv, qr_blk, kr_blk, ve_flat))
    lossy = np.asarray(ref(qkv, qr_blk, kr_blk, ve_flat))
    err = float(np.max(np.abs(got - want)))
    err_l = float(np.max(np.abs(lossy - want)))
    print(f"{'OK ' if err < 1e-3 else 'FAIL'} {tag}: WB={WB} "
          f"kernel-vs-exact={err:.3e} xla-default-vs-exact={err_l:.3e}",
          flush=True)
