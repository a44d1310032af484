#!/usr/bin/env python
"""Decompose the swin backbone latency: SwinTransformer vs DeformNeck vs the
raw MSDA core, at KITTI-padded shapes (384x1280).  Chained-readback timing
(same methodology as bench.py — the relay's async dispatch makes per-call
timing meaningless).

Usage: python tools/bench_swin_parts.py [ITERS]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nmrf_tpu.utils.runtime import backend_init_watchdog, configure_jax

    configure_jax()
    backend_init_watchdog()
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.models.adaptor import DeformNeck, SwinAdaptor
    from nmrf_tpu.models.swin import SwinTransformer
    from nmrf_tpu.ops.msda import ms_deform_attn

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    dtype = jnp.bfloat16
    H_img, W_img = 384, 1280
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    from nmrf_tpu.utils.benchmarks import chained_ms

    def timed(tag, fn, *args):
        dt = chained_ms(fn, *args, iters=iters)
        print(json.dumps({"part": tag, "ms": round(dt, 2)}), flush=True)
        return dt

    img = jnp.asarray(rng.rand(1, H_img, W_img, 3).astype(np.float32) * 255)

    # 1. full adaptor (== backbone stage of bench_stages)
    adaptor = SwinAdaptor(out_channels=128, dtype=dtype)
    params_a = jax.jit(lambda r, x: adaptor.init(r, x, True))(key, img)
    timed("swin_adaptor_total", lambda x: jnp.mean(
        adaptor.apply(params_a, x, True)[0]), img)

    # 2. swin transformer alone
    swin = SwinTransformer(embed_dim=96, depths=(2, 2, 6, 2),
                           num_heads=(3, 6, 12, 24), dtype=dtype)
    params_s = jax.jit(lambda r, x: swin.init(r, x, True))(key, img)
    timed("swin_transformer", lambda x: sum(
        jnp.mean(v) for v in swin.apply(params_s, x, True).values()), img)

    # 3. deform neck alone (random per-level features)
    feats = [jnp.asarray(rng.rand(1, H_img // s, W_img // s, c).astype(
        np.float32)) for s, c in [(4, 96), (8, 192), (16, 384), (32, 768)]]
    neck = DeformNeck(128, [96, 192, 384, 768], deform_ratio=0.5, dtype=dtype)
    params_n = jax.jit(lambda r, x, f: neck.init(r, x, f, True))(
        key, img, feats)
    timed("deform_neck", lambda x, f: jnp.mean(
        neck.apply(params_n, x, f, True)), img, feats)

    # 4. raw MSDA core at the neck's hottest level (level 0: 96x320 value map)
    Hq, Wq = H_img // 4, W_img // 4
    Lq = Hq * Wq
    M, D, P = 8, 8, 4  # heads, ch/head (dim*ratio/heads = 128*0.5/8), points
    for lvl, (h, w) in enumerate([(Hq, Wq), (H_img // 8, W_img // 8)]):
        value = jnp.asarray(rng.rand(1, h * w, M, D).astype(np.float32),
                            dtype)
        locs = jnp.asarray(rng.rand(1, Lq, M, 1, P, 2).astype(np.float32))
        w_ = jnp.asarray(rng.rand(1, Lq, M, 1, P).astype(np.float32), dtype)
        timed(f"msda_core_l{lvl}", lambda v, l, w2: jnp.mean(
            ms_deform_attn(v, [(h, w)], l, w2)), value, locs, w_)


if __name__ == "__main__":
    main()
