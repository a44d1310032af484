#!/usr/bin/env python
"""Per-stage latency decomposition of the NMRF forward on the real chip.

Times each pipeline stage (backbone / cost-volume+DPN / inference NMP /
refinement NMP) in isolation with the same chained-readback methodology as
bench.py (the relay's async dispatch makes per-call timing meaningless —
each scan iteration consumes a token derived from the previous output).

Prints one JSON line per stage.  Usage:
    python tools/bench_stages.py [CFG OVERRIDES...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nmrf_tpu.utils.runtime import backend_init_watchdog, configure_jax

    configure_jax()
    backend_init_watchdog()
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.config import get_cfg
    from nmrf_tpu.data.frame_io import InputPadder
    from nmrf_tpu.models import build_model
    from nmrf_tpu.ops.correlation import correlation_volume

    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.merge_from_list(sys.argv[1:])
    cfg.freeze()
    model, _ = build_model(cfg)

    H, W = map(int, os.environ.get("BENCH_HW", "375x1242").split("x"))
    padder = InputPadder((H, W), mode="proposal", divis_by=cfg.DATASETS.DIVIS_BY)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(np.asarray(
        padder.pad((rng.rand(H, W, 3) * 255).astype(np.float32))[0])[None])
    img2 = jnp.asarray(np.asarray(
        padder.pad((rng.rand(H, W, 3) * 255).astype(np.float32))[0])[None])
    params = jax.jit(lambda r: model.init(r, img1, img2, train=False))(
        jax.random.PRNGKey(0))

    # ---- stage bodies (flax method closures over the bound module) ---- #
    def run_backbone(m, a, b):
        return m.extract_feature(a, b, True)

    def run_dpn(m, f1, f2):
        cv = correlation_volume(f1[0], f2[0], m.max_disp // 8, m.cost_group)
        return m.dpn(cv, f1, True)

    def run_infer(m, f1, f2, labels_curr):
        fmap1 = m.concatconv(f1[0])
        fmap2 = m.concatconv(f2[0])
        g1 = m.gw(f1[0])
        g2 = m.gw(f2[0])
        tgt = m.inference(labels_curr, fmap1, fmap2, g1, g2, True)
        return m.infer_head(tgt), 0.25 * m.infer_score_head(tgt)

    def run_refine(m, f1, f2, disp_curr):
        rf1 = m.concatconv(f1[1])
        rf2 = m.concatconv(f2[1])
        g1 = m.gw(f1[1])
        g2 = m.gw(f2[1])
        tgt = m.refinement(disp_curr, rf1, rf2, g1, g2, True)
        return m.refine_head(tgt)

    def run_full(m, a, b):
        return m(a, b, train=False)

    # ---- precompute stage inputs once on device ---- #
    feats = jax.jit(
        lambda p, a, b: model.apply(p, a, b, method=run_backbone))(
        params, img1, img2)
    f1_list, f2_list = feats
    dpn_out = jax.jit(
        lambda p, f1, f2: model.apply(p, f1, f2, method=run_dpn))(
        params, f1_list, f2_list)
    _, _, _, labels = dpn_out
    B, h8, w8 = 1, f1_list[0].shape[1], f1_list[0].shape[2]
    labels_curr = labels[-1].reshape(B, h8, w8, model.num_proposals)
    H4, W4 = f1_list[1].shape[1], f1_list[1].shape[2]
    disp_curr = jnp.asarray((rng.rand(B, H4, W4) * 80).astype(np.float32))

    K = 16

    def timed(name, method, inputs):
        def chained(p, inputs):
            def body(tok, _):
                shifted = jax.tree.map(
                    lambda x: x + tok.astype(x.dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, inputs)
                out = model.apply(p, *shifted, method=method)
                leaf = jax.tree.leaves(out)[0]
                return leaf.ravel()[0].astype(jnp.float32) * 0.0, ()

            tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return tok

        fn = jax.jit(chained)
        float(fn(params, inputs))  # compile + warmup
        t0 = time.perf_counter()
        float(fn(params, inputs))
        ms = (time.perf_counter() - t0) / K * 1000.0
        print(json.dumps({"stage": name, "ms": round(ms, 2)}), flush=True)
        return ms

    total = 0.0
    total += timed("backbone", run_backbone, (img1, img2))
    total += timed("costvol+dpn", run_dpn, (f1_list, f2_list))
    total += timed("inference_nmp", run_infer, (f1_list, f2_list, labels_curr))
    total += timed("refinement_nmp", run_refine, (f1_list, f2_list, disp_curr))
    print(json.dumps({"stage": "sum_of_stages", "ms": round(total, 2)}),
          flush=True)
    timed("full_forward", run_full, (img1, img2))


if __name__ == "__main__":
    main()
