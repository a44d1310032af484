#!/usr/bin/env python
"""Convergence-gate diagnosis: single-batch overfit probe + prediction stats.

The r4 gate run plateaued at holdout EPE 15.46 frozen to 3 decimals from
step 200 to 1000 (CONVERGENCE.json) while train loss kept moving — the
eval prediction stopped depending on training.  This probe answers, on
chip, with the gate's exact compiled shapes (cache hit):

  1. Can the model OVERFIT one fixed production-shape batch?  (If not:
     model/optimizer bug, not task difficulty.)
  2. What do the predictions look like — constant?  clipped?  at what
     stage (initial proposal vs refined disp) does the signal die?

Usage: python tools/debug_convergence.py [--steps 300] [KEY VALUE ...]
"""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.train_convergence_gate import make_batch, _flag  # noqa: E402


def main():
    from nmrf_tpu.utils.runtime import backend_init_watchdog, configure_jax

    configure_jax()
    backend_init_watchdog()
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.config import get_cfg
    from nmrf_tpu.models import build_model
    from nmrf_tpu.parallel import (make_eval_step, make_mesh, make_train_step,
                                   replicated, shard_batch)
    from nmrf_tpu.solver import build_optimizer

    argv = sys.argv[1:]
    steps = _flag(argv, "--steps", 300, int)
    synth_max_disp = _flag(argv, "--synth-max-disp", 48, int)
    synth_align = _flag(argv, "--synth-align", 8, int)
    overfit = _flag(argv, "--overfit", 1, int)  # 1: fixed batch; 0: fresh
    cfg = get_cfg()
    cfg.DATASETS.CROP_SIZE = (384, 768)
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.REMAT = True
    cfg.SOLVER.MAX_ITER = steps
    cfg.merge_from_list(argv)
    cfg.freeze()

    model, criterion = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.SEED)
    img0 = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = jax.jit(lambda r: model.init(r, img0, img0, train=False))(rng)
    tx, schedule = build_optimizer(params, cfg)
    opt_state = tx.init(params)
    mesh = make_mesh(cfg.TPU.MESH_DATA, cfg.TPU.MESH_SPATIAL)
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))
    step_fn = make_train_step(model, criterion, tx, seed=cfg.SEED)
    eval_fn = make_eval_step(model)

    fixed = make_batch(cfg, 1, synth_max_disp, align=synth_align)
    gt = fixed["disp"][0]
    vd = fixed["valid"][0]
    print(f"GT disp stats: mean {gt[vd].mean():.2f} std {gt[vd].std():.2f} "
          f"max {gt[vd].max():.1f}", flush=True)

    def eval_stats(params, tag, step):
        out = eval_fn(params, jnp.asarray(fixed["img1"][:1]),
                      jnp.asarray(fixed["img2"][:1]))
        d = np.asarray(out["disp"])[0]
        epe = np.abs(d - gt)[vd].mean()
        line = (f"[{tag} {step}] disp: mean {d[vd].mean():.3f} "
                f"std {d[vd].std():.3f} min {d.min():.2f} max {d.max():.2f} "
                f"EPE {epe:.3f}")
        # stage breakdown: initial proposal & proposal grids are 1/8-res
        # candidate sets in 1/8-PIXEL units (models/nmrf.py decode scales
        # coarse by 8); compare best-candidate EPE against GT/8
        g8 = gt[3::8, 3::8] / 8.0
        v8 = vd[3::8, 3::8]
        for key in ("initial_proposal", "proposal"):
            if key in out:
                p = np.asarray(out[key])[0]  # [h8*w8, N]
                h8, w8 = g8.shape
                p = p.reshape(h8, w8, -1)
                best = np.min(np.abs(p - g8[..., None]), axis=-1)
                line += f"  {key}_bestEPE {best[v8].mean():.3f}"
                line += (f" {key}[mean {p.mean():.2f} max {p.max():.1f}]")
        print(line, flush=True)

    eval_stats(params, "init", 0)
    import time
    t0 = time.perf_counter()
    for s in range(1, steps + 1):
        b = fixed if overfit else make_batch(cfg, s, synth_max_disp,
                                             align=synth_align)
        batch = shard_batch(b, mesh)
        params, opt_state, losses = step_fn(params, opt_state, batch, s)
        if s % 20 == 0 or s == steps:
            host = {k: round(float(v), 3) for k, v in losses.items()}
            lr = float(np.asarray(schedule(s - 1)))
            print(f"step {s}: lr {lr:.2e} " + str(host), flush=True)
        if s % 50 == 0 or s == steps:
            eval_stats(params, "overfit" if overfit else "fresh", s)
    print(f"avg {((time.perf_counter()-t0)/steps)*1000:.0f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
