#!/usr/bin/env python
"""Device-trace the PRODUCTION-RECIPE train step and print top HLO ops.

VERDICT r3 item 4: the inference path was profiled and attacked to 42 ms;
the 1068 ms train step never was.  This captures a ``jax.profiler`` trace
of `make_train_step` at the reference recipe (crop 384x768, batch 8, bf16,
remat — /root/reference/nmrf/config/default.py:97-116) and aggregates
device time by op, splitting forward/backward/optimizer where XLA metadata
allows (transpose ops carry 'gradients/' or fusion source hints).

Usage:
    python tools/profile_train.py [--steps 2] [--out DIR] [CFG KEY VALUE ...]
"""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.profile_model import print_aggregation, summarize_trace  # noqa: E402
from tools.train_convergence_gate import _flag, make_batch  # noqa: E402


def main():
    from nmrf_tpu.utils.runtime import backend_init_watchdog, configure_jax

    configure_jax()
    backend_init_watchdog()
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.config import get_cfg
    from nmrf_tpu.models import build_model
    from nmrf_tpu.parallel import (make_mesh, make_train_step, replicated,
                                   shard_batch)
    from nmrf_tpu.solver import build_optimizer

    argv = sys.argv[1:]
    out = _flag(argv, "--out", "/tmp/nmrf_train_profile", str)
    top = _flag(argv, "--top", 44, int)
    steps = _flag(argv, "--steps", 2, int)

    cfg = get_cfg()
    if "--config-file" in argv:
        # trace an alternate variant's step (e.g. the swint flagship recipe)
        i = argv.index("--config-file")
        cfg.merge_from_file(argv[i + 1])
        del argv[i:i + 2]
    cfg.DATASETS.CROP_SIZE = (384, 768)
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.REMAT = True
    cfg.merge_from_list(argv)
    cfg.freeze()

    model, criterion = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    img0 = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = jax.jit(lambda r: model.init(r, img0, img0, train=False))(rng)
    tx, _ = build_optimizer(params, cfg)
    opt_state = tx.init(params)
    mesh = make_mesh(1, 1)
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))
    step_fn = make_train_step(model, criterion, tx, seed=0)

    batch = shard_batch(make_batch(cfg, 1, 48), mesh)
    # compile + one-time warmup execution
    params, opt_state, losses = step_fn(params, opt_state, batch, 0)
    float(losses["total"])

    import time
    t0 = time.perf_counter()
    jax.profiler.start_trace(out)
    for s in range(1, steps + 1):
        params, opt_state, losses = step_fn(params, opt_state, batch, s)
    tot = float(losses["total"])
    jax.profiler.stop_trace()
    wall = (time.perf_counter() - t0) / steps
    assert np.isfinite(tot)

    rows, module_ms, sum_ms = summarize_trace(out, top)
    print(f"# trace: {out}  wall {wall * 1000:.0f} ms/step "
          f"(module event {module_ms:.1f} ms; leaf-op sum {sum_ms:.1f} ms "
          f"over {steps} steps = {sum_ms / steps:.1f} ms/step)")
    print(f"{'ms_total':>9}  {'ms/step':>9} {'n':>6}  op")
    for d, c, name, meta in rows:
        label = f"{name}   [{meta[:120]}]" if meta else name
        print(f"{d:9.2f}  {d / steps:9.2f} {c:6d}  {label}")
    print_aggregation(out, divisor=steps, unit="ms/step")


if __name__ == "__main__":
    main()
