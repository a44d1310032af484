#!/usr/bin/env python
"""Training-throughput benchmark: steps/s of the full sharded train step
(forward + backward + AdamW update) at the SceneFlow crop resolution.

Not the driver metric (bench.py is); prints one JSON line for the record.
"""

import json
import sys
import time

import numpy as np


def main():
    from nmrf_tpu.utils.runtime import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.config import get_cfg
    from nmrf_tpu.models import build_model
    from nmrf_tpu.parallel import make_mesh, make_train_step, replicated, shard_batch
    from nmrf_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.merge_from_list(sys.argv[1:])
    cfg.freeze()

    B = cfg.SOLVER.IMS_PER_BATCH
    H, W = cfg.DATASETS.CROP_SIZE
    model, criterion = build_model(cfg)
    rng = np.random.RandomState(0)
    batch_np = {
        "img1": (rng.rand(B, H, W, 3) * 255).astype(np.float32),
        "img2": (rng.rand(B, H, W, 3) * 255).astype(np.float32),
        "disp": (rng.rand(B, H, W) * 100).astype(np.float32),
        "valid": np.ones((B, H, W), bool),
    }
    img0 = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = jax.jit(lambda r: model.init(r, img0, img0, train=False))(
        jax.random.PRNGKey(0))
    tx, _ = build_optimizer(params, cfg)
    opt_state = tx.init(params)
    mesh = make_mesh(cfg.TPU.MESH_DATA, cfg.TPU.MESH_SPATIAL)
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))
    batch = shard_batch(batch_np, mesh)
    step = make_train_step(model, criterion, tx)

    # warmup/compile
    params, opt_state, losses = step(params, opt_state, batch, 0)
    print("warmup total:", float(losses["total"]), file=sys.stderr)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, losses = step(params, opt_state, batch, i + 1)
    total = float(losses["total"])  # readback closes the pipeline
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"train_step_{H}x{W}_b{B}",
        "value": round(dt * 1000.0, 2),
        "unit": "ms/step",
        "total_loss": round(total, 3),
    }))


if __name__ == "__main__":
    main()
