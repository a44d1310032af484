#!/usr/bin/env python
"""Probe: what inserts all-gathers into the pure-DP train step?

A DDP-equivalent step should communicate exactly one gradient all-reduce of
parameter bytes; SCALING.json r3 shows 9 all-gathers (10-42 MB, scaling with
the data axis) in every data>1 row.  Dump each collective with its operand
producers so the source op is identifiable (VERDICT r3 item 6 groundwork).
"""

import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    from nmrf_tpu.utils.runtime import configure_jax

    configure_jax()  # sitecustomize pins axon via jax.config; re-pin to cpu
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nmrf_tpu.config import get_cfg
    from nmrf_tpu.models import build_model
    from nmrf_tpu.parallel import (make_mesh, make_train_step, replicated,
                                   shard_batch)
    from nmrf_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.DPN.MAX_DISP = 64
    cfg.SOLVER.MAX_DISP = 48
    cfg.DATASETS.CROP_SIZE = (96, 192)
    cfg.SOLVER.IMS_PER_BATCH = 1
    cfg.merge_from_list(sys.argv[1:])
    cfg.freeze()

    data = 2
    model, criterion = build_model(cfg)
    mesh = make_mesh(data, 1, devices=jax.devices()[:data])
    B = cfg.SOLVER.IMS_PER_BATCH * data
    H, W = cfg.DATASETS.CROP_SIZE
    rng = np.random.RandomState(0)
    batch = shard_batch({
        "img1": (rng.rand(B, H, W, 3) * 255).astype(np.float32),
        "img2": (rng.rand(B, H, W, 3) * 255).astype(np.float32),
        "disp": (rng.rand(B, H, W) * 40).astype(np.float32),
        "valid": np.ones((B, H, W), bool),
    }, mesh)
    img0 = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = jax.jit(lambda r: model.init(r, img0, img0, train=False))(
        jax.random.PRNGKey(0))
    tx, _ = build_optimizer(params, cfg)
    opt_state = tx.init(params)
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))
    step = make_train_step(model, criterion, tx)
    hlo = step.lower(params, opt_state, batch, 0).compile().as_text()

    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "bench_scaling", os.path.join(ROOT, "bench_scaling.py"))
    bs = ilu.module_from_spec(spec)
    spec.loader.exec_module(bs)
    import json
    print("collective_stats:", json.dumps(bs.collective_stats(hlo)))
    param_bytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize
                      for p in jax.tree_util.tree_leaves(params))
    print("param_bytes:", param_bytes)
    with open("/tmp/probe_dp_hlo.txt", "w") as f:
        f.write(hlo)

    lines = hlo.splitlines()
    defs = {}  # var name -> def line (for operand lookup)
    pat_def = re.compile(r"^\s*(%?[\w.-]+) = ")
    for ln in lines:
        m = pat_def.match(ln)
        if m:
            defs[m.group(1)] = ln.strip()

    for i, ln in enumerate(lines):
        if re.search(r"= [^=]*(all-gather|collective-permute|all-reduce)"
                     r"(-start)?\(", ln):
            print("=" * 100)
            print(ln.strip()[:400])
            for op in re.findall(r"(%?[\w.-]+)(?=[,)])", ln.split("(", 1)[1])[:4]:
                d = defs.get(op)
                if d and d is not ln:
                    print("   <-", d[:350])
            # metadata op_name hints the jax source
            mm = re.search(r'metadata=\{[^}]*op_name="([^"]*)"', ln)
            if mm:
                print("   op_name:", mm.group(1)[:300])


if __name__ == "__main__":
    main()
