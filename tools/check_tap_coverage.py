#!/usr/bin/env python
"""Check the tap-MSDA exactness precondition for a (converted) checkpoint.

The tap-based MSDA kernel (ops/pallas/msda.py, TPU.MSDA_TAP_RADIUS) drops
contributions from sampling points displaced more than the tap radius from
their query's aligned cell.  Offsets are initialised <= 4 px but trained
offsets are unconstrained — run this after converting a trained checkpoint
to verify the radius covers it (or to pick a bigger one / fall back to the
exact path with ``TPU.MSDA_TAP_RADIUS 0``).

Runs one forward with flax "intermediates" captured and reports, per
extractor level, the fraction of samples the tap span would drop.

Usage:
    python tools/check_tap_coverage.py [--hw HxW] [CFG OVERRIDES...]
    # e.g. ... --hw 375x1242 SOLVER.RESUME ckpts/kitti_swint.pth \
    #          BACKBONE.MODEL_TYPE swin BACKBONE.OUT_CHANNELS 128
Exits 1 if any level drops samples.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nmrf_tpu.utils.runtime import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.config import get_cfg
    from nmrf_tpu.data.frame_io import InputPadder
    from nmrf_tpu.models import build_model
    from nmrf_tpu.utils.checkpoint import (load_torch_checkpoint,
                                           restore_checkpoint)

    argv = sys.argv[1:]
    hw = "128x256"
    if "--hw" in argv:
        i = argv.index("--hw")
        hw = argv[i + 1]
        del argv[i:i + 2]
    H, W = map(int, hw.split("x"))

    cfg = get_cfg()
    cfg.merge_from_list(argv)
    cfg.freeze()
    if cfg.BACKBONE.MODEL_TYPE != "swin":
        print("resnet backbone has no MSDA; nothing to check")
        return 0
    model, _ = build_model(cfg)

    padder = InputPadder((H, W), mode="proposal",
                         divis_by=cfg.DATASETS.DIVIS_BY)
    rng = np.random.RandomState(0)
    img = jnp.asarray(np.asarray(
        padder.pad((rng.rand(H, W, 3) * 255).astype(np.float32))[0])[None])
    params = jax.jit(lambda r: model.init(r, img, img, train=False))(
        jax.random.PRNGKey(0))
    if cfg.SOLVER.RESUME:
        if cfg.SOLVER.RESUME.endswith(".pth"):
            params, _ = load_torch_checkpoint(cfg.SOLVER.RESUME)
        else:
            state, _ = restore_checkpoint(cfg.SOLVER.RESUME)
            params = state["params"]

    _, inter = jax.jit(
        lambda p, a, b: model.apply(p, a, b, train=False,
                                    mutable=["intermediates"]))(
        params, img, img)

    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    worst = 0.0
    found = False
    for path, v in flat:
        key = jax.tree_util.keystr(path)
        if "msda_tap_oob" in key:
            found = True
            frac = float(np.asarray(v).max())
            worst = max(worst, frac)
            print(f"{key.split('backbone')[-1][:60]:60s} "
                  f"oob_fraction={frac:.2e}")
    if not found:
        print("tap path inactive (TPU.MSDA_TAP_RADIUS is 0?) — "
              "nothing to check")
        return 0
    print(f"max out-of-range fraction: {worst:.3e} "
          f"(radius {cfg.TPU.MSDA_TAP_RADIUS})")
    if worst > 0:
        print("WARNING: the tap kernel drops contributions for this "
              "checkpoint; raise TPU.MSDA_TAP_RADIUS or set it to 0.")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
