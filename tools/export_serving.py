#!/usr/bin/env python
"""Export the eval forward as a hermetic AOT serving artifact.

Builds the model from a config (+ optional ``SOLVER.RESUME`` checkpoint,
orbax or converted ``.pth``), lowers the jitted eval forward with
``jax.export`` at one padded input shape, and writes the serialized
StableHLO (+ JSON sidecar) to ``--output``.  The artifact is loadable with
``nmrf_tpu.utils.export.load_exported`` — or plain ``jax.export`` — with no
model code, and with the weights baked in by default.

The exported shape is (batch, H, W, 3) after padding H and W up to
``DATASETS.DIVIS_BY`` (the model's static-shape contract); pad inputs with
``data.frame_io.InputPadder(mode="proposal")`` at serve time.

Usage:
    python tools/export_serving.py --height 375 --width 1242 \
        --output serving/kitti.nmrfx [--platforms tpu cpu] [--check] \
        [--config-file configs/...yaml] [CFG OVERRIDES...]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pad_up(v, k):
    return -(-v // k) * k


def main():
    ap = argparse.ArgumentParser("NMRF-TPU serving export")
    ap.add_argument("--config-file", default="", metavar="FILE")
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--output", required=True)
    ap.add_argument("--platforms", nargs="+", default=["tpu"])
    ap.add_argument("--no-freeze", action="store_true",
                    help="export a (params, img1, img2) calling convention "
                         "instead of baking the weights in")
    ap.add_argument("--check", action="store_true",
                    help="round-trip the artifact and compare against the "
                         "live model on the current backend")
    ap.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from nmrf_tpu.utils.runtime import configure_jax
    configure_jax()
    import jax
    import jax.numpy as jnp

    import inference as infer_cli
    from nmrf_tpu.utils.export import export_eval, save_exported, load_exported

    # reuse the inference CLI's build path (config merge + checkpoint restore)
    class _A:
        config_file = args.config_file
        opts = args.opts

    cfg, model, params, _ = infer_cli.build(_A)

    k = cfg.DATASETS.DIVIS_BY
    H, W = pad_up(args.height, k), pad_up(args.width, k)
    shape = (args.batch, H, W, 3)
    print(f"exporting eval forward at {shape} for {args.platforms} "
          f"(freeze={not args.no_freeze})")
    exp = export_eval(model, params, shape, platforms=args.platforms,
                      freeze_params=not args.no_freeze)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    size = save_exported(
        exp, args.output,
        extra_meta={"config_file": args.config_file,
                    "input_shape": list(shape), "divis_by": k,
                    "frozen_params": not args.no_freeze})
    print(f"wrote {args.output} ({size / 1e6:.1f} MB) + sidecar .json")

    if args.check:
        rt = load_exported(args.output)
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.rand(*shape).astype(np.float32) * 255)
        b = jnp.asarray(rng.rand(*shape).astype(np.float32) * 255)
        if args.no_freeze:
            got = rt.call(params, a, b)
        else:
            got = rt.call(a, b)
        want = jax.jit(lambda x, y: model.apply(params, x, y, train=False))(a, b)
        err = max(float(jnp.max(jnp.abs(g - w)))
                  for g, w in zip(jax.tree_util.tree_leaves(got),
                                  jax.tree_util.tree_leaves(want)))
        print(f"round-trip max |delta| = {err:.3e}")
        assert err < 1e-4, err


if __name__ == "__main__":
    main()
