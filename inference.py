#!/usr/bin/env python
"""Demo / submission CLI.

Behavioral parity target: reference ``inference.py``: ``--dataset-name``
(eth3d / middlebury_* / kitti_2012 / kitti_2015 submission) or ``--input``
glob pairs; ``--show-attr disparity|error``; KITTI submission via
``write_disp_kitti``.
"""

import argparse
import glob
import os

import numpy as np


def get_args_parser():
    parser = argparse.ArgumentParser("NMRF-TPU inference")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--dataset-name", default=None, type=str,
                        help="eth3d | middlebury_<split> | kitti_2012 | kitti_2015")
    parser.add_argument("--input", nargs="+", default=None,
                        help="two glob patterns: left right")
    parser.add_argument("--output", default="demo_output", type=str)
    # reference inference.py:74-87 supports error|disparity and raises
    # otherwise (its Visualizer.draw_uncertainty has no CLI surface either)
    parser.add_argument("--show-attr", default="disparity",
                        choices=["disparity", "error"])
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


def build(args):
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.config import get_cfg
    from nmrf_tpu.models import build_model
    from nmrf_tpu.parallel import make_eval_step
    from nmrf_tpu.utils.checkpoint import load_torch_checkpoint, restore_checkpoint

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    cfg.freeze()

    model, _ = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = jax.jit(lambda r: model.init(r, dummy, dummy, train=False))(rng)
    resume = cfg.SOLVER.RESUME
    if resume:
        if resume.endswith(".pth"):
            params, _ = load_torch_checkpoint(resume)
        else:
            # restore the raw saved tree ({"params","opt_state","step"},
            # utils/checkpoint.py:save_checkpoint) and keep the params
            state, _ = restore_checkpoint(resume)
            params = state["params"]
    return cfg, model, params, make_eval_step(model)


def predict(eval_step, params, cfg, img1, img2):
    import jax.numpy as jnp

    from nmrf_tpu.data.frame_io import InputPadder

    padder = InputPadder(img1.shape, mode="proposal", divis_by=cfg.DATASETS.DIVIS_BY)
    p1, p2 = padder.pad(img1.astype(np.float32), img2.astype(np.float32))
    out = eval_step(params, jnp.asarray(p1[None]), jnp.asarray(p2[None]))
    disp = np.asarray(out["disp"])
    return padder.unpad(disp)[0]


def main():
    from nmrf_tpu.utils.runtime import configure_jax

    configure_jax()
    args = get_args_parser().parse_args()
    cfg, model, params, eval_step = build(args)
    os.makedirs(args.output, exist_ok=True)

    from nmrf_tpu.data import build_val_dataset
    from nmrf_tpu.data.frame_io import read_gen, write_disp_kitti
    from nmrf_tpu.utils.visualization import Visualizer

    if args.dataset_name in ("kitti_2012", "kitti_2015"):
        # KITTI submission (reference inference.py:104-126)
        from nmrf_tpu.data import KITTI

        ds = KITTI(root=os.path.join(cfg.DATASETS.ROOT, "KITTI"),
                   split="testing", image_set=args.dataset_name)
        for i in range(len(ds)):
            sample = ds[i]
            disp = predict(eval_step, params, cfg, sample["img1"], sample["img2"])
            write_disp_kitti(os.path.join(args.output, sample["meta"]), disp)
            print(f"[{i + 1}/{len(ds)}] {sample['meta']}")
        return

    if args.dataset_name is not None:
        ds = build_val_dataset(cfg, args.dataset_name)
        for i in range(len(ds)):
            sample = ds[i]
            disp = predict(eval_step, params, cfg, sample["img1"], sample["img2"])
            vis = Visualizer(sample["img1"])
            if args.show_attr == "error":
                err = np.abs(disp - sample["disp"]) * sample["valid"]
                out = vis.draw_error_map(err)
            else:
                out = vis.draw_disparity(disp, colormap="kitti")
            out.save(os.path.join(args.output, f"{i:06d}.png"))
            print(f"[{i + 1}/{len(ds)}]")
        return

    assert args.input and len(args.input) == 2, "--input LEFT_GLOB RIGHT_GLOB"
    lefts = sorted(glob.glob(args.input[0]))
    rights = sorted(glob.glob(args.input[1]))
    for i, (lf, rf) in enumerate(zip(lefts, rights)):
        img1 = np.array(read_gen(lf)).astype(np.float32)[..., :3]
        img2 = np.array(read_gen(rf)).astype(np.float32)[..., :3]
        disp = predict(eval_step, params, cfg, img1, img2)
        vis = Visualizer(img1)
        out = vis.draw_disparity(disp, colormap="kitti")
        name = os.path.splitext(os.path.basename(lf))[0]
        out.save(os.path.join(args.output, f"{name}_disp.png"))
        print(f"[{i + 1}/{len(lefts)}] {name}")


if __name__ == "__main__":
    main()
