#!/usr/bin/env python
"""Training / evaluation CLI.

Behavioral parity target: reference ``main.py`` surface: ``--config-file``,
``--checkpoint-dir``, ``--eval-only``, trailing ``KEY VALUE`` config
overrides.  The per-GPU process launcher is replaced by the JAX runtime: one
process per HOST (``--coordinator/--num-hosts/--host-rank`` for multi-host),
a single device mesh, and XLA collectives — no spawner needed.
"""

import argparse
import logging
import os

import numpy as np


def get_args_parser():
    parser = argparse.ArgumentParser(
        "NMRF-TPU training",
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--checkpoint-dir", default="checkpoints/sceneflow", type=str)
    parser.add_argument("--eval-only", action="store_true")
    # multi-host (replaces --num-gpus/--num-machines/--machine-rank/--dist-url)
    parser.add_argument("--coordinator", default=None, type=str,
                        help="coordinator address host:port for multi-host")
    parser.add_argument("--num-hosts", default=1, type=int)
    parser.add_argument("--host-rank", default=0, type=int)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="space-separated KEY VALUE config override pairs")
    return parser


def setup(args):
    from nmrf_tpu.config import get_cfg
    from nmrf_tpu.utils import (check_path, collect_env_info, get_sha,
                                seed_all_rng, setup_logger)
    import jax

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    cfg.freeze()

    rank = jax.process_index()
    if rank == 0 and args.checkpoint_dir:
        check_path(args.checkpoint_dir)
    logger = setup_logger(args.checkpoint_dir, distributed_rank=rank)
    logger.info(f"Rank of current process: {rank}. World size: {jax.process_count()}")
    logger.info("Environment info:\n" + collect_env_info())
    logger.info(f"git:\n {get_sha()}\n")
    logger.info("Command line arguments: " + str(args))
    if rank == 0 and args.checkpoint_dir:
        with open(os.path.join(args.checkpoint_dir, "config.yaml"), "w") as f:
            f.write(cfg.dump())
    seed_all_rng(None if cfg.SEED < 0 else cfg.SEED + rank)
    return cfg


def evaluate(eval_step, params, cfg, logger):
    """Per-dataset evaluation (reference main.py:302-324).

    Each process evaluates only its contiguous ``InferenceSampler`` shard
    (union of ranks == exact dataset, reference evaluation.py:42-75 +
    datasets.py:409-436); ``metrics_gather_fn`` reassembles the per-sample
    metric lists across hosts so the averages equal a single-process run."""
    import jax
    import jax.numpy as jnp
    from nmrf_tpu.data import build_val_dataset
    from nmrf_tpu.data.loader import InferenceSampler
    from nmrf_tpu.data.frame_io import InputPadder
    from nmrf_tpu.evalx import DispEvaluator, inference_on_dataset, print_csv_format

    results = {}
    for idx, name in enumerate(cfg.DATASETS.TEST):
        dataset = build_val_dataset(cfg, name)
        sampler = InferenceSampler(len(dataset), rank=jax.process_index(),
                                   world_size=jax.process_count())
        evaluator = DispEvaluator(
            thres=cfg.TEST.EVAL_THRESH[idx],
            only_valid=cfg.TEST.EVAL_ONLY_VALID[idx],
            max_disp=cfg.TEST.EVAL_MAX_DISP[idx],
            eval_prop=cfg.TEST.EVAL_PROP[idx],
            divis_by=cfg.DATASETS.DIVIS_BY)

        def data_iter():
            for i in sampler:
                s = dataset[i]
                yield {k: (v[None] if isinstance(v, np.ndarray) else [v])
                       for k, v in s.items()}

        bucket = cfg.TPU.EVAL_BUCKET

        def run_model(sample):
            img1, img2 = sample["img1"][0], sample["img2"][0]
            padder = InputPadder(img1.shape, mode="proposal",
                                 divis_by=max(cfg.DATASETS.DIVIS_BY, 1))
            p1, p2 = padder.pad(img1, img2)
            # bucket to bound recompiles across differing eval sizes
            H, W = p1.shape[:2]
            Hb = -(-H // bucket) * bucket
            Wb = -(-W // bucket) * bucket
            pb = [(0, Hb - H), (0, Wb - W), (0, 0)]
            p1b = np.pad(p1, pb, mode="edge")
            p2b = np.pad(p2, pb, mode="edge")
            out = eval_step(params, jnp.asarray(p1b[None]), jnp.asarray(p2b[None]))
            disp = np.asarray(out["disp"])[:, :H, :W]
            disp = padder.unpad(disp)
            res = {"disp": disp}
            if "proposal" in out:
                # crop the 1/8-res proposal grid from the bucket-padded
                # extent back to the padder extent the evaluator expects
                prop = np.asarray(out["proposal"])
                hb, wb, hp, wp = Hb // 8, Wb // 8, H // 8, W // 8
                prop = prop.reshape(-1, hb, wb, prop.shape[-1])[:, :hp, :wp]
                res["proposal"] = prop.reshape(prop.shape[0], hp * wp, -1)
            return res

        gather_fn = None
        if jax.process_count() > 1:
            from nmrf_tpu.utils.dist import metrics_gather_fn as gather_fn
        results[name] = inference_on_dataset(run_model, data_iter(), evaluator,
                                             total=len(sampler),
                                             gather_fn=gather_fn)
        logger.info(f"Evaluation results for {name} in csv format:")
        print_csv_format(results[name], logger)
    if len(results) == 1:
        results = list(results.values())[0]
    return results


def main():
    from nmrf_tpu.utils.runtime import configure_jax

    configure_jax()
    args = get_args_parser().parse_args()
    if args.num_hosts > 1:
        import jax

        jax.distributed.initialize(args.coordinator, args.num_hosts, args.host_rank)

    cfg = setup(args)
    logger = logging.getLogger("nmrf_tpu")

    import jax
    import jax.numpy as jnp

    from nmrf_tpu.data import PrefetchLoader, ShardedBatchSampler, build_train_dataset
    from nmrf_tpu.models import build_model
    from nmrf_tpu.parallel import (device_prefetch, make_eval_step, make_mesh,
                                   make_train_step)
    from nmrf_tpu.solver import build_optimizer
    from nmrf_tpu.utils import MetricLogger, SmoothedValue
    from nmrf_tpu.utils.checkpoint import (load_torch_checkpoint,
                                           prune_stale_latest,
                                           restore_checkpoint, save_checkpoint)

    model, criterion = build_model(cfg)

    # init params with tiny dummy shapes (shape-polymorphic modules)
    rng = jax.random.PRNGKey(max(cfg.SEED, 0))
    dummy = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = jax.jit(lambda r: model.init(r, dummy, dummy, train=False))(rng)
    num_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    logger.info("Number of params:" + str(num_params))

    # pretrained swin ingestion (reference create_backbone, backbone.py:186-196)
    if cfg.BACKBONE.MODEL_TYPE == "swin" and cfg.BACKBONE.WEIGHT_URL:
        from nmrf_tpu.utils.checkpoint import load_pretrained_swin

        params = load_pretrained_swin(params, cfg.BACKBONE.WEIGHT_URL)
        logger.info(f"Loaded pretrained backbone weights from {cfg.BACKBONE.WEIGHT_URL}")

    tx, schedule = build_optimizer(params, cfg)
    opt_state = tx.init(params)

    start_step = 0
    resume = cfg.SOLVER.RESUME
    if resume:
        logger.info("Load checkpoint: %s" % resume)
        if resume.endswith(".pth"):
            params, unmatched = load_torch_checkpoint(resume)
            if unmatched and cfg.SOLVER.STRICT_RESUME:
                raise ValueError(f"unmatched torch keys: {unmatched[:10]}...")
        else:
            (state, start_step) = restore_checkpoint(
                resume, {"params": params, "opt_state": opt_state, "step": 0})
            params, opt_state = state["params"], state["opt_state"]
            start_step = state.get("step", start_step)
            if cfg.SOLVER.NO_RESUME_OPTIMIZER:
                opt_state = tx.init(params)

    mesh = make_mesh(cfg.TPU.MESH_DATA, cfg.TPU.MESH_SPATIAL)
    if resume and not resume.endswith(".pth"):
        # orbax restores arrays committed to a single device; re-replicate
        # over the mesh or the sharded train step rejects the mixed placement
        from nmrf_tpu.parallel import replicated

        params = jax.device_put(params, replicated(mesh))
        opt_state = jax.device_put(opt_state, replicated(mesh))
    if cfg.TPU.MESH_SPATIAL > 1:
        # H-sharded decode region (shard_map collectives); same param tree,
        # bit-identical f32 outputs (tests/test_spatial_model.py)
        from nmrf_tpu.parallel.mesh import make_sharded_forward

        model_sp, _ = build_model(cfg, spatial_axis="spatial")
        eval_step = make_sharded_forward(model_sp, mesh)
        step_model = model_sp
    else:
        eval_step = make_eval_step(model)
        step_model = model

    if args.eval_only:
        evaluate(eval_step, params, cfg, logger)
        return

    # tap-MSDA exactness guard: monitor the dropped-contribution fraction
    # during swin training; warn / fall back to the exact gather path when
    # learned offsets drift out of tap range (utils/guards.py)
    from nmrf_tpu.utils.guards import TapOOBGuard

    tap_guard = TapOOBGuard(cfg.TPU.MSDA_OOB_THRESH, cfg.TPU.MSDA_OOB_FALLBACK,
                            logger)
    monitor_oob = (cfg.BACKBONE.MODEL_TYPE == "swin"
                   and cfg.TPU.MSDA_TAP_RADIUS > 0 and tap_guard.enabled)
    train_step = make_train_step(step_model, criterion, tx,
                                 seed=max(cfg.SEED, 0), mesh=mesh,
                                 monitor_oob=monitor_oob)
    dataset = build_train_dataset(cfg)
    sampler = ShardedBatchSampler(
        len(dataset), cfg.SOLVER.IMS_PER_BATCH,
        rank=jax.process_index(), world_size=jax.process_count(),
        seed=max(cfg.SEED, 0))
    loader = PrefetchLoader(dataset, sampler,
                            num_workers=cfg.DATALOADER.NUM_WORKERS,
                            use_processes=cfg.DATALOADER.USE_PROCESSES,
                            seed=max(cfg.SEED, 0))

    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(args.checkpoint_dir) if jax.process_index() == 0 else None
    except Exception:
        writer = None

    total_steps = start_step
    epoch = 0
    metric_logger = MetricLogger(delimiter="  ")
    metric_logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.7f}"))
    logger.info("Start training")

    log_freq = 20  # reference logs every 20 iters (main.py:412)
    # interval-max carry for the tap-OOB guard: the step reports
    # max(this step, carry) so the log-point readback sees the whole
    # interval, not a sample (parallel/mesh.py make_train_step)
    oob_carry = 0.0
    while total_steps < cfg.SOLVER.MAX_ITER:
        header = f"Epoch: [{epoch}]"
        for i, device_batch in enumerate(
                metric_logger.log_every(
                    device_prefetch(loader, mesh), log_freq, header,
                    logger=logger, total=len(loader))):
            params, opt_state, losses = train_step(params, opt_state,
                                                   device_batch, total_steps,
                                                   oob_carry)
            if monitor_oob:
                oob_carry = losses["msda_tap_oob"]  # device scalar, async

            total_steps += 1
            # Loss scalars stay on device between log points — a host
            # readback every step would serialize the async dispatch queue
            # and stall the TPU on the host round-trip.  Keyed on the LOADER
            # iteration: log_every prints right after the body at
            # i % log_freq == 0, so the printed meters are always current.
            if i % log_freq == 0 or total_steps == cfg.SOLVER.MAX_ITER:
                host_losses = {k: float(v) for k, v in losses.items()}
                oob_carry = 0.0  # readback consumed the interval max
                if tap_guard.check(host_losses.get("msda_tap_oob", 0.0)):
                    # rebuild the step on the unbounded exact gather path;
                    # params/opt_state carry over (same tree either way)
                    model_fb, _ = build_model(
                        cfg, spatial_axis=getattr(step_model, "spatial_axis",
                                                  None),
                        msda_tap_radius=0)
                    train_step = make_train_step(
                        model_fb, criterion, tx, seed=max(cfg.SEED, 0),
                        mesh=mesh, monitor_oob=False)
                    monitor_oob = False
                    oob_carry = 0.0
                metric_logger.update(lr=float(np.asarray(schedule(
                    (total_steps - 1) // cfg.SOLVER.ACCUM_STEPS))))
                metric_logger.update(epoch=epoch)  # reference main.py:404
                metric_logger.update(**host_losses)
                if writer is not None:
                    for k, v in host_losses.items():
                        writer.add_scalar(f"train/{k}", v, total_steps - 1)
            if (total_steps % cfg.SOLVER.LATEST_CHECKPOINT_PERIOD == 0
                    or total_steps % cfg.SOLVER.CHECKPOINT_PERIOD == 0
                    or total_steps == cfg.SOLVER.MAX_ITER):
                if jax.process_index() == 0:
                    save_checkpoint(args.checkpoint_dir, total_steps,
                                    {"params": params, "opt_state": opt_state,
                                     "step": total_steps})
                    # reference retention: ONE rolling latest + periodic
                    # snapshots (main.py:449 overwrites checkpoint_latest.pth)
                    prune_stale_latest(args.checkpoint_dir, total_steps,
                                       cfg.SOLVER.CHECKPOINT_PERIOD)
            if cfg.TEST.EVAL_PERIOD > 0 and total_steps % cfg.TEST.EVAL_PERIOD == 0:
                logger.info("Start validation")
                evaluate(eval_step, params, cfg, logger)
            if total_steps >= cfg.SOLVER.MAX_ITER:
                logger.info("Training done")
                return
        epoch += 1


if __name__ == "__main__":
    main()
