"""Worker for the 2-process DP TRAINING test (tests/test_multiprocess.py).

Each process: ``jax.distributed.initialize`` over a CPU coordination service
(1 local device each -> global mesh data=2), a per-rank
``ShardedBatchSampler`` shard of every global batch assembled into global
arrays by ``parallel.shard_batch`` (``jax.make_array_from_process_local_data``),
and N_STEPS real train steps (grads psummed across the 2-process mesh by
XLA).  Rank 0 writes the final params; the parent asserts they are
bit-identical to a single-process run that sees the same GLOBAL batches on a
1-process data=2 mesh — the DDP gradient-equivalence the reference gets from
every real multi-GPU run (reference ``main.py:334-339``).

Shared between the worker processes and the parent test so model/recipe are
identical by construction.
"""

import sys

import numpy as np

N_STEPS = 3
DATASET_LEN = 6  # 3 steps x global batch 2
GLOBAL_BATCH = 2


def tiny_cfg():
    from nmrf_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.DATASETS.CROP_SIZE = (64, 128)
    cfg.SOLVER.IMS_PER_BATCH = GLOBAL_BATCH
    cfg.SOLVER.MAX_ITER = N_STEPS
    cfg.DPN.MAX_DISP = 64
    cfg.SOLVER.MAX_DISP = 48
    cfg.freeze()
    return cfg


def make_sample(idx):
    """Deterministic synthetic sample keyed by DATASET index (rank-free)."""
    from nmrf_tpu.data.synthetic import make_stereo_pair

    rng = np.random.RandomState(4242 + int(idx))
    i1, i2, d, v = make_stereo_pair(64, 128, max_disp=48, rng=rng)
    return {"img1": i1, "img2": i2, "disp": d.astype(np.float32), "valid": v}


def stack_indices(indices):
    samples = [make_sample(i) for i in indices]
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def run_training(rank: int, world_size: int, mesh):
    """Build model/optimizer and run N_STEPS sharded train steps.

    The caller provides the mesh (global 2-device in both the 1-process and
    2-process configurations) so the compiled SPMD program is identical; only
    the process topology differs.
    """
    import jax

    from nmrf_tpu.data.loader import ShardedBatchSampler
    from nmrf_tpu.models import build_model
    from nmrf_tpu.parallel import make_train_step, replicated, shard_batch
    from nmrf_tpu.solver import build_optimizer

    cfg = tiny_cfg()
    model, criterion = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.SEED)
    img0 = np.zeros((1, 64, 128, 3), np.float32)
    rep = replicated(mesh)
    # init/opt-state under jit with replicated out_shardings: produces global
    # replicated arrays on BOTH process topologies (device_put of host arrays
    # to a multi-process sharding is not universally supported)
    params = jax.jit(
        lambda r: model.init(r, img0, img0, train=False),
        out_shardings=rep)(rng)
    tx, _ = build_optimizer(params, cfg)
    opt_state = jax.jit(tx.init, out_shardings=rep)(params)
    step_fn = make_train_step(model, criterion, tx, seed=cfg.SEED)

    sampler = ShardedBatchSampler(DATASET_LEN, GLOBAL_BATCH, rank=rank,
                                  world_size=world_size, seed=cfg.SEED)
    indices = sampler.epoch_indices(0)
    assert indices.shape == (N_STEPS, GLOBAL_BATCH // world_size)
    for s in range(N_STEPS):
        batch = shard_batch(stack_indices(indices[s]), mesh)
        params, opt_state, losses = step_fn(params, opt_state, batch, s)
        # replicated scalar: np.asarray is allowed on fully-replicated arrays
        assert np.isfinite(float(np.asarray(losses["total"]))), (s, losses)
    return params


def params_to_flat(params):
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return flat


def main():
    """nproc>1: one rank of a jax.distributed run (1 local device each).
    nproc==1: the single-process ground truth on a local 2-device mesh.
    Both paths build the SAME global data=2 mesh, so the compiled SPMD
    program is identical and params must match bit-for-bit."""
    coord, nproc, rank, out_path = sys.argv[1:5]
    nproc, rank = int(nproc), int(rank)
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={2 if nproc == 1 else 1}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    # must match across the two topologies or the comparison is vacuous
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if nproc > 1:
        jax.distributed.initialize(coord, nproc, rank)
        assert jax.process_count() == nproc
        assert len(jax.local_devices()) == 1  # 1 local device per process
    assert len(jax.devices()) == 2

    from nmrf_tpu.parallel import make_mesh

    mesh = make_mesh(2, 1)
    params = run_training(jax.process_index(), nproc, mesh)
    if jax.process_index() == 0:
        np.savez(out_path, **params_to_flat(params))
    if nproc > 1:
        # keep the non-zero ranks alive until rank 0 has written (the
        # distributed runtime tears down collectives on early exit)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mp_train_done")


if __name__ == "__main__":
    main()
