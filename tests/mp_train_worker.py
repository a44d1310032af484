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
# spatial topology: H=96 -> h8 local 6 (window 6) / h4 local 24 (window 4)
# per spatial=2 tile — the minimal window-aligned tiling (test_spatial_model)
CROP = {"2x1": (64, 128), "1x2": (96, 96)}


def tiny_cfg(mesh_spec="2x1"):
    from nmrf_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.DATASETS.CROP_SIZE = CROP[mesh_spec]
    cfg.SOLVER.IMS_PER_BATCH = GLOBAL_BATCH
    cfg.SOLVER.MAX_ITER = N_STEPS
    cfg.DPN.MAX_DISP = 64
    cfg.SOLVER.MAX_DISP = 48
    cfg.freeze()
    return cfg


def make_sample(idx, crop=(64, 128)):
    """Deterministic synthetic sample keyed by DATASET index (rank-free)."""
    from nmrf_tpu.data.synthetic import make_stereo_pair

    rng = np.random.RandomState(4242 + int(idx))
    i1, i2, d, v = make_stereo_pair(crop[0], crop[1], max_disp=48, rng=rng)
    return {"img1": i1, "img2": i2, "disp": d.astype(np.float32), "valid": v}


def stack_indices(indices, crop=(64, 128)):
    samples = [make_sample(i, crop) for i in indices]
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def run_training(rank: int, world_size: int, mesh, mesh_spec="2x1"):
    """Build model/optimizer and run N_STEPS sharded train steps.

    The caller provides the mesh (global 2-device in both the 1-process and
    2-process configurations) so the compiled SPMD program is identical; only
    the process topology differs.

    mesh_spec "1x2" (VERDICT r4 item 5): the SPATIAL axis crosses the
    process boundary — every ppermute window roll / halo exchange / stripe
    all-gather in parallel/spatial.py runs between two real
    ``jax.distributed`` processes.  The data world is 1, so each process
    builds the full global batch and contributes its H-half
    (``jax.make_array_from_process_local_data`` along `spatial`).
    """
    import jax

    from nmrf_tpu.data.loader import ShardedBatchSampler
    from nmrf_tpu.models import build_model
    from nmrf_tpu.parallel import make_train_step, replicated, shard_batch
    from nmrf_tpu.solver import build_optimizer

    spatial = mesh_spec == "1x2"
    cfg = tiny_cfg(mesh_spec)
    crop = CROP[mesh_spec]
    model, criterion = build_model(
        cfg, spatial_axis="spatial" if spatial else None)
    # init must run outside shard_map: use the unsharded twin (identical
    # param structure; test_spatial_model.py uses the same pattern)
    init_model = build_model(cfg)[0] if spatial else model
    rng = jax.random.PRNGKey(cfg.SEED)
    img0 = np.zeros((1,) + crop + (3,), np.float32)
    rep = replicated(mesh)
    # init/opt-state under jit with replicated out_shardings: produces global
    # replicated arrays on BOTH process topologies (device_put of host arrays
    # to a multi-process sharding is not universally supported)
    params = jax.jit(
        lambda r: init_model.init(r, img0, img0, train=False),
        out_shardings=rep)(rng)
    tx, _ = build_optimizer(params, cfg)
    opt_state = jax.jit(tx.init, out_shardings=rep)(params)
    step_fn = make_train_step(model, criterion, tx, seed=cfg.SEED,
                              mesh=mesh if spatial else None)

    # spatial topology: the DATA world is 1 — every process enumerates the
    # full global batch and contributes its H-half below
    data_world = 1 if spatial else world_size
    sampler = ShardedBatchSampler(DATASET_LEN, GLOBAL_BATCH,
                                  rank=0 if spatial else rank,
                                  world_size=data_world, seed=cfg.SEED)
    indices = sampler.epoch_indices(0)
    assert indices.shape == (N_STEPS, GLOBAL_BATCH // data_world)
    for s in range(N_STEPS):
        batch = stack_indices(indices[s], crop)
        if spatial and world_size > 1:
            # this process's H-half (its addressable shard along `spatial`)
            h_half = crop[0] // world_size
            batch = {k: v[:, rank * h_half:(rank + 1) * h_half]
                     for k, v in batch.items()}
        batch = shard_batch(batch, mesh)
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
    Both paths build the SAME global 2-device mesh (data=2 or spatial=2 per
    argv[5]), so the compiled SPMD program is identical and params must
    match bit-for-bit."""
    coord, nproc, rank, out_path = sys.argv[1:5]
    mesh_spec = sys.argv[5] if len(sys.argv) > 5 else "2x1"
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

    data, spatial = (int(v) for v in mesh_spec.split("x"))
    mesh = make_mesh(data, spatial)
    params = run_training(jax.process_index(), nproc, mesh, mesh_spec)
    if jax.process_index() == 0:
        np.savez(out_path, **params_to_flat(params))
    if nproc > 1:
        # keep the non-zero ranks alive until rank 0 has written (the
        # distributed runtime tears down collectives on early exit)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mp_train_done")


if __name__ == "__main__":
    main()
