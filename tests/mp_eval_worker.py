"""Worker for the 2-process multi-host eval test (tests/test_multiprocess.py).

Each process: jax.distributed.initialize over a CPU coordination service,
evaluate ONLY its InferenceSampler shard of a deterministic synthetic
dataset, then aggregate per-sample metric lists with metrics_gather_fn
(process_allgather over the multi-process CPU backend).  Rank 0 writes the
gathered result; the parent asserts it equals a single-process evaluation
of the full dataset — the contract of reference evaluation.py:42-75,386-397.
"""

import json
import os
import sys

import numpy as np

N_SAMPLES = 7  # odd on purpose: shards are uneven (4 + 3)
H, W = 24, 32


def make_sample(i):
    """Deterministic per-index (gt, valid, pred) triple."""
    rng = np.random.RandomState(100 + i)
    gt = (rng.rand(H, W) * 60).astype(np.float32)
    valid = rng.rand(H, W) > 0.15
    # fake "model": prediction = gt + structured index-dependent error
    pred = gt + np.sin(np.arange(H * W).reshape(H, W) * 0.1 + i).astype(
        np.float32) * (0.5 + 0.5 * i)
    return gt, valid, pred


def run_eval(sampler_indices, gather_fn=None):
    from nmrf_tpu.evalx.evaluation import DispEvaluator

    ev = DispEvaluator(thres=[1, 3], only_valid=True, max_disp=192,
                       eval_prop=False)
    for i in sampler_indices:
        gt, valid, pred = make_sample(i)
        ev.process({"disp": gt[None], "valid": valid[None]},
                   {"disp": pred[None]})
    return ev.evaluate(gather_fn=gather_fn)


def main():
    coord, nproc, rank, out_path = sys.argv[1:5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coord, int(nproc), int(rank))
    assert jax.process_count() == int(nproc)

    from nmrf_tpu.data.loader import InferenceSampler
    from nmrf_tpu.utils.dist import metrics_gather_fn

    sampler = InferenceSampler(N_SAMPLES, rank=jax.process_index(),
                               world_size=jax.process_count())
    res = run_eval(sampler, gather_fn=metrics_gather_fn)
    if jax.process_index() == 0:
        payload = {"result": res["disp"],
                   "shard_len": len(sampler),
                   "world": jax.process_count()}
        with open(out_path, "w") as f:
            json.dump(payload, f)


if __name__ == "__main__":
    main()
