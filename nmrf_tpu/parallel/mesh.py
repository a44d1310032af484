"""Device mesh construction and sharded train/eval steps.

TPU-native replacement for the reference's process-per-GPU DDP runtime
(``main.py:87-183``, ``dist_utils.py``): a single ``jax.sharding.Mesh`` with
axes (data, spatial); the train step is jit-compiled with the batch sharded
over ``data`` and parameters replicated — XLA inserts the gradient psum over
ICI (the DDP-allreduce equivalent), per SURVEY.md §2.4.

Multi-host: call ``initialize_distributed()`` once per host before building
the mesh; ``jax.devices()`` then spans all hosts.
"""

import optax
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host rendezvous (replaces torch.distributed init, main.py:162-168).

    No-ops when single-process (env-driven auto-detect inside jax)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(data: int = -1, spatial: int = 1, devices=None) -> Mesh:
    """Build a (data, spatial) mesh. data=-1 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % spatial == 0, (n, spatial)
        data = n // spatial
    assert data * spatial == n, (data, spatial, n)
    return Mesh(devices.reshape(data, spatial), ("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over `data` (DistributedSampler analog)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Host->device transfer of a numpy batch dict with batch-axis sharding."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if k == "meta":
            continue
        out[k] = jax.device_put(np.asarray(v), sh)
    return out


def make_train_step(model, criterion, tx, seed: int = 0):
    """Build the jitted sharded train step.

    Returns step(params, opt_state, batch, step_idx) -> (params, opt_state,
    metrics).  Batch arrives sharded on `data`; XLA inserts the grad
    all-reduce.  A per-step dropout rng is derived from (cfg.SEED, step_idx)
    (used by DropPath/Dropout when the config enables them, e.g. swin
    drop-path).
    """

    def loss_fn(params, batch, rng):
        out = model.apply(params, batch["img1"], batch["img2"], train=True,
                          rngs={"dropout": rng})
        losses = criterion(out, {"disp": batch["disp"], "valid": batch["valid"]})
        return losses["total"], losses

    # NOTE: no donate_argnums — buffer donation corrupts live buffers through
    # this environment's device relay (params turn NaN on the second step);
    # re-enable once verified on a direct-attached TPU runtime.
    @jax.jit
    def step(params, opt_state, batch, step_idx=0):
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), step_idx)
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return step


def make_eval_step(model):
    @jax.jit
    def step(params, img1, img2):
        return model.apply(params, img1, img2, train=False)

    return step
