"""SPMD batch partitioning for the Pallas kernels.

Why this exists: a ``pallas_call`` is an opaque custom call to XLA's
partitioner, so under a data-parallel ``jit`` (mesh batch sharding, the DDP
analog — parallel/mesh.py) GSPMD must REPLICATE its operands: every device
all-gathers the full batch of q/k/v and computes every sample's attention
(r3 SCALING.json recorded 10-42 MB/step of exactly these all-gathers, and
the redundant compute grows with the data axis).  The reference never hits
this — its CUDA kernels run under torch DDP where each rank only ever holds
its local batch (reference ``main.py:334-339``).

The TPU-native fix: wrap each kernel in ``jax.experimental.
custom_partitioning`` declaring the batch dimension embarrassingly parallel
(it is a grid axis in every kernel).  The partitioner then keeps the batch
sharded — each device runs the kernel on its local samples — and forces
every other dimension replicated (resharding inputs if a caller ever hands
them H-sharded, which is exactly the correct semantics: the kernels need
whole stripes/windows/tap-halos).

Usage: kernels gate this behind an explicit ``partition`` flag threaded
from the model layer — INSIDE ``shard_map`` (the spatial-sharding decode
path) tensors are already per-device and the flag stays False.  With a
single device the wrapper is a no-op passthrough, so the single-chip
bench/serving programs are byte-identical to the unwrapped kernels.
"""

import functools

import jax
from jax.experimental.custom_partitioning import (SdyShardingRule,
                                                  custom_partitioning)
from jax.sharding import NamedSharding, PartitionSpec as P


def _batch_axis(batch_dims, arg_infos):
    """The mesh-axis entry of the first sharded batch dimension (None when
    every batched operand's batch dim is unsharded)."""
    for i, bd in enumerate(batch_dims):
        if bd is None:
            continue
        sh = getattr(arg_infos[i], "sharding", None)
        if sh is None:
            continue
        spec = sh.spec
        if len(spec) > bd and spec[bd] is not None:
            return spec[bd]
    return None


@functools.lru_cache(maxsize=None)
def _build_op(fn, statics, batch_dims, ranks, res_ranks):
    """Cached custom_partitioning op for one (kernel, static-config) pair.

    fn: module-level callable taking the traced operands positionally and
    the statics as keyword args.  batch_dims: per-operand batch-dim index
    or None (replicated operand).  res_ranks: an int (single result) or a
    tuple of ints (tuple result) — every result's batch dim is 0.
    """
    kwargs = dict(statics)
    multi = isinstance(res_ranks, tuple)

    def call(*args):
        return fn(*args, **kwargs)

    op = custom_partitioning(call)

    def infer(mesh, arg_infos, result_infos):
        sh = NamedSharding(mesh, P(_batch_axis(batch_dims, arg_infos)))
        return tuple(sh for _ in res_ranks) if multi else sh

    def partition(mesh, arg_infos, result_infos):
        b = _batch_axis(batch_dims, arg_infos)
        arg_sh = []
        for info, bd, rank in zip(arg_infos, batch_dims, ranks):
            spec = [None] * rank
            if bd is not None and rank:
                spec[bd] = b
            arg_sh.append(NamedSharding(mesh, P(*spec)))
        out_sh = NamedSharding(mesh, P(b))
        if multi:
            out_sh = tuple(out_sh for _ in res_ranks)
        return mesh, call, out_sh, tuple(arg_sh)

    # propagation rule (shardy): one shared batch factor; every other dim
    # is a unique factor so nothing else propagates through the op
    operand_mappings = []
    for i, (bd, rank) in enumerate(zip(batch_dims, ranks)):
        operand_mappings.append(tuple(
            "b" if d == bd else f"a{i}_{d}" for d in range(rank)))
    result_mappings = tuple(
        tuple("b" if d == 0 else f"r{j}_{d}" for d in range(rr))
        for j, rr in enumerate(res_ranks if multi else (res_ranks,)))
    op.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=SdyShardingRule(
            operand_mappings=tuple(operand_mappings),
            result_mappings=result_mappings))
    return op


def shard_over_batch(fn, batch_dims, res_rank, args, statics=()):
    """Run ``fn(*args, **dict(statics))`` as a batch-partitioned op.

    Single-device processes take the direct path (identical HLO to the
    bare kernel — keeps single-chip programs and their compile cache
    unchanged); with >1 addressable device the call lowers through
    ``custom_partitioning`` so a sharded batch stays sharded.
    """
    if jax.device_count() <= 1:
        return fn(*args, **dict(statics))
    ranks = tuple(getattr(a, "ndim", 0) for a in args)
    op = _build_op(fn, tuple(statics), tuple(batch_dims), ranks,
                   tuple(res_rank) if isinstance(res_rank, (tuple, list))
                   else int(res_rank))
    return op(*args)
