"""Multi-host communication helpers.

TPU-native replacement for the reference's Gloo object-gather side channel
(``nmrf/utils/dist_utils.py:142-183``): variable-length per-host float lists
are exchanged with one ``process_allgather`` of (count, padded values) —
no pickle RPC, just an XLA collective over DCN.
"""

from typing import List, Sequence

import numpy as np


def all_gather_float_lists(values: Sequence[float], max_len: int = None):
    """Gather a variable-length float list from every host.

    Returns a list of per-host lists (host order).  Single-process: identity.
    """
    import jax

    if jax.process_count() == 1:
        return [list(values)]

    from jax.experimental import multihost_utils

    values = np.asarray(list(values), np.float64)
    if max_len is None:
        # one cheap collective to agree on the padded size
        n = multihost_utils.process_allgather(np.asarray([len(values)],
                                                         np.int32))
        max_len = int(np.max(n))
    padded = np.zeros((max_len + 1,), np.float64)
    padded[0] = len(values)
    padded[1:1 + len(values)] = values
    # Ship the f64 payload as its uint32 bit pattern: with jax_enable_x64
    # off (the default) process_allgather silently downcasts f64 -> f32,
    # truncating the metric values (caught by tests/test_multiprocess.py).
    bits = padded.view(np.uint32)
    gathered = multihost_utils.process_allgather(bits)  # [hosts, 2*(max_len+1)]
    out: List[List[float]] = []
    for row in np.asarray(gathered):
        row = np.asarray(row, np.uint32).view(np.float64)
        cnt = int(row[0])
        out.append(list(row[1:1 + cnt]))
    return out


def metrics_gather_fn(values):
    """DispEvaluator.gather_fn adapter (see evalx.DispEvaluator.evaluate)."""
    return all_gather_float_lists(values)
