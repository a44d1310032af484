"""Soft disparity histogram (scatter-add) for the init-distribution loss.

Behavioral parity target: reference ``Criterion.loss_init``
(``nmrf/models/NMRF.py:343-358``): linear-interpolated scatter of per-pixel
GT disparities into an 8x8-cell histogram over D bins.

The torch version uses ``scatter_reduce_``; here a one-hot matmul is used —
a segment-sum formulated as [cells, taps] x [taps -> D] one-hot contraction
which XLA lowers to an MXU matmul instead of a serialized scatter.
"""

import jax.numpy as jnp


def soft_histogram(values, weights, num_bins):
    """Accumulate linearly-interpolated soft counts into histogram bins.

    Args:
      values: [M, T] fractional bin positions (>= 0).
      weights: [M, T] per-sample weights (0 for invalid).
      num_bins: D (static).
    Returns:
      [M, D] soft histogram: each value v scatters (1-frac) to floor(v) and
      frac to floor(v)+1, both clamped to D-1 (reference clamp semantics).
    """
    lower = jnp.floor(values).astype(jnp.int32)
    frac = values - lower
    lo = jnp.clip(lower, None, num_bins - 1)
    hi = jnp.clip(lower + 1, None, num_bins - 1)
    w_lo = (1.0 - frac) * weights
    w_hi = frac * weights

    bins = jnp.arange(num_bins, dtype=jnp.int32)
    # one-hot contraction: [M,T,D] mask * weight, summed over T via matmul
    oh_lo = (lo[..., None] == bins).astype(values.dtype)
    oh_hi = (hi[..., None] == bins).astype(values.dtype)
    hist = jnp.einsum("mt,mtd->md", w_lo, oh_lo,
                      preferred_element_type=jnp.float32)
    hist = hist + jnp.einsum("mt,mtd->md", w_hi, oh_hi,
                             preferred_element_type=jnp.float32)
    return hist.astype(values.dtype)
