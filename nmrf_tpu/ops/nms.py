"""Disparity-modal extraction: softmax + 3-tap NMS + top-k.

Behavioral parity target: reference ``nmrf/models/DPN.py:115-125``:
  prob = softmax(cost); out = maxpool1d(prob, k=3, s=1, p=1);
  non_local_max = (prob != out) & (prob > eps); prob_[non_local_max] = eps;
  label_seeds = topk(prob_, k).
"""

import jax
import jax.numpy as jnp


def max_pool_1d_3(x):
    """3-tap max pool along the last axis, stride 1, -inf padding."""
    pad = jnp.full(x.shape[:-1] + (1,), -jnp.inf, x.dtype)
    xp = jnp.concatenate([pad, x, pad], axis=-1)
    return jnp.maximum(jnp.maximum(xp[..., :-2], xp[..., 1:-1]), xp[..., 2:])


def nms_topk_seeds(prob, k, eps=1e-3):
    """Suppress non-local-max probabilities and take top-k indices.

    Args:
      prob: [..., D] softmax probabilities along disparity.
      k: number of seeds (static).
    Returns:
      [..., k] int32 disparity seeds (value-sorted, torch.topk tie-order).
    """
    pooled = max_pool_1d_3(prob)
    non_local_max = (prob != pooled) & (prob > eps)
    prob_ = jnp.where(non_local_max, eps, jax.lax.stop_gradient(prob))
    _, idx = jax.lax.top_k(prob_, k)
    return idx.astype(jnp.int32)
