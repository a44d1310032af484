"""Multi-scale deformable attention — pure-jnp golden implementation.

Behavioral parity target: reference ``ms_deform_attn_core_pytorch``
(``ops/functions/ms_deform_attn_func.py:49-71``), the numerical golden model
the reference validates its CUDA kernel against (``ops/test.py``).  Sampling
uses torch grid_sample semantics: bilinear, zeros padding, align_corners=False.

This formulation is fully differentiable through XLA (gather + weighted sum);
a Pallas kernel with a custom VJP can be swapped in for the hot path.

Level spatial shapes are STATIC (python tuples) — required for XLA.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp

from .sampling import grid_sample_2d


def ms_deform_attn(value, spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations, attention_weights):
    """Multi-scale deformable attention core.

    Args:
      value: [B, S, M, D] — flattened multi-level features (S = sum H_l*W_l),
        M heads, D channels per head.
      spatial_shapes: static [(H_0, W_0), ...] per level.
      sampling_locations: [B, Lq, M, L, P, 2] in [0, 1] (x, y).
      attention_weights: [B, Lq, M, L, P] (softmax-normalized over L*P).
    Returns:
      [B, Lq, M*D]
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    grids = 2.0 * sampling_locations - 1.0

    start = 0
    out = jnp.zeros((B, Lq, M, D), value.dtype)
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start:start + H * W]  # [B, HW, M, D]
        start += H * W
        # heads into batch: [B*M, H, W, D]
        v = v.reshape(B, H, W, M, D).transpose(0, 3, 1, 2, 4).reshape(B * M, H, W, D)
        g = grids[:, :, :, lid]  # [B, Lq, M, P, 2]
        g = g.transpose(0, 2, 1, 3, 4).reshape(B * M, Lq, P, 2)
        sampled = grid_sample_2d(v, g, align_corners=False)  # [B*M, Lq, P, D]
        w = attention_weights[:, :, :, lid]  # [B, Lq, M, P]
        w = w.transpose(0, 2, 1, 3).reshape(B * M, Lq, P)
        out = out + (sampled * w[..., None]).sum(axis=2).reshape(B, M, Lq, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, M * D)
