"""Superpixel-guided disparity downsampling.

The reference README instructs building a CUDA op of this name, and the
evaluator calls ``frame_utils.downsample_disp(disp_gt, superpixel_label)``
(reference ``nmrf/utils/evaluation.py:363-366``) to pool full-res GT disparity
to 1/8 for proposal-recall metrics — but the op's source is ABSENT from the
reference snapshot (see SURVEY.md §2.1).  Semantics are therefore designed
from the metric's contract and documented here:

  For each 8x8 cell, pick the majority superpixel label among valid pixels
  (disp > 0) and return the mean disparity of the valid pixels carrying that
  label; 0 if the cell has no valid pixel.  This yields an edge-aware pooled
  disparity that avoids mixing foreground/background across superpixel
  boundaries — the documented intent of the upstream op.

Implemented as dense [64 x 64] per-cell equality matmuls (MXU-friendly),
no scatter/atomics.  Dispatches on the input type: numpy arrays stay on
host (the evaluator runs metric math per frame — a device round-trip per
eval sample costs ~30 ms on the relay this framework is tuned for), jax
arrays/tracers run under jit.
"""

import jax
import jax.numpy as jnp
import numpy as np


def downsample_disp(disp, label, factor=8):
    """Label-guided pooled disparity downsample.

    Args:
      disp: [B, H, W] ground-truth disparity (0 = invalid).
      label: [B, H, W] integer superpixel assignment.
      factor: cell size (8 in the reference metric path).
    Returns:
      [B, H//factor, W//factor] pooled disparity (already in full-res units;
      caller rescales by 1/factor if comparing to coarse-grid proposals).
    """
    xp = jnp if isinstance(disp, jax.Array) else np
    B, H, W = disp.shape
    f = factor
    h, w = H // f, W // f
    d = disp[:, : h * f, : w * f].reshape(B, h, f, w, f).transpose(0, 1, 3, 2, 4).reshape(B, h, w, f * f)
    l = label[:, : h * f, : w * f].reshape(B, h, f, w, f).transpose(0, 1, 3, 2, 4).reshape(B, h, w, f * f)
    valid = (d > 0).astype(disp.dtype)  # [B,h,w,K]

    same = (l[..., :, None] == l[..., None, :]).astype(disp.dtype)  # [B,h,w,K,K]
    # votes for pixel i's label among valid pixels
    votes = xp.einsum("bhwij,bhwj->bhwi", same, valid)
    votes = xp.where(valid > 0, votes, -1.0)  # invalid pixels can't win
    winner = xp.argmax(votes, axis=-1)  # [B,h,w]

    win_match = xp.take_along_axis(same, winner[..., None, None], axis=-2).squeeze(-2)
    sel = win_match * valid  # valid pixels sharing the winning label
    count = sel.sum(axis=-1)
    pooled = (d * sel).sum(axis=-1) / xp.maximum(count, 1.0)
    return xp.where(count > 0, pooled, 0.0)
