"""Bilinear sampling ops (grid_sample equivalents) and cost gathering.

Behavioral parity targets:
  * ``disp_warp``: reference ``Inference.sample_fmap`` (``nmrf/models/NMP.py:682-707``)
    — horizontal-only bilinear warp with align_corners=True, zeros padding.
  * ``grid_sample_2d``: torch ``F.grid_sample`` (bilinear, zeros padding), both
    align_corners conventions — numerical golden for the MSDeformAttn kernel
    (reference ``ops/functions/ms_deform_attn_func.py:49-71``).
  * ``sample_cost``: reference ``Propagation.sample_cost`` (``NMP.py:618-634``).

All arrays are channel-last (TPU-native NHWC).
"""

import jax
import jax.numpy as jnp


def _gather_w(fmap, idx):
    """Gather along the W axis. fmap: [B,H,W,C], idx: [B,H,K] int -> [B,H,K,C]."""
    return jnp.take_along_axis(fmap[:, :, :, :], idx[..., None], axis=2)


def disp_warp(fmap, disp, radius=0):
    """Warp ``fmap`` horizontally by candidate disparities.

    For output location (h, w, n, tap r): sample fmap at x = w - disp[...,n] - r,
    bilinear in x, exact in y, zero outside [0, W-1] (torch grid_sample
    'zeros' + align_corners=True semantics reduce to pixel-space interpolation).

    Args:
      fmap: [B, H, W, C]
      disp: [B, H, W, N] (float) disparities.
      radius: extra integer taps r in [-radius, radius].
    Returns:
      [B, H, W, N*(2*radius+1), C] sampled features, tap-major per candidate
      (matches reference ordering: for each n, taps r=-radius..radius).
    """
    B, H, W, C = fmap.shape
    N = disp.shape[-1]
    taps = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1, dtype=disp.dtype)  # [taps]
    # x position in source image: [B,H,W,N,taps]
    xs = jnp.arange(W, dtype=disp.dtype)[None, None, :, None, None]
    x = xs - disp[..., None] - offs
    x = x.reshape(B, H, W * N * taps)

    x0 = jnp.floor(x)
    frac = x - x0
    x0i = x0.astype(jnp.int32)
    x1i = x0i + 1
    in0 = (x0i >= 0) & (x0i <= W - 1)
    in1 = (x1i >= 0) & (x1i <= W - 1)
    v0 = _gather_w(fmap, jnp.clip(x0i, 0, W - 1))  # [B,H,K,C]
    v1 = _gather_w(fmap, jnp.clip(x1i, 0, W - 1))
    # compute blend weights in the position dtype, apply in the feature dtype
    w0 = ((1.0 - frac) * in0)[..., None].astype(fmap.dtype)
    w1 = (frac * in1)[..., None].astype(fmap.dtype)
    out = v0 * w0 + v1 * w1
    return out.reshape(B, H, W, N * taps, C)


def grid_sample_2d(img, grid, align_corners=False):
    """Bilinear 2D sampling with zeros padding (torch ``F.grid_sample`` golden).

    TPU formulation: ONE ``lax.gather`` fetching a [2, 2, C] patch per point
    (instead of four independent corner gathers — gathers are the cost on
    TPU, not FLOPs).  The patch start is clamped into bounds and each patch
    cell is weighted by the hat function of its ABSOLUTE coordinate,
    ``relu(1 - |x - xs|) * relu(1 - |y - ys|)``, which reproduces exact
    bilinear-with-zeros semantics for every case (interior, border,
    fully out of range) without per-corner masks.

    Args:
      img: [B, H, W, C]
      grid: [B, ..., 2] normalized coords in [-1, 1], (x, y) order.
      align_corners: torch convention flag.
    Returns:
      [B, ..., C]
    """
    import jax
    from jax import lax

    B, H, W, C = img.shape
    lead = grid.shape[1:-1]
    g = grid.reshape(B, -1, 2)
    gx, gy = g[..., 0], g[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = (gx + 1.0) * 0.5 * W - 0.5
        y = (gy + 1.0) * 0.5 * H - 0.5
    if H < 2 or W < 2:
        # degenerate 1-px axis: zero-pad (weights of padded cells follow the
        # same hat function, so contributions are exact)
        img = jnp.pad(img, ((0, 0), (0, max(2 - H, 0)),
                            (0, max(2 - W, 0)), (0, 0)))

    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(H - 2, 0))
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(W - 2, 0))
    starts = jnp.stack([y0, x0], axis=-1)  # [B, K, 2]

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    gather = lambda im, st: lax.gather(  # noqa: E731
        im, st, dnums, slice_sizes=(2, 2, C),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    patch = jax.vmap(gather)(img, starts)  # [B, K, 2, 2, C]

    # hat weights of the absolute patch coordinates (zero when the true
    # sampling point is >=1 px away — covers clamping and out-of-range)
    ys = y0[..., None] + jnp.arange(2, dtype=jnp.int32)  # [B, K, 2]
    xs = x0[..., None] + jnp.arange(2, dtype=jnp.int32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - ys))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - xs))
    w = (wy[:, :, :, None] * wx[:, :, None, :]).astype(img.dtype)
    out = jnp.einsum("bkyxc,bkyx->bkc", patch, w)
    return out.reshape(B, *lead, C)


def sample_cost(cost_volume, label_seed, radius=4):
    """Gather per-seed local cost profiles.

    Args:
      cost_volume: [M, G, D] groupwise cost (M = B*H*W).
      label_seed: [M, N] integer disparity modes.
      radius: taps at seed + [-radius, radius], clamped to [0, D-1].
    Returns:
      [M, N, G*(2*radius+1)] — group-major per candidate
      (g0 taps..., g1 taps...), matching reference 'b h (n c) -> b n (h c)'.
    """
    M, G, D = cost_volume.shape
    N = label_seed.shape[1]
    taps = 2 * radius + 1
    # TPU formulation: lane-axis take_along_axis is pathologically slow (the
    # profiled gather cost 1.9 ms/frame at KITTI resolution).  Seeds are
    # in-range topk indices, so clip(seed + off, 0, D-1) equals an
    # edge-replicated read at (seed + off): edge-pad the D band once, slice
    # the taps statically (free views), and select the seed with a one-hot
    # multiply-sum that fuses into the reduction — no gather at all.
    pad = jnp.pad(cost_volume, ((0, 0), (0, 0), (radius, radius)),
                  mode="edge")  # [M, G, D + 2*radius]
    # win[m, g, t, d] = pad[m, g, d + t] == cost at seed_index d, tap t
    win = jnp.stack([pad[:, :, t:t + D] for t in range(taps)], axis=2)
    onehot = jax.nn.one_hot(label_seed, D, dtype=cost_volume.dtype)  # [M,N,D]
    out = jnp.einsum("mnd,mgtd->mngt", onehot, win)
    return out.reshape(M, N, G * taps)
