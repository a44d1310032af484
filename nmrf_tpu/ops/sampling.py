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

    Args:
      img: [B, H, W, C]
      grid: [B, ..., 2] normalized coords in [-1, 1], (x, y) order.
      align_corners: torch convention flag.
    Returns:
      [B, ..., C]
    """
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

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi, w):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)  # [B,K]
        vals = jnp.take_along_axis(
            img.reshape(B, H * W, C), flat[..., None], axis=1
        )
        return vals * (w * inb)[..., None]

    out = (
        tap(x0i, y0i, (1 - fx) * (1 - fy))
        + tap(x0i + 1, y0i, fx * (1 - fy))
        + tap(x0i, y0i + 1, (1 - fx) * fy)
        + tap(x0i + 1, y0i + 1, fx * fy)
    )
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
    offs = jnp.arange(-radius, radius + 1, dtype=label_seed.dtype)
    idx = jnp.clip(label_seed[..., None] + offs, 0, D - 1)  # [M,N,taps]
    gathered = jnp.take_along_axis(
        cost_volume[:, :, None, :], idx[:, None, :, :], axis=-1
    )  # [M,G,N,taps]
    return jnp.transpose(gathered, (0, 2, 1, 3)).reshape(M, N, G * taps)
