"""Group-wise correlation cost volume.

Behavioral parity target: reference ``nmrf/models/submodule.py:4-23``
(``build_correlation_volume``) which loops over D disparities shifting the
right feature map.  Here the volume is produced as one batched matmul on the
MXU — a full [W, W] row correlation followed by a static band gather — which
is the TPU-native formulation (MXU near-peak vs D elementwise VPU passes).

Layout: channel-last.  Output is [B, H, W, G, D]
(reference layout [B, G, D, H, W] transposed to spatial-major).
"""

import jax.numpy as jnp


def groupwise_correlation(f1, f2, num_groups):
    """Per-pixel groupwise correlation. f1,f2: [B,H,W,C] -> [B,H,W,G]."""
    B, H, W, C = f1.shape
    assert C % num_groups == 0
    c = C // num_groups
    prod = (f1 * f2).reshape(B, H, W, num_groups, c)
    return prod.mean(axis=-1)


def correlation_volume_golden(f1, f2, max_disp, num_groups):
    """Reference-semantics volume via explicit shifts (test golden).

    out[b,h,w,g,d] = mean_c f1[b,h,w,g,c] * f2[b,h,w-d,g,c], 0 where w < d.
    """
    B, H, W, C = f1.shape
    vols = []
    for d in range(max_disp):
        if d == 0:
            corr = groupwise_correlation(f1, f2, num_groups)
        else:
            corr = jnp.zeros((B, H, W, num_groups), f1.dtype)
            corr = corr.at[:, :, d:].set(
                groupwise_correlation(f1[:, :, d:], f2[:, :, :-d], num_groups)
            )
        vols.append(corr)
    return jnp.stack(vols, axis=-1)  # [B,H,W,G,D]


def correlation_volume(f1, f2, max_disp, num_groups):
    """MXU-native groupwise correlation volume.

    Computes the full row-correlation matrix with one einsum (batched matmul
    over [W, c] x [c, W]) and gathers the D-wide lower band.

    Args:
      f1, f2: [B, H, W, C] left/right features.
    Returns:
      [B, H, W, G, D] cost volume; entry (w, d) correlates left pixel w with
      right pixel w-d (zero when w-d < 0).
    """
    B, H, W, C = f1.shape
    G = num_groups
    c = C // G
    a = f1.reshape(B, H, W, G, c)
    b = f2.reshape(B, H, W, G, c)
    # full correlation: [B,H,G,W,W'] via MXU
    full = jnp.einsum("bhwgc,bhvgc->bhgwv", a, b,
                      preferred_element_type=jnp.float32) / c
    # band gather: out[..., w, d] = full[..., w, w-d]
    w_idx = jnp.arange(W)[:, None]
    d_idx = jnp.arange(max_disp)[None, :]
    src = w_idx - d_idx  # [W, D]
    valid = src >= 0
    band = jnp.take_along_axis(
        full, jnp.clip(src, 0, W - 1)[None, None, None], axis=-1
    )  # [B,H,G,W,D]
    band = jnp.where(valid[None, None, None], band, 0.0)
    return jnp.transpose(band, (0, 1, 3, 2, 4)).astype(f1.dtype)  # [B,H,W,G,D]
