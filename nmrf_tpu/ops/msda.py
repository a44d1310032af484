"""Multi-scale deformable attention — jnp golden + tap-based TPU fast path.

Behavioral parity target: reference ``ms_deform_attn_core_pytorch``
(``ops/functions/ms_deform_attn_func.py:49-71``), the numerical golden model
the reference validates its CUDA kernel against (``ops/test.py``).  Sampling
uses torch grid_sample semantics: bilinear, zeros padding, align_corners=False.

Two implementations:
  * ``ms_deform_attn`` — exact gather formulation (golden; differentiable
    through XLA).  Gather-bound on TPU.
  * ``ms_deform_attn_taps`` — tap-based formulation for grid-aligned queries
    (the adaptor's case): dense static taps replace the gathers (Pallas
    kernel, ``ops/pallas/msda.py``), exact while samples stay within
    ``radius`` level-pixels of each query's aligned cell.

Level spatial shapes are STATIC (python tuples) — required for XLA.
"""

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
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


# ------------------------------------------------------------------------- #
# Tap-based fast path (grid-aligned queries; see ops/pallas/msda.py)
# ------------------------------------------------------------------------- #

def _tap_level_inputs(locations_l, weights_l, spatial_shape, query_shape):
    """Displacements in level pixels relative to each query's base cell.

    locations_l: [B, Lq, M, P, 2] (x, y in [0, 1]); weights_l: [B, Lq, M, P].
    Returns dx, dy, aw as [B, Hq, Wq, M*P] f32.
    """
    from .pallas.msda import base_plus_one

    Hl, Wl = spatial_shape
    Hq, Wq = query_shape
    B, Lq, M, P, _ = locations_l.shape
    f = Hq // Hl
    assert Hq == Hl * f and Wq == Wl * f, (query_shape, spatial_shape)
    base_x = (base_plus_one(Wq, f) - 1).astype(np.float32)   # [Wq]
    base_y = (base_plus_one(Hq, f) - 1).astype(np.float32)   # [Hq]
    loc = locations_l.reshape(B, Hq, Wq, M * P, 2).astype(jnp.float32)
    dx = loc[..., 0] * Wl - 0.5 - base_x[None, None, :, None]
    dy = loc[..., 1] * Hl - 0.5 - base_y[None, :, None, None]
    aw = weights_l.reshape(B, Hq, Wq, M * P).astype(jnp.float32)
    return dx, dy, aw


def _halo_index_maps(Hq, Wq, f, r):
    """Row/col gather maps from the padded level map into the upsampled halo
    map ``U`` (shared by forward reference and manual backward): U[j] =
    vpad[iy[j]] along each axis, j in [0, Hq + 2*r*f)."""
    jy = np.arange(Hq + 2 * r * f, dtype=np.int64) - r * f
    iy = ((2 * jy + 1 + f) // (2 * f)).astype(np.int32) + r
    jx = np.arange(Wq + 2 * r * f, dtype=np.int64) - r * f
    ix = ((2 * jx + 1 + f) // (2 * f)).astype(np.int32) + r
    return iy, ix


def _halo_map(value_map, f, r):
    """Build the upsampled halo map U [B, Hq+2rf, Wq+2rf, MD] plus the
    numpy gather maps used to build it (needed to transpose the gather in
    the manual backward)."""
    B, Hl, Wl, MD = value_map.shape
    vpad = jnp.pad(value_map,
                   ((0, 0), (r + 1, r + 1), (r + 1, r + 1), (0, 0)))
    iy, ix = _halo_index_maps(Hl * f, Wl * f, f, r)
    return vpad[:, iy][:, :, ix], iy, ix


def _tap_level_reference(value_map, dx, dy, aw, num_heads, radius):
    """jnp tap formulation (differentiable; semantics golden for the kernel).

    value_map: [B, Hl, Wl, M*D]; dx/dy/aw: [B, Hq, Wq, M*P] f32.
    Bit-identical semantics to ``ops.pallas.msda.msda_taps_level``.
    """
    B, Hl, Wl, MD = value_map.shape
    _, Hq, Wq, MP = dx.shape
    M = num_heads
    P = MP // M
    D = MD // M
    f = Hq // Hl
    r = int(radius)
    taps = 2 * r + 1
    U, _, _ = _halo_map(value_map, f, r)              # [B, Hq+2rf, Wq+2rf, MD]

    dx5 = dx.reshape(B, Hq, Wq, M, P)
    dy5 = dy.reshape(B, Hq, Wq, M, P)
    aw5 = aw.reshape(B, Hq, Wq, M, P)

    def body(acc, t):
        ty = t // taps - r
        tx = t % taps - r
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy5 - ty))
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(dx5 - tx))
        w = (aw5 * hy * hx).sum(-1)                   # [B, Hq, Wq, M]
        u = jax.lax.dynamic_slice(
            U, (0, (ty + r) * f, (tx + r) * f, 0), (B, Hq, Wq, MD))
        u = u.reshape(B, Hq, Wq, M, D).astype(jnp.float32)
        return acc + w[..., None] * u, ()

    acc, _ = jax.lax.scan(
        body, jnp.zeros((B, Hq, Wq, M, D), jnp.float32),
        jnp.arange(taps * taps))
    return acc.reshape(B, Hq, Wq, MD).astype(value_map.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _tap_level_op(value_map, dx, dy, aw, num_heads, radius):
    from .pallas.msda import msda_taps_level

    # partition=True: the adaptor always runs in the GSPMD region (swin
    # backbone), never inside shard_map — a sharded batch stays sharded
    return msda_taps_level(value_map, dx, dy, aw, num_heads, radius,
                           partition=True)


def _tap_fwd(value_map, dx, dy, aw, num_heads, radius):
    return (_tap_level_op(value_map, dx, dy, aw, num_heads, radius),
            (value_map, dx, dy, aw))


def _tap_bwd(num_heads, radius, res, g):
    """Manual rematerializing backward for the tap formulation.

    ``jax.vjp`` through ``_tap_level_reference``'s tap scan saves per-tap
    residuals — (2r+1)^2 stacked [B,Hq,Wq,M,P]/[B,Hq,Wq,MD] f32 buffers
    (~49 GB for the swin adaptor's r=5 level at train batch 8), which OOMs
    the swin train step.  Instead, scan over taps carrying only the gradient
    accumulators and recompute the hat weights per tap; the halo-map gather
    is transposed once at the end with two segment-sums.  Matches the
    autodiff cotangents exactly away from the measure-zero hat kinks
    (|d - t| ∈ {0, 1}), where subgradient choices differ.
    """
    value_map, dx, dy, aw = res
    B, Hl, Wl, MD = value_map.shape
    _, Hq, Wq, MP = dx.shape
    M = num_heads
    P = MP // M
    f = Hq // Hl
    r = int(radius)
    taps = 2 * r + 1

    U, iy, ix = _halo_map(value_map, f, r)
    U = U.astype(jnp.float32)
    g5 = g.reshape(B, Hq, Wq, M, MD // M).astype(jnp.float32)
    dx5 = dx.reshape(B, Hq, Wq, M, P)
    dy5 = dy.reshape(B, Hq, Wq, M, P)
    aw5 = aw.reshape(B, Hq, Wq, M, P)

    def body(carry, t):
        ddx, ddy, daw, dU = carry
        ty = t // taps - r
        tx = t % taps - r
        zy = dy5 - ty.astype(jnp.float32)
        zx = dx5 - tx.astype(jnp.float32)
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(zy))
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(zx))
        off = (0, (ty + r) * f, (tx + r) * f, 0)
        u5 = jax.lax.dynamic_slice(U, off, (B, Hq, Wq, MD)).reshape(g5.shape)
        s = (g5 * u5).sum(-1)[..., None]              # [B,Hq,Wq,M,1]
        daw = daw + hy * hx * s
        gy = jnp.where(jnp.abs(zy) < 1.0, -jnp.sign(zy), 0.0)
        gx = jnp.where(jnp.abs(zx) < 1.0, -jnp.sign(zx), 0.0)
        ddy = ddy + aw5 * hx * gy * s
        ddx = ddx + aw5 * hy * gx * s
        w = (aw5 * hy * hx).sum(-1)                   # [B,Hq,Wq,M]
        gu = (w[..., None] * g5).reshape(B, Hq, Wq, MD)
        patch = jax.lax.dynamic_slice(dU, off, (B, Hq, Wq, MD))
        dU = jax.lax.dynamic_update_slice(dU, patch + gu, off)
        return (ddx, ddy, daw, dU), ()

    z5 = jnp.zeros(dx5.shape, jnp.float32)
    (ddx, ddy, daw, dU), _ = jax.lax.scan(
        body, (z5, z5, z5, jnp.zeros(U.shape, jnp.float32)),
        jnp.arange(taps * taps))

    # Transpose the halo gather: dvpad[i] = sum_{j: iy[j]=i} dU[j] per axis.
    Hp, Wp = Hl + 2 * (r + 1), Wl + 2 * (r + 1)
    t0 = jax.ops.segment_sum(dU.transpose(1, 0, 2, 3), jnp.asarray(iy),
                             num_segments=Hp)         # [Hp, B, Wu, MD]
    t1 = jax.ops.segment_sum(t0.transpose(2, 1, 0, 3), jnp.asarray(ix),
                             num_segments=Wp)         # [Wp, B, Hp, MD]
    dvpad = t1.transpose(1, 2, 0, 3)                  # [B, Hp, Wp, MD]
    dvalue = dvpad[:, r + 1:r + 1 + Hl,
                   r + 1:r + 1 + Wl, :].astype(value_map.dtype)
    return (dvalue, ddx.reshape(dx.shape), ddy.reshape(dy.shape),
            daw.reshape(aw.shape))


_tap_level_op.defvjp(_tap_fwd, _tap_bwd)


def ms_deform_attn_taps(value, spatial_shapes: Sequence[Tuple[int, int]],
                        sampling_locations, attention_weights,
                        query_shape: Tuple[int, int], radius: int,
                        use_kernel: bool = True):
    """Tap-based MSDA for grid-aligned queries (same contract as
    ``ms_deform_attn``, plus the static query grid shape).

    Exact (matches ``ms_deform_attn`` bit-for-bit up to summation order)
    whenever every sample lies within ``radius`` level-pixels of its query's
    aligned base cell per axis — guaranteed when learned offsets stay within
    ``radius - 1`` (the in-cell alignment fraction is < 1); contributions
    beyond the tap span are dropped.  The reference initialises offsets to
    <= 4 px (``ops/modules/ms_deform_attn.py:64-75``).

    value: [B, S, M, D]; sampling_locations: [B, Lq, M, L, P, 2];
    attention_weights: [B, Lq, M, L, P]; query_shape: (Hq, Wq), Lq = Hq*Wq.
    Returns [B, Lq, M*D].
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    Hq, Wq = query_shape
    assert Lq == Hq * Wq
    out = None
    start = 0
    fn = _tap_level_op if use_kernel else _tap_level_reference
    for lid, (Hl, Wl) in enumerate(spatial_shapes):
        vmap_l = value[:, start:start + Hl * Wl].reshape(B, Hl, Wl, M * D)
        start += Hl * Wl
        dx, dy, aw = _tap_level_inputs(
            sampling_locations[:, :, :, lid], attention_weights[:, :, :, lid],
            (Hl, Wl), query_shape)
        o = fn(vmap_l, dx, dy, aw, M, radius)
        out = o if out is None else out + o
    return out.reshape(B, Lq, M * D).astype(value.dtype)


def tap_out_of_range_fraction(sampling_locations, spatial_shapes,
                              query_shape, radius):
    """Fraction of sampling points whose displacement from their query's
    base cell exceeds the tap span per axis — i.e. whose contribution
    ``ms_deform_attn_taps`` drops.  0.0 means the tap path is exact for
    these inputs.  Cheap (one elementwise reduce); jit-safe."""
    fracs = []
    for lid, (Hl, Wl) in enumerate(spatial_shapes):
        dx, dy, _ = _tap_level_inputs(
            sampling_locations[:, :, :, lid],
            jnp.zeros(sampling_locations.shape[:3]
                      + (sampling_locations.shape[4],), jnp.float32),
            (Hl, Wl), query_shape)
        oob = (jnp.abs(dx) > radius) | (jnp.abs(dy) > radius)
        fracs.append(jnp.mean(oob.astype(jnp.float32)))
    return jnp.stack(fracs).max()
