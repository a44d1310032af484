"""Tap-based multi-scale deformable attention (Pallas TPU kernel).

The exact MSDA op (``ops/msda.ms_deform_attn``, golden vs the reference's
``ms_deform_attn_core_pytorch``, ``/root/reference/ops/functions/
ms_deform_attn_func.py:49-71``) is gather-bound on TPU: every sampling point
is a random-access fetch, and TPU has no vector gather unit — measured
~65 ms/image for the DeformNeck at KITTI shapes even with patch gathers.

This kernel removes the gathers entirely by exploiting the structure the
adaptor actually uses (reference ``nmrf/models/adaptor_modules.py``):
queries form a regular [Hq, Wq] grid whose reference points are the pixel
centers, and each level's map is exactly ``f = Hq/Hl`` times coarser (f a
power of two after the model's divisibility padding).  Every query's sample
lands near a STATIC "base" cell ``base(q) = floor((q + 0.5)/f - 0.5)``,
displaced by the (dynamic) learned offset.  The kernel loops over the
(2r+1)^2 integer taps around the base cell — all static addressing: VMEM
slices, leading-dim broadcasts and one small matmul per tap — and weights
each tap by the bilinear hat of the true displacement:

    out[q, m, :] = sum_p aw[q,m,p] * sum_{ty,tx in [-r,r]^2}
        relu(1 - |dy[q,m,p] - ty|) * relu(1 - |dx[q,m,p] - tx|)
        * vpad[base_y(qy)+ty, base_x(qx)+tx, m, :]

This reproduces exact bilinear-with-zeros semantics for every sample whose
displacement from its base cell is at most ``r`` level-pixels per axis
(contributions beyond the tap range are dropped — the learned offsets are
initialised to <= n_points = 4 px, reference ``ops/modules/ms_deform_attn.py
:64-75``, so the default radius leaves margin; the exact gather path remains
the golden fallback via ``TPU.MSDA_TAP_RADIUS 0``).

Dense taps trade ~70x arithmetic for zero random access — the TPU trade.
All Mosaic-safe: leading-dim broadcasts/reshapes, dynamic slices on
non-minor axes, one 2-D [R, M*P] @ [M*P, M*D] matmul per tap (fusing the
P-reduction with the head->channel spread).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def base_plus_one(n, f):
    """base(q) + 1 = floor((2q + 1 + f)/(2f)) for q in [0, n) (numpy int32).

    Used by the jnp reference; the kernel realizes the same map as
    ``floor((q + phase(f)) / f)`` — an f-repeat shifted by ``phase``.
    """
    q = np.arange(n, dtype=np.int64)
    return ((2 * q + 1 + f) // (2 * f)).astype(np.int32)


def phase(f):
    """s such that floor((q + s)/f) == base(q) + 1 (f a power of two)."""
    return (f + 1) // 2


def spread_matrix(M, P, D):
    """[(m,p), (m',d)] -> 1 if m == m' (P-reduction + head->channel spread).

    (r4 probe: block-diagonal-batching 4 tap columns into one
    [R, 4*MP] @ [4*MP, 4*MD] dot — K 32 -> 128 — measured SLOWER,
    4.1 vs 3.8 ms/level: the kernel is VMEM-traffic bound, not MXU-pass
    bound, and the wider weight concat + output slices cost more than the
    saved passes.  Reverted; see git history.)"""
    sel = np.zeros((M * P, M * D), np.float32)
    for m in range(M):
        sel[m * P:(m + 1) * P, m * D:(m + 1) * D] = 1.0
    return sel


def pad_and_colup(value_map, f, r):
    """Zero-pad a [B, Hl, Wl, C] level map by (r+1) and repeat columns x f.

    Tap addressing in the kernel then reduces to: dynamic ROW slice at
    ``l0 + ty`` (+ in-kernel f-repeat + phase slice) and dynamic COLUMN
    slice at ``phase + tx * f``.
    """
    vpad = jnp.pad(value_map, ((0, 0), (r + 1, r + 1), (r + 1, r + 1),
                               (0, 0)))
    if f > 1:
        vpad = jnp.repeat(vpad, f, axis=2)
    return vpad


def _msda_tap_kernel(dx_ref, dy_ref, aw_ref, v_hbm, sel_ref, out_ref,
                     vtile_ref, slab_ref, *, f, r, TQ, TW, CW, MP, MD):
    """Grid: (rows, cols) = (HG // TQ, Wq // TW) — batch unrolled by the
    caller.  Blocks:
    dx/dy/aw: [1, TQ, TW, MP] f32 (level-pixel displacements, attn weights)
    v_hbm: [1, rows, (Wl + 2(r+1)) * f, MD] — row-chunk of the padded level
       map (columns pre-upsampled) as a VMEM block (constant index map ->
       single-buffered)
    out: [1, TQ, TW, MD]
    vtile_ref: VMEM scratch [TQ//f + 2r + 1, CW, MD] — the (row, col)
       window this tile's taps reach, staged once
    slab_ref: VMEM scratch [TQ, CW, MD] f32 — the current tap row's
       query-res slab (dynamic column slices must come from a ref: Mosaic
       has no dynamic_slice on values; r4 probes: a bf16 slab or a direct
       double-dynamic vtile slice both fail Mosaic's sublane-alignment
       prover — f32's 8-sublane tiling is the only layout whose unaligned
       tap-column slices compile here).
    """
    R = TQ * TW
    taps = 2 * r + 1
    dx = dx_ref[0].reshape(R, MP)
    dy = dy_ref[0].reshape(R, MP)
    aw = aw_ref[0].reshape(R, MP)
    sel = sel_ref[...]
    l0 = pl.program_id(0) * (TQ // f)  # level-row offset of this tile
    w0 = pl.program_id(1) * TW         # upsampled-column offset
    n_rows = TQ // f + 1
    RR = TQ // f + 2 * r + 1           # rows reached across all taps
    sp = phase(f)

    # stage the (row, col) window this tile's taps reach into VMEM once
    # (manual HBM DMA — memory_space=ANY + make_async_copy — crashes this
    # environment's remote Mosaic compiler, probed 2026-08-17)
    vtile_ref[...] = v_hbm[0, pl.ds(l0, RR), pl.ds(w0, CW)]

    def ty_body(ty, acc):
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - (ty - r).astype(jnp.float32)))
        awy = aw * hy
        # vtile rows [ty, ty + n_rows) hold base(u)+1 for u in [0, TQ);
        # f-repeat them and phase-slice to align with query rows.  (r4
        # probe: staging in bf16 fails Mosaic's dynamic-sublane-slice
        # alignment prover — bf16 refs need 16-aligned column starts and
        # the tap offsets sp + tx*f are not; f32 slabs slice fine.)
        slab = vtile_ref[pl.ds(ty, n_rows)].astype(jnp.float32)
        if f > 1:
            slab = jnp.broadcast_to(slab[:, None], (n_rows, f, CW, MD))
            slab = slab.reshape(n_rows * f, CW, MD)
        slab_ref[...] = slab[sp:sp + TQ]

        def tx_body(tx, acc):
            hx = jnp.maximum(
                0.0, 1.0 - jnp.abs(dx - (tx - r).astype(jnp.float32)))
            w = awy * hx                       # [R, MP]
            ws = jax.lax.dot_general(          # P-reduce + spread -> [R, MD]
                w, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            u = slab_ref[:, pl.ds(sp + tx * f, TW), :]
            return acc + ws * u.reshape(R, MD)

        return jax.lax.fori_loop(0, taps, tx_body, acc)

    acc = jax.lax.fori_loop(
        0, taps, ty_body, jnp.zeros((R, MD), jnp.float32))
    out_ref[0] = acc.reshape(TQ, TW, MD).astype(out_ref.dtype)


def msda_taps_level(value_map, dx, dy, aw, num_heads, radius,
                    interpret=None, partition=False):
    """One level of tap-based MSDA.

    Args:
      value_map: [B, Hl, Wl, M*D] level features (channel-last).
      dx, dy: [B, Hq, Wq, M*P] f32 — sampling displacement in level pixels
        relative to the query's static base cell (head-major packing).
      aw: [B, Hq, Wq, M*P] f32 attention weights.
      num_heads: M.
      radius: tap radius r (exact for |dx|,|dy| <= r).
      partition: declare the batch dim SPMD-partitionable — the python
        batch loop below otherwise forces a data-parallel jit to replicate
        the whole batch on every device (ops/pallas/partitioning.py).
    Returns:
      [B, Hq, Wq, M*D] in value_map.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    MD, MP = value_map.shape[-1], dx.shape[-1]
    M = num_heads
    # constant tables must enter as operands: custom_partitioning rejects
    # functions that close over materialized jnp constants
    sel = jnp.asarray(spread_matrix(M, MP // M, MD // M))
    if partition:
        from .partitioning import shard_over_batch

        return shard_over_batch(
            _msda_taps_core, (0, 0, 0, 0, None), 4,
            (value_map, dx, dy, aw, sel),
            (("num_heads", num_heads), ("radius", int(radius)),
             ("interpret", interpret)))
    return _msda_taps_core(value_map, dx, dy, aw, sel, num_heads=num_heads,
                           radius=int(radius), interpret=interpret)


def _msda_taps_core(value_map, dx, dy, aw, sel, *, num_heads, radius,
                    interpret):
    B, Hl, Wl, MD = value_map.shape
    _, Hq, Wq, MP = dx.shape
    f = Hq // Hl
    assert Hq == Hl * f and Wq == Wl * f, (Hq, Wq, Hl, Wl)
    assert f & (f - 1) == 0, f  # power of two (divisibility padding)
    r = int(radius)
    M = num_heads
    v = pad_and_colup(value_map, f, r)
    esize = value_map.dtype.itemsize
    W2f = v.shape[2]

    # --- VMEM sizing (empirically calibrated against Mosaic's scoped-vmem
    # accounting, limit 16 MB).  Two hazards observed on-chip:
    #   * a VMEM block whose index varies with a grid dim is double-buffered
    #     — so the batch is unrolled OUTSIDE pallas_call (v stays single);
    #   * inside a larger jit, XLA may place the pallas OUTPUT itself in
    #     VMEM (layout S(1)), so the output must stay small too — query
    #     rows are chunked at this wrapper level, shrinking both the v row
    #     slice and the per-call output.
    # Minor dims < 128 are lane-padded by the tiling (MP/MD -> 128).
    def lane(n):
        return -(-max(n, 128) // 128) * 128

    def chunk_bytes(hg):
        return ((hg // f + 2 * r + 2) * W2f * lane(MD) * esize  # v slice
                + hg * Wq * lane(MD) * esize)                   # output
    # Row tile: ~4 query rows, forced up to f (base-cell alignment needs
    # f | tile start).
    TQ = min(f * max(1, -(-4 // f)), Hq)
    while Hq % TQ:  # terminates: TQ reaches Hq (f | Hq by construction)
        TQ = min(TQ + f, Hq)
    # Column tile: the fori-loop temporaries scale with R = TQ*TW; keep
    # R ~<= 1k (empirically passing range).  Must be a multiple of f (the
    # vtile column window starts at multiples of TW in upsampled units).
    # ... and of 8 (Mosaic block second-minor divisibility), unless
    # full-width (blocks equal to the array dim are exempt).
    step = f
    while step % 8:
        step += f
    TW = Wq
    for tw in range(step, Wq + 1, step):
        if Wq % tw == 0 and TQ * tw <= 1024:
            TW = tw
    HG = TQ
    for k in range(1, Hq // TQ + 1):
        hg = TQ * k
        if Hq % hg == 0 and chunk_bytes(hg) <= 3.5 * 2 ** 20:
            HG = hg
    CW = TW + (2 * r + 1) * f  # column reach of one tile across all taps
    kern = functools.partial(_msda_tap_kernel, f=f, r=r, TQ=TQ, TW=TW,
                             CW=CW, MP=MP, MD=MD)
    vrows = HG // f + 2 * r + 2
    call = pl.pallas_call(
        kern,
        grid=(HG // TQ, Wq // TW),
        in_specs=[
            pl.BlockSpec((1, TQ, TW, MP), lambda i, j: (0, i, j, 0)),
            pl.BlockSpec((1, TQ, TW, MP), lambda i, j: (0, i, j, 0)),
            pl.BlockSpec((1, TQ, TW, MP), lambda i, j: (0, i, j, 0)),
            pl.BlockSpec((1, vrows, W2f, MD), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec(tuple(sel.shape), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TQ, TW, MD), lambda i, j: (0, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((1, HG, Wq, MD), value_map.dtype),
        scratch_shapes=[
            pltpu.VMEM((TQ // f + 2 * r + 1, CW, MD), value_map.dtype),
            pltpu.VMEM((TQ, CW, MD), jnp.float32),
        ],
        interpret=interpret,
    )
    outs = []
    for b in range(B):
        rows = []
        for g0 in range(0, Hq, HG):
            vb = jax.lax.slice_in_dim(v[b:b + 1], g0 // f, g0 // f + vrows,
                                      axis=1)
            rows.append(call(dx[b:b + 1, g0:g0 + HG],
                             dy[b:b + 1, g0:g0 + HG],
                             aw[b:b + 1, g0:g0 + HG], vb, sel))
        outs.append(rows[0] if len(rows) == 1
                    else jnp.concatenate(rows, axis=1))
    return outs[0] if B == 1 else jnp.concatenate(outs, axis=0)
