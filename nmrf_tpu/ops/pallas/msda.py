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
    saved passes.  r5 probe: per-head P-reduce [R, MP] @ [MP, M] +
    ``pltpu.repeat`` lane-tiling (with D-major v channels) — on paper 8x
    fewer MXU MACs — measured 4.5x SLOWER (extractors 1.7 -> 7.7
    ms/frame): the per-tap repeat inside the fori_loop lowers to slow
    sublane shuffles.  Both reverted; the fused spread dot stands.)"""
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
    """Grid: (chunks, rows, cols) = (B * Hq // HG, HG // TQ, Wq // TW) —
    the leading grid dim walks batch x row-chunks (r5: the caller stacks
    the overlapping per-chunk v row slices so the whole level is ONE
    pipelined pallas_call).  Blocks:
    dx/dy/aw: [1, TQ, TW, MP] f32 (level-pixel displacements, attn weights)
    v_hbm: [1, vrows, (Wl + 2(r+1)) * f, MD] — this chunk's row slice of
       the padded level map (columns pre-upsampled); its block index
       follows the chunk dim, so Mosaic double-buffers the fetch across
       chunks
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
    # grid = (chunk, rows, cols); the chunk dim only routes block fetches
    l0 = pl.program_id(1) * (TQ // f)  # level-row offset of this tile
    w0 = pl.program_id(2) * TW         # upsampled-column offset
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
    # --- lane packing (r5): the adaptor's value dim is M*D = 64
    # (deform_ratio 0.5), so every [*, MD] tile in the kernel pads to 128
    # lanes at 50% utilization.  Pairs of batch elements pack along the
    # channel axis — algebraically identical to one image with 2M heads
    # (the kernel is head-agnostic; the spread matrix becomes
    # block_diag(sel, sel), whose zero blocks contribute exact +0.0 terms
    # to the f32 accumulate) — doubling effective lane throughput of the
    # slab staging, tap slices, spread dots and accumulates.  Bit-identical
    # output; VMEM footprint unchanged (the padding lanes now carry data).
    if B % 2 == 0 and 2 * MD <= 128 and B > 1:
        half = B // 2

        def pack(x):
            _, Hx, Wx, C = x.shape
            x = x.reshape(half, 2, Hx, Wx, C)
            return x.transpose(0, 2, 3, 1, 4).reshape(half, Hx, Wx, 2 * C)

        sel2 = jnp.concatenate([
            jnp.concatenate([sel, jnp.zeros_like(sel)], axis=1),
            jnp.concatenate([jnp.zeros_like(sel), sel], axis=1)], axis=0)
        out = _msda_taps_core(
            pack(value_map), pack(dx), pack(dy), pack(aw), sel2,
            num_heads=2 * num_heads, radius=radius, interpret=interpret)
        out = out.reshape(half, Hq, Wq, 2, MD).transpose(0, 3, 1, 2, 4)
        return out.reshape(B, Hq, Wq, MD)
    f = Hq // Hl
    assert Hq == Hl * f and Wq == Wl * f, (Hq, Wq, Hl, Wl)
    assert f & (f - 1) == 0, f  # power of two (divisibility padding)
    r = int(radius)
    M = num_heads
    v = pad_and_colup(value_map, f, r)
    esize = value_map.dtype.itemsize
    W2f = v.shape[2]

    # --- VMEM sizing (empirically calibrated against Mosaic's scoped-vmem
    # accounting, limit 16 MB).  Query rows are chunked so one chunk's v
    # row slice fits VMEM; the chunk axis (batch x row-chunks) is a GRID
    # dimension (r5): the per-chunk v slices are stacked into one operand
    # whose block index follows the chunk dim, so Mosaic double-buffers the
    # v fetch and pipelines across chunks — the r4 trace showed the former
    # python batch x chunk loop splitting each level into 8+ tiny
    # pallas_calls with no cross-call overlap (~3.5 ms/level).  The v term
    # is counted twice (double-buffered); the call's full output is far too
    # large for XLA's VMEM-output placement hazard, so no output term.
    # Minor dims < 128 are lane-padded by the tiling (MP/MD -> 128).
    def lane(n):
        return -(-max(n, 128) // 128) * 128

    def chunk_bytes(hg):
        return 2 * (hg // f + 2 * r + 2) * W2f * lane(MD) * esize
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
    n = Hq // HG
    # stack the (overlapping) per-chunk v row slices along the chunk axis —
    # one static gather, ~(1 + halo-overlap) x the v bytes of HBM traffic,
    # paid once so the whole level runs as ONE pipelined pallas_call
    if n == 1:
        v_chunks = v                       # Hl + 2(r+1) == vrows exactly
    else:
        idx = (np.arange(n, dtype=np.int32)[:, None] * (HG // f)
               + np.arange(vrows, dtype=np.int32)[None, :])
        v_chunks = v[:, idx].reshape(B * n, vrows, W2f, MD)
    call = pl.pallas_call(
        kern,
        grid=(B * n, HG // TQ, Wq // TW),
        in_specs=[
            pl.BlockSpec((1, TQ, TW, MP), lambda c, i, j: (c, i, j, 0)),
            pl.BlockSpec((1, TQ, TW, MP), lambda c, i, j: (c, i, j, 0)),
            pl.BlockSpec((1, TQ, TW, MP), lambda c, i, j: (c, i, j, 0)),
            pl.BlockSpec((1, vrows, W2f, MD), lambda c, i, j: (c, 0, 0, 0)),
            pl.BlockSpec(tuple(sel.shape), lambda c, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TQ, TW, MD), lambda c, i, j: (c, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B * n, HG, Wq, MD), value_map.dtype),
        scratch_shapes=[
            pltpu.VMEM((TQ // f + 2 * r + 1, CW, MD), value_map.dtype),
            pltpu.VMEM((TQ, CW, MD), jnp.float32),
        ],
        interpret=interpret,
    )
    out = call(dx.reshape(B * n, HG, Wq, MP), dy.reshape(B * n, HG, Wq, MP),
               aw.reshape(B * n, HG, Wq, MP), v_chunks, sel)
    return out.reshape(B, Hq, Wq, MD)
