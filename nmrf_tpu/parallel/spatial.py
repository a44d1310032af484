"""Spatial (H-axis) sharding primitives for windowed / stripe attention.

The reference's "sequence axis" is the image plane; it never shards it
(SURVEY.md §5 "long-context: absent").  The TPU-native equivalent of
ring-attention/sequence-parallelism for this model is:

  * windowed attention with tile-aligned windows needs NO communication for
    plain windows (window partition is local when H_local % window == 0);
  * SHIFTED windows are a global cyclic roll along H: one `ppermute` of the
    `shift` boundary rows between ring neighbors (``global_roll_h``);
  * CSWin vertical stripes span the full (sharded) H axis: queries stay
    local, keys/values are all-gathered along the axis;
  * the stripe depthwise-conv positional term needs a 1-row halo exchange
    (``halo_exchange_h``).

All primitives assume use inside ``shard_map`` over a named mesh axis, with
the GLOBAL H divided evenly across the axis.  Bit-parity vs the unsharded
ops is covered by ``tests/test_spatial.py`` on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
from jax import lax


def global_roll_h(x, shift: int, axis_name: str, h_axis: int = 1):
    """Global cyclic roll by ``shift`` along the sharded H axis.

    Equivalent to ``jnp.roll(x_global, shift, axis=h_axis)`` on the
    concatenated array.  shift may exceed 0 in either direction but must be
    smaller than the local tile height.
    """
    if shift == 0:
        return x
    n = lax.axis_size(axis_name)
    H_loc = x.shape[h_axis]
    assert abs(shift) < H_loc, (shift, H_loc)

    def take(a, sl):
        idx = [slice(None)] * a.ndim
        idx[h_axis] = sl
        return a[tuple(idx)]

    if shift < 0:
        s = -shift
        # rows move up: my first s rows go to the previous tile's tail
        edge = take(x, slice(0, s))
        perm = [(i, (i - 1) % n) for i in range(n)]
        recv = lax.ppermute(edge, axis_name, perm)
        return jnp.concatenate([take(x, slice(s, None)), recv], axis=h_axis)
    else:
        s = shift
        # rows move down: my last s rows go to the next tile's head
        edge = take(x, slice(H_loc - s, None))
        perm = [(i, (i + 1) % n) for i in range(n)]
        recv = lax.ppermute(edge, axis_name, perm)
        return jnp.concatenate([recv, take(x, slice(0, H_loc - s))], axis=h_axis)


def halo_exchange_h(x, halo: int, axis_name: str, h_axis: int = 1,
                    wrap: bool = False):
    """Return x extended with ``halo`` rows from each H-neighbor tile.

    Non-wrapping edges (first tile's top / last tile's bottom) are
    zero-padded unless ``wrap``.  Output local H = H_loc + 2*halo.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    H_loc = x.shape[h_axis]
    assert halo <= H_loc

    def take(a, sl):
        s = [slice(None)] * a.ndim
        s[h_axis] = sl
        return a[tuple(s)]

    top_edge = take(x, slice(0, halo))            # goes to previous tile
    bot_edge = take(x, slice(H_loc - halo, None))  # goes to next tile
    from_next = lax.ppermute(top_edge, axis_name,
                             [(i, (i - 1) % n) for i in range(n)])
    from_prev = lax.ppermute(bot_edge, axis_name,
                             [(i, (i + 1) % n) for i in range(n)])
    if not wrap:
        zeros = jnp.zeros_like(from_prev)
        from_prev = jnp.where(idx == 0, zeros, from_prev)
        from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=h_axis)


def all_gather_h(x, axis_name: str, h_axis: int = 1):
    """Gather the full H axis (tile-order concatenation)."""
    return lax.all_gather(x, axis_name, axis=h_axis, tiled=True)


def sharded_shifted_window_attention(attn_local, x, shift: int,
                                     axis_name: str, h_axis: int = 1):
    """Run a window-attention body under a global H/W cyclic shift.

    attn_local: callable(local_tokens) -> local_tokens operating on the
      SHIFTED layout (caller supplies the per-tile shifted mask).
    x: [..., H_loc, W, ...] local tokens; W roll is local, H roll is the
      ppermute ring.
    """
    if shift:
        x = global_roll_h(x, -shift, axis_name, h_axis)
        x = jnp.roll(x, -shift, axis=h_axis + 1)
    x = attn_local(x)
    if shift:
        x = jnp.roll(x, shift, axis=h_axis + 1)
        x = global_roll_h(x, shift, axis_name, h_axis)
    return x


def instance_norm_2d_sharded(x, axis_name: str, eps: float = 1e-5):
    """Affine-free instance norm over the GLOBAL spatial extent of an
    H-sharded [B, H_loc, W, C] tensor (two-pass, matching
    ``layers.instance_norm_2d`` exactly: mean, then mean of squared
    deviations — each local mean is pmean'd over equal-size tiles)."""
    x32 = x.astype(jnp.float32)
    m = lax.pmean(x32.mean(axis=(1, 2), keepdims=True), axis_name)
    v = lax.pmean(((x32 - m) ** 2).mean(axis=(1, 2), keepdims=True), axis_name)
    return (x32 - m) * lax.rsqrt(v + eps)


def global_fourier_rows(pe_global, h_loc: int, axis_name: str):
    """Slice this tile's rows out of a globally-computed [H_glob, ...] row
    encoding (positional embeddings must index GLOBAL coordinates)."""
    start = lax.axis_index(axis_name) * h_loc
    return lax.dynamic_slice_in_dim(pe_global, start, h_loc, axis=0)


def split_shift_mask_per_tile(global_mask, n_tiles: int):
    """Split a global shifted-window mask [nW, T, T] into per-tile chunks
    [n_tiles, nW/n_tiles, T, T] (window rows are contiguous in nW when the
    partition order is (row-block, col-block))."""
    nW = global_mask.shape[0]
    assert nW % n_tiles == 0, (nW, n_tiles)
    return global_mask.reshape(n_tiles, nW // n_tiles, *global_mask.shape[1:])
