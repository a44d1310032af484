"""Bit-parity tests for spatial (H-axis) sharding primitives on the 8-device
CPU mesh — the exactness requirement of SURVEY.md §7.3.5 (cross-tile MRF
message passing must match single-device results)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from nmrf_tpu.parallel.spatial import (
    all_gather_h,
    global_roll_h,
    halo_exchange_h,
    sharded_shifted_window_attention,
    split_shift_mask_per_tile,
)


def make_mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


class TestGlobalRoll:
    @pytest.mark.parametrize("shift", [-3, -1, 1, 3])
    def test_matches_jnp_roll(self, shift):
        mesh = make_mesh(4)
        x = jnp.arange(4 * 16 * 5, dtype=jnp.float32).reshape(4, 16, 5)

        fn = shard_map(
            lambda a: global_roll_h(a, shift, "sp"),
            mesh=mesh, in_specs=P(None, "sp"), out_specs=P(None, "sp"))
        got = fn(x)
        want = jnp.roll(x, shift, axis=1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestHaloExchange:
    def test_zero_padded_edges(self):
        mesh = make_mesh(4)
        x = jnp.arange(2 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 3)

        fn = shard_map(
            lambda a: halo_exchange_h(a, 1, "sp"),
            mesh=mesh, in_specs=P(None, "sp"), out_specs=P(None, "sp"))
        got = np.asarray(fn(x))  # local H = 2+2 -> global 16
        got = got.reshape(2, 4, 4, 3)
        xg = np.asarray(x).reshape(2, 4, 2, 3)
        for t in range(4):
            # core rows match
            np.testing.assert_array_equal(got[:, t, 1:3], xg[:, t])
            # halo rows come from neighbors; zero at global edges
            if t == 0:
                assert (got[:, t, 0] == 0).all()
            else:
                np.testing.assert_array_equal(got[:, t, 0], xg[:, t - 1, -1])
            if t == 3:
                assert (got[:, t, 3] == 0).all()
            else:
                np.testing.assert_array_equal(got[:, t, 3], xg[:, t + 1, 0])

    def test_wrap_edges(self):
        mesh = make_mesh(4)
        x = jnp.arange(1 * 8 * 2, dtype=jnp.float32).reshape(1, 8, 2)
        fn = shard_map(
            lambda a: halo_exchange_h(a, 1, "sp", wrap=True),
            mesh=mesh, in_specs=P(None, "sp"), out_specs=P(None, "sp"))
        got = np.asarray(fn(x)).reshape(1, 4, 4, 2)
        xg = np.asarray(x).reshape(1, 4, 2, 2)
        np.testing.assert_array_equal(got[:, 0, 0], xg[:, 3, -1])


class TestAllGather:
    def test_full_axis(self):
        mesh = make_mesh(4)
        x = jnp.arange(4 * 8, dtype=jnp.float32).reshape(4, 8)
        fn = shard_map(lambda a: all_gather_h(a, "sp"),
                       mesh=mesh, in_specs=P(None, "sp"),
                       out_specs=P(None, "sp"))
        got = np.asarray(fn(x))
        # each tile holds the full gathered axis; out_specs P(None, "sp")
        # concatenates the 4 identical copies -> [4, 32] tiling of the input
        np.testing.assert_array_equal(got, np.tile(np.asarray(x), (1, 4)))


class TestShardedWindowAttention:
    """End-to-end: NMP WindowAttention under spatial sharding must be
    bit-identical to the single-device module (shifted windows included)."""

    @pytest.mark.parametrize("shift", [0, 3])
    def test_parity_with_unsharded(self, shift):
        from nmrf_tpu.models.nmp import (WindowAttention, shift_window_attn_mask,
                                         window_attn_mask)

        B, H, W, N, dim, heads, ws = 1, 24, 12, 2, 8, 2, 6
        n_tiles = 4
        rng = np.random.RandomState(0)
        qkv = jnp.asarray(rng.randn(B, H, W, N, 3 * dim).astype(np.float32))

        module = WindowAttention(dim, (ws, ws), shift, heads)
        table = jnp.asarray(
            (rng.randn((2 * ws - 1) ** 2, 3 * dim) * 0.1).astype(np.float32))
        params = {"params": {"relative_position_enc_table": table}}

        if shift > 0:
            mask = jnp.asarray(shift_window_attn_mask((H, W), (ws, ws, N), shift))
        else:
            nW = (H // ws) * (W // ws)
            mask = jnp.asarray(np.broadcast_to(
                window_attn_mask((ws, ws, N))[None],
                (nW, ws * ws * N, ws * ws * N)))

        want = module.apply(params, qkv, mask)

        # sharded: qkv split along H over 4 devices; mask split per tile
        mesh = make_mesh(n_tiles)
        masks_tiled = split_shift_mask_per_tile(np.asarray(mask), n_tiles)

        def local_body(qkv_loc, mask_loc):
            # run the module with shift already applied globally: plain
            # windows on the shifted layout, per-tile mask chunk
            inner = WindowAttention(dim, (ws, ws), 0, heads)

            def attn(x):
                return inner.apply(params, x, mask_loc[0])

            return sharded_shifted_window_attention(attn, qkv_loc, shift, "sp")

        fn = shard_map(local_body, mesh=mesh,
                       in_specs=(P(None, "sp"), P("sp")),
                       out_specs=P(None, "sp"))
        got = fn(qkv, jnp.asarray(masks_tiled))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
