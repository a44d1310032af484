"""Tap-based MSDA: reference/kernel parity vs the exact gather op.

The tap formulation (ops/msda.ms_deform_attn_taps + ops/pallas/msda.py) must
match the exact golden ``ms_deform_attn`` whenever samples stay within the
tap radius of each query's aligned cell — across upsampling factors f, at
image borders (zeros padding), and through the custom VJP.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from nmrf_tpu.ops.msda import (ms_deform_attn, ms_deform_attn_taps,
                               _tap_level_inputs, _tap_level_op,
                               _tap_level_reference)


def _grid_ref_points(Hq, Wq):
    ry, rx = np.meshgrid((np.arange(Hq) + 0.5) / Hq,
                         (np.arange(Wq) + 0.5) / Wq, indexing="ij")
    return np.stack([rx.reshape(-1), ry.reshape(-1)], -1)  # [Lq, 2] (x, y)


def _make_case(rng, Hq, Wq, levels, M, D, P, max_off):
    """Sampling locations = grid reference + bounded per-level offsets."""
    B = 2
    S = sum(h * w for h, w in levels)
    value = rng.standard_normal((B, S, M, D)).astype(np.float32)
    ref = _grid_ref_points(Hq, Wq)  # [Lq, 2]
    Lq = Hq * Wq
    L = len(levels)
    offs = (rng.standard_normal((B, Lq, M, L, P, 2)) * max_off / 3.0)
    offs = np.clip(offs, -max_off, max_off).astype(np.float32)
    norm = np.array([[w, h] for h, w in levels], np.float32)  # [L, 2] (x, y)
    locs = ref[None, :, None, None, None, :] + offs / norm[:, None, :]
    w = rng.random((B, Lq, M, L, P)).astype(np.float32)
    w = w / w.sum((-2, -1), keepdims=True)
    return jnp.asarray(value), jnp.asarray(locs.astype(np.float32)), \
        jnp.asarray(w)


class TestTapReference:
    @pytest.mark.parametrize("levels", [
        [(8, 16)],                      # f = 1
        [(4, 8)],                       # f = 2
        [(8, 16), (4, 8), (2, 4)],      # multi-level f = 1, 2, 4
    ])
    def test_matches_exact(self, levels):
        rng = np.random.default_rng(0)
        Hq, Wq, M, D, P, r = 8, 16, 2, 4, 3, 4
        # exact while |offset| + in-cell fraction (<1 for f>1) stays <= r
        value, locs, w = _make_case(rng, Hq, Wq, levels, M, D, P,
                                    max_off=r - 1)
        want = ms_deform_attn(value, levels, locs, w)
        got = ms_deform_attn_taps(value, levels, locs, w, (Hq, Wq), r,
                                  use_kernel=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)

    def test_borders_sample_zeros(self):
        """Locations pushed outside [0,1] read zeros, like grid_sample."""
        rng = np.random.default_rng(1)
        levels = [(4, 8)]
        Hq, Wq, M, D, P, r = 8, 16, 2, 4, 2, 4
        value, locs, w = _make_case(rng, Hq, Wq, levels, M, D, P, max_off=1.0)
        # shift all sampling points 2 level-px past the left border for the
        # first half of the queries
        locs = locs.at[:, :64, ..., 0].add(-2.0 / 8.0)
        want = ms_deform_attn(value, levels, locs, w)
        got = ms_deform_attn_taps(value, levels, locs, w, (Hq, Wq), r,
                                  use_kernel=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)

    def test_out_of_radius_contributions_drop(self):
        """A sample displaced > r from its base cell contributes nothing."""
        rng = np.random.default_rng(2)
        levels = [(8, 16)]
        Hq, Wq, M, D, P, r = 8, 16, 1, 4, 1, 2
        value, locs, w = _make_case(rng, Hq, Wq, levels, M, D, P, max_off=0.0)
        far = locs.at[..., 0].add((r + 3) / 16.0)  # +r+3 level px in x
        got = ms_deform_attn_taps(value, levels, far, w, (Hq, Wq), r,
                                  use_kernel=False)
        np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)


class TestTapKernel:
    @pytest.mark.parametrize("hl,wl", [(8, 16), (4, 8), (2, 4)])
    def test_kernel_matches_reference(self, hl, wl):
        rng = np.random.default_rng(3)
        Hq, Wq, M, P, D, r = 8, 16, 2, 3, 4, 3
        levels = [(hl, wl)]
        value, locs, w = _make_case(rng, Hq, Wq, levels, M, D, P, max_off=r)
        dx, dy, aw = _tap_level_inputs(locs[:, :, :, 0], w[:, :, :, 0],
                                       (hl, wl), (Hq, Wq))
        vmap = value.reshape(value.shape[0], hl, wl, M * D)
        want = _tap_level_reference(vmap, dx, dy, aw, M, r)
        got = _tap_level_op(vmap, dx, dy, aw, M, r)  # interpret on CPU
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)

    def test_tiny_query_grid_terminates(self):
        # regression: the row-tile search looped forever when Hq was
        # smaller than the initial ~4-row tile (e.g. Hq=2, f=1)
        rng = np.random.default_rng(5)
        Hq, Wq, M, P, D, r = 2, 8, 1, 2, 4, 2
        hl, wl = 2, 8  # f = 1
        value, locs, w = _make_case(rng, Hq, Wq, [(hl, wl)], M, D, P,
                                    max_off=r)
        dx, dy, aw = _tap_level_inputs(locs[:, :, :, 0], w[:, :, :, 0],
                                       (hl, wl), (Hq, Wq))
        vmap = value.reshape(value.shape[0], hl, wl, M * D)
        want = _tap_level_reference(vmap, dx, dy, aw, M, r)
        got = _tap_level_op(vmap, dx, dy, aw, M, r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)

    def test_full_op_kernel_path(self):
        rng = np.random.default_rng(4)
        levels = [(8, 16), (4, 8)]
        Hq, Wq, M, D, P, r = 8, 16, 2, 4, 2, 3
        value, locs, w = _make_case(rng, Hq, Wq, levels, M, D, P,
                                    max_off=r - 1)
        want = ms_deform_attn(value, levels, locs, w)
        got = ms_deform_attn_taps(value, levels, locs, w, (Hq, Wq), r,
                                  use_kernel=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)

    def test_gradients(self):
        """Custom VJP (kernel fwd, rematerialized tap-reference bwd)."""
        rng = np.random.default_rng(5)
        levels = [(4, 8)]
        Hq, Wq, M, D, P, r = 8, 16, 1, 2, 2, 2
        value, locs, w = _make_case(rng, Hq, Wq, levels, M, D, P,
                                    max_off=1.0)
        dx, dy, aw = _tap_level_inputs(locs[:, :, :, 0], w[:, :, :, 0],
                                       levels[0], (Hq, Wq))
        vmap = value.reshape(value.shape[0], *levels[0], M * D)
        check_grads(
            lambda v, x, y, a: jnp.sum(
                _tap_level_op(v, x, y, a, M, r) ** 2),
            (vmap, dx, dy, aw), order=1, modes=["rev"],
            atol=5e-3, rtol=5e-3)

    def test_manual_bwd_matches_autodiff(self):
        """The rematerializing manual backward (no per-tap residuals — the
        autodiff scan VJP saved (2r+1)^2 stacked f32 buffers, OOMing the
        swin train step) must match jax.vjp through the tap reference."""
        from nmrf_tpu.ops.msda import _tap_bwd

        rng = np.random.default_rng(11)
        for Hl, Wl, M, D, P, f, r in [(6, 8, 2, 4, 3, 2, 2),
                                      (4, 4, 2, 4, 2, 4, 5)]:
            Hq, Wq = Hl * f, Wl * f
            B, MD, MP = 2, M * D, M * P
            v = jnp.asarray(rng.standard_normal((B, Hl, Wl, MD)), jnp.float32)
            dx = jnp.asarray((rng.random((B, Hq, Wq, MP)) * 2 - 1) * (r - .6),
                             jnp.float32)
            dy = jnp.asarray((rng.random((B, Hq, Wq, MP)) * 2 - 1) * (r - .6),
                             jnp.float32)
            aw = jnp.asarray(rng.random((B, Hq, Wq, MP)), jnp.float32)
            g = jnp.asarray(rng.standard_normal((B, Hq, Wq, MD)), jnp.float32)
            _, vjp = jax.vjp(
                lambda v, x, y, w: _tap_level_reference(v, x, y, w, M, r),
                v, dx, dy, aw)
            for name, a, b in zip(("dv", "ddx", "ddy", "daw"), vjp(g),
                                  _tap_bwd(M, r, (v, dx, dy, aw), g)):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           atol=1e-4, rtol=1e-5,
                                           err_msg=f"{name} f={f} r={r}")


class TestTapCoverageDiagnostic:
    def test_fraction_zero_within_radius_and_positive_beyond(self):
        from nmrf_tpu.ops.msda import tap_out_of_range_fraction

        rng = np.random.default_rng(7)
        levels = [(4, 8)]
        Hq, Wq, M, D, P, r = 8, 16, 2, 4, 2, 4
        _, locs, _ = _make_case(rng, Hq, Wq, levels, M, D, P, max_off=r - 1)
        frac = tap_out_of_range_fraction(locs, levels, (Hq, Wq), r)
        assert float(frac) == 0.0
        far = locs.at[..., 0].add((r + 3) / 8.0)  # +r+3 level px in x
        frac = tap_out_of_range_fraction(far, levels, (Hq, Wq), r)
        assert float(frac) > 0.9

    def test_module_sows_oob_intermediate(self):
        """MSDeformAttn records the dropped-sample fraction when the tap
        path is active (read back via mutable=['intermediates'];
        tools/check_tap_coverage.py builds on this)."""
        import jax
        import jax.numpy as jnp

        from nmrf_tpu.models.adaptor import MSDeformAttn

        rng = np.random.default_rng(8)
        Hq, Wq, C = 8, 16, 16
        attn = MSDeformAttn(d_model=C, n_levels=1, n_heads=2, n_points=2,
                            tap_radius=3)
        q = jnp.asarray(rng.standard_normal((1, Hq * Wq, C)), jnp.float32)
        ref = jnp.asarray(_grid_ref_points(Hq, Wq)[None, :, None, :])
        feat = jnp.asarray(rng.standard_normal((1, Hq * Wq, C)), jnp.float32)
        params = attn.init(jax.random.PRNGKey(0), q, ref, feat, [(8, 16)],
                           query_shape=(Hq, Wq))
        _, inter = attn.apply(params, q, ref, feat, [(8, 16)],
                              query_shape=(Hq, Wq),
                              mutable=["intermediates"])
        oob = inter["intermediates"]["msda_tap_oob"][0]
        assert float(oob) == 0.0  # zero-init offsets stay at the reference
