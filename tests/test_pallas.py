"""Pallas fused NMP attention (ops/pallas/attention.py): parity vs the jnp
references and vs the WindowAttention module XLA path (interpret mode on CPU
— the same kernels compile for TPU), mirroring the reference's CUDA-vs-golden
validation (ops/test.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmrf_tpu.models.nmp import (
    WindowAttention,
    shift_window_attn_mask,
    window_attn_mask,
)
from nmrf_tpu.ops.pallas import attention as fa
from tests.gradcheck import check_grads


class TestMaskedAttention:
    def test_matches_reference(self):
        rng = np.random.RandomState(0)
        h, G, R, hd = 2, 3, 64, 16
        q, k, v = (jnp.asarray(rng.randn(h, G, R, hd).astype(np.float32))
                   for _ in range(3))
        mask = jnp.asarray(
            np.where(rng.rand(G, R, R) < 0.1, -1e9, 0.0).astype(np.float32))
        got = fa.masked_attention(q, k, v, mask, 0.3, interpret=True)
        want = fa.masked_attention_reference(q, k, v, mask, 0.3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
        # broadcast mask (Gm=1)
        got = fa.masked_attention(q, k, v, mask[:1], 0.3, interpret=True)
        want = fa.masked_attention_reference(q, k, v, mask[:1], 0.3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_grad_through_custom_vjp(self):
        rng = np.random.RandomState(1)
        h, G, R, hd = 1, 2, 8, 4
        q, k, v = (jnp.asarray(rng.randn(h, G, R, hd).astype(np.float32))
                   for _ in range(3))
        mask = jnp.zeros((1, R, R), jnp.float32)
        check_grads(
            lambda q, k, v: jnp.sum(fa.masked_attention_op(
                q, k, v, mask, 0.5)),
            (q, k, v), probes=5)


class TestModuleIntegration:
    @pytest.mark.parametrize("shift", [0, 3])
    def test_pallas_path_matches_xla_path(self, shift):
        """WindowAttention(use_pallas=True) must equal the plain XLA path.

        H=12, W=18, ws=6 -> 3 window columns; choose_column_block picks
        WB=3, exercising the window-packed grid."""
        B, H, W, N, dim, heads, ws = 1, 12, 18, 2, 8, 2, 6
        rng = np.random.RandomState(0)
        qkv = jnp.asarray(rng.randn(B, H, W, N, 3 * dim).astype(np.float32))
        table = jnp.asarray(
            (rng.randn((2 * ws - 1) ** 2, 3 * dim) * 0.1).astype(np.float32))
        params = {"params": {"relative_position_enc_table": table}}
        if shift > 0:
            mask = jnp.asarray(shift_window_attn_mask((H, W), (ws, ws, N), shift))
        else:
            nW = (H // ws) * (W // ws)
            mask = jnp.asarray(np.broadcast_to(
                window_attn_mask((ws, ws, N))[None],
                (nW, ws * ws * N, ws * ws * N)).copy())

        m_xla = WindowAttention(dim, (ws, ws), shift, heads)
        m_pl = WindowAttention(dim, (ws, ws), shift, heads, use_pallas=True,
                               pallas_interpret=True, candidate_mask=True)
        want = m_xla.apply(params, qkv, mask)
        got = m_pl.apply(params, qkv, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)

    @pytest.mark.parametrize("idx", [0, 1])
    def test_cswin_pallas_matches_xla(self, idx):
        """CSWinAttention(use_pallas=True) must equal the XLA stripe path."""
        from nmrf_tpu.models.nmp import CSWinAttention

        B, H, W, N, dim, heads = 1, 8, 10, 2, 8, 2
        rng = np.random.RandomState(3)
        mk = lambda: jnp.asarray(rng.randn(B, H, W, N, dim).astype(np.float32))
        q, k, v = mk(), mk(), mk()
        m_xla = CSWinAttention(dim, idx=idx, split_size=1, num_heads=heads)
        m_pl = CSWinAttention(dim, idx=idx, split_size=1, num_heads=heads,
                              use_pallas=True, pallas_interpret=True)
        params = m_xla.init(jax.random.PRNGKey(0), q, k, v)
        want = m_xla.apply(params, q, k, v)
        got = m_pl.apply(params, q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)

    def test_pallas_path_matches_xla_none_mask(self):
        """mask=None (refinement even layers) with WB>1 must still block
        cross-window attention via the packed block-diagonal mask."""
        B, H, W, N, dim, heads, ws = 2, 8, 16, 1, 8, 2, 4
        rng = np.random.RandomState(1)
        qkv = jnp.asarray(rng.randn(B, H, W, N, 3 * dim).astype(np.float32))
        table = jnp.asarray(
            (rng.randn((2 * ws - 1) ** 2, 3 * dim) * 0.1).astype(np.float32))
        params = {"params": {"relative_position_enc_table": table}}
        m_xla = WindowAttention(dim, (ws, ws), 0, heads)
        m_pl = WindowAttention(dim, (ws, ws), 0, heads, use_pallas=True,
                               pallas_interpret=True)
        want = m_xla.apply(params, qkv, None)
        got = m_pl.apply(params, qkv, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)


class TestStripeAttentionDirect:
    """Direct-packing CSWin stripe kernel: parity + custom-VJP gradients."""

    def _args(self, idx):
        from nmrf_tpu.models.nmp import window_attn_mask

        B, H, W, N, C, h = 1, 8, 12, 2, 16, 2
        H_sp, W_sp = (H, 2) if idx == 0 else (2, W)
        rng = np.random.RandomState(7)
        mk = lambda: jnp.asarray(rng.randn(B, H, W, N, C).astype(np.float32))
        q, k, v = mk(), mk(), mk()
        mask = jnp.asarray(window_attn_mask((H_sp, W_sp, N)))
        return q, k, v, mask, 0.25, H_sp, W_sp, h

    @pytest.mark.parametrize("idx", [0, 1])
    def test_matches_reference(self, idx):
        q, k, v, mask, scale, H_sp, W_sp, h = self._args(idx)
        got = fa.stripe_attention_direct(q, k, v, mask, scale, H_sp, W_sp, h,
                                         interpret=True)
        want = fa.stripe_attention_reference(q, k, v, mask, scale,
                                             H_sp, W_sp, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_grad_through_custom_vjp(self):
        q, k, v, mask, scale, H_sp, W_sp, h = self._args(0)
        check_grads(
            lambda q, k, v: jnp.sum(fa.stripe_attention_op(
                q, k, v, mask, scale, H_sp, W_sp, h) ** 2),
            (q, k, v), eps=1e-2, probes=5)


def _window_inputs(table, ws, heads, hd, WB, N, scale, qkv):
    """(qr, kr, ve) kernel inputs from the module's parameter table, in
    qkv.dtype (qkv: already rolled) — mirrors nmp.WindowAttention."""
    from nmrf_tpu.models.nmp import _relative_position_index

    P = ws * ws
    rel = _relative_position_index(ws, ws)
    rpe = table[rel.reshape(-1)].reshape(P, P, heads, 3 * hd).astype(
        qkv.dtype)
    q_e, k_e, v_e = jnp.split(rpe, 3, axis=-1)
    meta, sel = fa.window_meta(ws, ws, WB, N)
    pixs = meta[:, 0]
    R = len(pixs)
    qr, kr = fa.window_positional_terms(qkv, k_e, q_e, scale, ws, ws, WB,
                                        heads)
    # ve is CHANNEL-major (c, s) — see window_attention_native docstring
    ve = v_e.transpose(2, 0, 3, 1)[:, pixs].reshape(heads, R, -1)
    return qr, kr, ve


class TestWindowNative:
    """window_attention_native: in-kernel masks + caller-precomputed
    pixel-granular positional logits must reproduce the WindowAttention
    module math exactly."""

    @pytest.mark.parametrize("shift", [0, 2])
    def test_direct_equals_transposed(self, shift):
        """The direct-packing path (default) must be bit-identical to the
        transposed A/B path in interpret mode, f32 and bf16."""
        B, H, W, N, dim, heads, ws, WB = 2, 8, 24, 2, 16, 2, 4, 3
        hd = dim // heads
        scale = hd ** -0.5
        rng = np.random.RandomState(5)
        qkv = jnp.asarray(rng.randn(B, H, W, N, 3 * dim).astype(np.float32))
        table = jnp.asarray(
            (rng.randn((2 * ws - 1) ** 2, 3 * dim) * 0.1).astype(np.float32))
        for dt in (jnp.float32, jnp.bfloat16):
            qkv_t = qkv.astype(dt)
            qr, kr, ve = _window_inputs(table, ws, heads, hd, WB, N, scale,
                                        qkv_t)
            direct = fa.window_attention_native(
                qkv_t, qr, kr, ve, shift, scale, ws, ws, WB, heads,
                True, interpret=True, direct=True)
            transp = fa.window_attention_native(
                qkv_t, qr, kr, ve, shift, scale, ws, ws, WB, heads,
                True, interpret=True, direct=False)
            assert jnp.array_equal(direct, transp), dt

    @pytest.mark.parametrize("shift", [0, 2])
    def test_matches_module(self, shift):
        B, H, W, N, dim, heads, ws, WB = 1, 8, 24, 2, 16, 2, 4, 3
        hd = dim // heads
        scale = hd ** -0.5
        rng = np.random.RandomState(0)
        qkv = jnp.asarray(rng.randn(B, H, W, N, 3 * dim).astype(np.float32))
        table = jnp.asarray(
            (rng.randn((2 * ws - 1) ** 2, 3 * dim) * 0.1).astype(np.float32))
        params = {"params": {"relative_position_enc_table": table}}
        if shift > 0:
            mask = jnp.asarray(
                shift_window_attn_mask((H, W), (ws, ws, N), shift))
        else:
            nW = (H // ws) * (W // ws)
            mask = jnp.asarray(np.broadcast_to(
                window_attn_mask((ws, ws, N))[None],
                (nW, ws * ws * N, ws * ws * N)).copy())
        want = WindowAttention(dim, (ws, ws), shift, heads).apply(
            params, qkv, mask)

        rolled = jnp.roll(qkv, (-shift, -shift), axis=(1, 2))
        qr, kr, ve = _window_inputs(table, ws, heads, hd, WB, N, scale,
                                    rolled)
        for impl in (fa.window_attention_native_reference,
                     fa.window_attention_native):
            got = impl(rolled, qr, kr, ve, shift, scale,
                       ws, ws, WB, heads, True)
            got = jnp.roll(got, (shift, shift), axis=(1, 2))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4, rtol=1e-4)

    def test_gradients(self):
        """custom-VJP backward (remat through the jnp reference)."""
        B, H, W, N, dim, heads, ws, WB = 1, 4, 8, 1, 8, 2, 4, 2
        hd = dim // heads
        scale = hd ** -0.5
        rng = np.random.RandomState(1)
        qkv = jnp.asarray(rng.randn(B, H, W, N, 3 * dim).astype(np.float32))
        table = jnp.asarray(
            (rng.randn((2 * ws - 1) ** 2, 3 * dim) * 0.1).astype(np.float32))
        qr, kr, ve = _window_inputs(table, ws, heads, hd, WB, N, scale, qkv)
        # eps=1e-2: the central-difference noise floor is |f|*2^-24/(2*eps)
        # with |f| ~ 2e2 here, i.e. ~6e-3 at eps=1e-3 — above atol.  1e-2 is
        # near the f32 optimum (f32_eps^(1/3)) and drops the noise to ~6e-4.
        check_grads(
            lambda qkv, qr, kr, ve: jnp.sum(fa.window_attention_native_op(
                qkv, qr, kr, ve, 2, 0, scale, ws, ws, WB, heads,
                False) ** 2),
            (qkv, qr, kr, ve), eps=1e-2, atol=5e-3, rtol=5e-3)


class TestWindowPosOp:
    """Fully-fused positional op (r5): forward and ALL cotangents —
    including the raw k_embed/q_embed table gradients that never leave
    the kernel as dqr/dkr — must match jax.vjp through the composite
    (window_positional_terms einsum + dense reference attention)."""

    @pytest.mark.parametrize(
        "B,H,W,N,dim,heads,ws,WB,shift",
        [(2, 8, 24, 2, 16, 2, 4, 3, 0),
         (1, 8, 24, 2, 16, 2, 4, 3, 2),
         (1, 12, 12, 3, 8, 2, 6, 1, 3)])
    def test_matches_composite_vjp(self, B, H, W, N, dim, heads, ws, WB,
                                   shift):
        hd = dim // heads
        scale = hd ** -0.5
        P = ws * ws
        rng = np.random.RandomState(0)
        qkv = jnp.asarray(rng.randn(B, H, W, N, 3 * dim).astype(np.float32))
        ke = jnp.asarray(
            (rng.randn(P, P, heads, hd) * 0.1).astype(np.float32))
        qe = jnp.asarray(
            (rng.randn(P, P, heads, hd) * 0.1).astype(np.float32))
        veT = jnp.asarray(
            (rng.randn(P, P, heads, hd) * 0.1).astype(np.float32))
        meta, _ = fa.window_meta(ws, ws, WB, N)
        pixs = meta[:, 0]
        ve = veT.transpose(2, 0, 3, 1)[:, pixs].reshape(
            heads, len(pixs), hd * P)
        g = jnp.asarray(rng.randn(B, H, W, N, dim).astype(np.float32))

        def f_ref(qkv, ke, qe, ve):
            qr, kr = fa.window_positional_terms(qkv, ke, qe, scale,
                                                ws, ws, WB, heads)
            return fa.window_attention_native_reference(
                qkv, qr, kr, ve, shift, scale, ws, ws, WB, heads, True,
                row0=0, hp_total=H)

        o1, vjp1 = jax.vjp(f_ref, qkv, ke, qe, ve)
        o2, vjp2 = jax.vjp(
            lambda qkv, ke, qe, ve: fa.window_attention_pos_op(
                qkv, ke, qe, ve, shift, 0, scale, ws, ws, WB, heads,
                True, -1e9, H, False),
            qkv, ke, qe, ve)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   atol=2e-5, rtol=2e-5)
        for name, a, b in zip(("dqkv", "dke", "dqe", "dve"),
                              vjp1(g), vjp2(g)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-5, atol=2e-5, err_msg=name)


class TestWindowNativeBackwardKernel:
    """Fused Pallas backward (r4) vs the dense reference VJP.

    The cotangents of (qkv, qr, kr, ve) from ``window_attention_native_bwd``
    (single fused kernel, interpret mode) must match ``jax.vjp`` through
    ``window_attention_native_reference`` — the exact backward the op
    shipped before."""

    def _data(self, dtype=np.float32, B=2):
        H, W, N, dim, heads, ws, WB = 8, 24, 2, 16, 2, 4, 3
        hd = dim // heads
        P = ws * ws
        R = ws * WB * ws * N
        nwh, nwwB = H // ws, W // (WB * ws)
        rng = np.random.RandomState(0)
        qkv = jnp.asarray(rng.randn(B, H, W, N, 3 * dim).astype(dtype))
        qr = jnp.asarray(
            (rng.randn(B, nwh, nwwB, heads, R, P) * 0.1).astype(dtype))
        kr = jnp.asarray(
            (rng.randn(B, nwh, nwwB, heads, R, P) * 0.1).astype(dtype))
        ve = jnp.asarray(
            (rng.randn(heads, R, P * hd) * 0.1).astype(dtype))
        g = jnp.asarray(rng.randn(B, H, W, N, dim).astype(dtype))
        scale = hd ** -0.5
        return qkv, (qr, kr, ve), g, scale, ws, WB, heads

    @pytest.mark.parametrize("shift,cm", [(0, True), (2, True), (2, False)])
    def test_matches_reference_vjp(self, shift, cm):
        qkv, (qr, kr, ve), g, scale, ws, WB, heads = self._data()
        _, vjp = jax.vjp(
            lambda qkv, qr, kr, ve: fa.window_attention_native_reference(
                qkv, qr, kr, ve, shift, scale, ws, ws, WB, heads, cm),
            qkv, qr, kr, ve)
        want = vjp(g)
        got = fa.window_attention_native_bwd(
            g, qkv, qr, kr, ve, shift, 0, scale, ws, ws, WB, heads, cm,
            -1e9, None)
        for name, a, b in zip(("dqkv", "dqr", "dkr", "dve"), got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5, err_msg=name)

    def test_sharded_row0(self):
        """Global-coordinate shifted-region mask in the backward: a tile at
        row offset row0 of a taller global image."""
        qkv, (qr, kr, ve), g, scale, ws, WB, heads = self._data()
        _, vjp = jax.vjp(
            lambda qkv, qr, kr, ve: fa.window_attention_native_reference(
                qkv, qr, kr, ve, 2, scale, ws, ws, WB, heads, True,
                row0=8, hp_total=16),
            qkv, qr, kr, ve)
        want = vjp(g)
        got = fa.window_attention_native_bwd(
            g, qkv, qr, kr, ve, 2, 8, scale, ws, ws, WB, heads, True,
            -1e9, 16)
        for name, a, b in zip(("dqkv", "dqr", "dkr", "dve"), got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5, err_msg=name)

    def test_direct_matches_transposed(self):
        """r5 direct-packing backward (image-layout blocks, heads unrolled
        in-kernel) vs the transposed head-major path: identical per-head
        dot sequence and d(ve) revisit order -> bit-equal cotangents.
        Also with the heads split over 2 pallas_calls (the scoped-vmem
        fallback at production shapes, NMRF_BWD_HEAD_GROUPS)."""
        qkv, (qr, kr, ve), g, scale, ws, WB, heads = self._data()
        b = fa.window_attention_native_bwd(
            g, qkv, qr, kr, ve, 2, 0, scale, ws, ws, WB, heads, True,
            -1e9, None, direct=False)
        import os
        for groups in ("0", "2"):
            os.environ["NMRF_BWD_HEAD_GROUPS"] = groups
            try:
                a = fa.window_attention_native_bwd(
                    g, qkv, qr, kr, ve, 2, 0, scale, ws, ws, WB, heads,
                    True, -1e9, None, direct=True)
            finally:
                del os.environ["NMRF_BWD_HEAD_GROUPS"]
            for name, x, y in zip(("dqkv", "dqr", "dkr", "dve"), a, b):
                assert jnp.array_equal(x, y), (groups, name)

    def test_bf16(self):
        """bf16 primals: the value-table grad accumulates in f32 inside the
        kernel — compare against the f32 reference VJP of the same
        (bf16-rounded) inputs at bf16-appropriate tolerance."""
        qkv, (qr, kr, ve), g, scale, ws, WB, heads = self._data(
            dtype=np.float32)
        bf = jnp.bfloat16
        qkvb, qrb, krb, veb, gb = (t.astype(bf) for t in (qkv, qr, kr, ve, g))
        _, vjp = jax.vjp(
            lambda qkv, qr, kr, ve: fa.window_attention_native_reference(
                qkv, qr, kr, ve, 2, scale, ws, ws, WB, heads, True),
            qkvb.astype(jnp.float32), qrb.astype(jnp.float32),
            krb.astype(jnp.float32), veb.astype(jnp.float32))
        want = vjp(gb.astype(jnp.float32))
        got = fa.window_attention_native_bwd(
            gb, qkvb, qrb, krb, veb, 2, 0, scale, ws, ws, WB, heads, True,
            -1e9, None)
        for name, a, b in zip(("dqkv", "dqr", "dkr", "dve"), got, want):
            b = np.asarray(b)
            tol = 0.05 * float(np.abs(b).max())
            np.testing.assert_allclose(
                np.asarray(a).astype(np.float32), b, atol=tol, err_msg=name)


class TestFusedBackwardParity:
    """r4 Pallas backwards of the stripe / masked-attention ops vs the
    dense reference VJPs (analytic, tighter than the numeric gradchecks)."""

    def test_stripe_bwd_matches_reference(self):
        B, Hp, Wp, N, C, heads, H_sp, W_sp = 2, 8, 6, 3, 32, 2, 8, 2
        rng = np.random.RandomState(3)
        q, k, v = (jnp.asarray(rng.randn(B, Hp, Wp, N, C).astype(np.float32))
                   for _ in range(3))
        T = H_sp * W_sp * N
        mask = jnp.asarray(rng.randn(T, T).astype(np.float32))

        def f_op(q, k, v):
            return (fa.stripe_attention_op(
                q, k, v, mask, 0.25, H_sp, W_sp, heads) ** 2).sum()

        def f_ref(q, k, v):
            return (fa.stripe_attention_reference(
                q, k, v, mask, 0.25, H_sp, W_sp, heads) ** 2).sum()

        got = jax.grad(f_op, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5, err_msg=name)

    def test_masked_bwd_matches_reference_rect(self):
        """Rectangular Rk > Rq (the all-gathered sharded-stripe case)."""
        h, G, Rq, Rk, hd = 2, 3, 8, 24, 16
        rng = np.random.RandomState(4)
        q = jnp.asarray(rng.randn(h, G, Rq, hd).astype(np.float32))
        k = jnp.asarray(rng.randn(h, G, Rk, hd).astype(np.float32))
        v = jnp.asarray(rng.randn(h, G, Rk, hd).astype(np.float32))
        mask = jnp.asarray(rng.randn(1, Rq, Rk).astype(np.float32))

        def f_op(q, k, v):
            return (fa.masked_attention_op(q, k, v, mask, 0.3) ** 2).sum()

        def f_ref(q, k, v):
            return (fa.masked_attention_reference(q, k, v, mask, 0.3)
                    ** 2).sum()

        got = jax.grad(f_op, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5, err_msg=name)
