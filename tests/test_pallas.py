"""Pallas fused window attention: parity vs the jnp reference and vs the
WindowAttention module (interpret mode on CPU — the same kernel compiles for
TPU), mirroring the reference's CUDA-vs-golden validation (ops/test.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmrf_tpu.models.nmp import (
    WindowAttention,
    shift_window_attn_mask,
    window_attn_mask,
    _relative_position_index,
)
from nmrf_tpu.ops.pallas.window_attention import (
    fused_window_attention,
    window_attention_reference,
)
from tests.gradcheck import check_grads


def make_inputs(Bw=4, h=2, P=9, N=2, hd=8, nW=2, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(Bw, h, P, N, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(Bw, h, P, N, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(Bw, h, P, N, hd).astype(np.float32))
    ke = jnp.asarray(rng.randn(h, P, P, hd).astype(np.float32) * 0.1)
    qe = jnp.asarray(rng.randn(h, P, P, hd).astype(np.float32) * 0.1)
    ve = jnp.asarray(rng.randn(h, P, P, hd).astype(np.float32) * 0.1)
    mask = jnp.asarray((rng.rand(nW, P, N, P, N) > 0.8).astype(np.float32) * -1e9)
    return q, k, v, ke, qe, ve, mask


class TestFusedKernel:
    def test_kernel_matches_reference(self):
        args = make_inputs()
        got = fused_window_attention(*args, scale=0.35, interpret=True)
        want = window_attention_reference(*args, scale=0.35)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_grad_through_custom_vjp(self):
        from nmrf_tpu.ops.pallas import window_attention as wa

        # interpret-mode forward inside the custom_vjp for CPU testing
        orig = wa.fused_window_attention
        wa_interp = lambda *a, **kw: orig(*a, interpret=True, **kw)
        wa.fused_window_attention = wa_interp
        try:
            q, k, v, ke, qe, ve, mask = make_inputs(Bw=2, h=1, P=4, N=2, hd=4, nW=1)
            check_grads(
                lambda q, k, v: jnp.sum(wa.window_attention_op(
                    q, k, v, ke, qe, ve, mask, 0.5)),
                (q, k, v), probes=5)
        finally:
            wa.fused_window_attention = orig


class TestModuleIntegration:
    @pytest.mark.parametrize("shift", [0, 3])
    def test_pallas_path_matches_xla_path(self, shift):
        """WindowAttention(use_pallas=True) must equal the plain XLA path."""
        B, H, W, N, dim, heads, ws = 1, 12, 12, 2, 8, 2, 6
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
                               pallas_interpret=True)
        want = m_xla.apply(params, qkv, mask)
        got = m_pl.apply(params, qkv, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)
