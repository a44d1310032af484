"""Swin-T backbone + deformable-neck adaptor tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmrf_tpu.config import get_cfg
from nmrf_tpu.models import build_model
from nmrf_tpu.models.adaptor import MSDeformAttn, SwinAdaptor
from nmrf_tpu.models.swin import SwinTransformer


class TestSwinTransformer:
    def test_pyramid_shapes(self):
        model = SwinTransformer(drop_path_rate=0.0)
        x = jnp.zeros((1, 64, 96, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(params, x)
        assert outs["p0"].shape == (1, 16, 24, 96)
        assert outs["p1"].shape == (1, 8, 12, 192)
        assert outs["p2"].shape == (1, 4, 6, 384)
        assert outs["p3"].shape == (1, 2, 3, 768)

    def test_odd_sizes_padded(self):
        model = SwinTransformer(drop_path_rate=0.0)
        x = jnp.zeros((1, 60, 100, 3))  # 15x25 at stride 4: odd for merging
        params = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(params, x)
        assert outs["p0"].shape == (1, 15, 25, 96)
        assert outs["p1"].shape == (1, 8, 13, 192)


class TestMSDeformAttnModule:
    def test_zero_init_offsets_sample_at_reference(self):
        """With zero-init offset weights, sampling starts at the directional
        bias pattern (reference ms_deform_attn.py:64-75); the output must be
        finite and shaped [B, Lq, C]."""
        m = MSDeformAttn(d_model=32, n_levels=2, n_heads=4, n_points=2, ratio=0.5)
        B, Lq = 2, 12
        shapes = [(4, 6), (2, 3)]
        S = sum(h * w for h, w in shapes)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, Lq, 32).astype(np.float32))
        ref = jnp.asarray(rng.rand(B, Lq, 2, 2).astype(np.float32))
        feat = jnp.asarray(rng.randn(B, S, 32).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), q, ref, feat, shapes)
        out = m.apply(params, q, ref, feat, shapes)
        assert out.shape == (B, Lq, 32)
        assert np.isfinite(np.asarray(out)).all()
        # offset bias follows the directional grid init
        bias = np.asarray(params["params"]["sampling_offsets"]["bias"])
        assert bias.reshape(4, 2, 2, 2)[:, 0, 0].any()

    def test_attention_weights_softmax_normalized(self):
        m = MSDeformAttn(d_model=16, n_levels=1, n_heads=2, n_points=2)
        B, Lq = 1, 4
        shapes = [(3, 3)]
        q = jnp.zeros((B, Lq, 16))
        ref = jnp.full((B, Lq, 1, 2), 0.5)
        feat = jnp.ones((B, 9, 16))
        params = m.init(jax.random.PRNGKey(0), q, ref, feat, shapes)
        out = m.apply(params, q, ref, feat, shapes)
        # zero-init attention weights -> uniform softmax -> output = proj of
        # the mean sampled value; must be finite
        assert np.isfinite(np.asarray(out)).all()


class TestSwinAdaptorModel:
    @pytest.mark.slow
    def test_full_swin_nmrf_forward(self):
        cfg = get_cfg()
        cfg.BACKBONE.MODEL_TYPE = "swin"
        cfg.BACKBONE.OUT_CHANNELS = 128
        cfg.BACKBONE.COMPAT = False
        cfg.DATASETS.DIVIS_BY = 32
        cfg.DPN.MAX_DISP = 64
        cfg.freeze()
        model, _ = build_model(cfg)
        img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 128, 3)
                          .astype(np.float32) * 255)
        params = jax.jit(lambda r: model.init(r, img, img, train=False))(
            jax.random.PRNGKey(0))
        out = jax.jit(lambda p, a, b: model.apply(p, a, b, train=False))(
            params, img, img)
        assert out["disp"].shape == (1, 64, 128)
        assert np.isfinite(np.asarray(out["disp"])).all()

    @pytest.mark.slow
    def test_swin_train_step_grads(self):
        """Full swin-NMRF loss backward: exercises the tap-MSDA custom VJP
        (kernel forward, rematerialized tap-reference backward) and the
        fused NMP attention VJPs inside one training gradient."""
        cfg = get_cfg()
        cfg.BACKBONE.MODEL_TYPE = "swin"
        cfg.BACKBONE.OUT_CHANNELS = 128
        cfg.BACKBONE.COMPAT = False
        cfg.DATASETS.DIVIS_BY = 32
        cfg.DPN.MAX_DISP = 64
        cfg.TPU.MSDA_TAP_RADIUS = 2  # small tap span keeps CPU time sane
        cfg.freeze()
        model, criterion = build_model(cfg)
        rng = np.random.RandomState(1)
        img1 = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32) * 255)
        img2 = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32) * 255)
        gt = jnp.asarray((rng.rand(1, 32, 64) * 20).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), img1, img2, train=False)

        def loss_fn(p):
            out = model.apply(p, img1, img2, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)})
            return criterion(out, {"disp": gt,
                                   "valid": jnp.ones_like(gt, bool)})["total"]

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        norms = [float(jnp.abs(g).max()) for g in leaves]
        assert all(np.isfinite(n) for n in norms)
        assert max(norms) > 0  # gradient actually flows
        # sampling-offset grads flow through the tap kernel's VJP
        flat = {jax.tree_util.keystr(p): v for p, v in
                jax.tree_util.tree_flatten_with_path(grads)[0]}
        off = [v for k, v in flat.items() if "sampling_offsets" in k]
        assert off and any(float(jnp.abs(g).max()) > 0 for g in off)
