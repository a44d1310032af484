"""Full-model spatial-sharding parity (VERDICT r1 item 2 / SURVEY §7.3.5).

The decode region (cost volume -> disparity) runs H-sharded inside
``shard_map`` with explicit collectives (ppermute shifted-window rolls,
CSWin stripe all-gather, conv halo exchange, pmean instance norm); the
backbone runs under GSPMD.  These tests demand f32 parity with the
unsharded ``model.apply`` on the 8-device CPU mesh — forward outputs,
training outputs, losses, and gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmrf_tpu.config import get_cfg
from nmrf_tpu.models import build_model
from nmrf_tpu.parallel import make_mesh, spatial_sharded_apply

# mesh: 2 data x 4 spatial.  H=192 -> h8 local 6 (window 6), h4 local 12
# (refine window 4) — the minimal window-aligned tiling.
DATA, SPATIAL = 2, 4
B, H, W = 2, 192, 96


@pytest.fixture(scope="module")
def setup():
    cfg = get_cfg()
    cfg.DPN.MAX_DISP = 64  # D = 8 at 1/8 res
    cfg.SOLVER.MAX_DISP = 48
    cfg.freeze()
    model, criterion = build_model(cfg)
    model_sp, _ = build_model(cfg, spatial_axis="spatial")
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    params = jax.jit(lambda r: model.init(r, img1[:1], img2[:1], train=False))(
        jax.random.PRNGKey(0))
    mesh = make_mesh(DATA, SPATIAL)
    return cfg, model, model_sp, criterion, params, mesh, img1, img2


def _assert_tree_close(ref, got, atol, keys=None):
    for k in keys or ref:
        r, g = np.asarray(ref[k]), np.asarray(got[k])
        assert r.shape == g.shape, (k, r.shape, g.shape)
        err = np.abs(r - g).max()
        assert err < atol, f"{k}: max |diff| = {err}"


class TestSpatialForwardParity:
    def test_eval_forward_matches_unsharded(self, setup):
        _, model, model_sp, _, params, mesh, img1, img2 = setup
        ref = jax.jit(lambda p, a, b: model.apply(p, a, b, train=False))(
            params, img1, img2)

        got = jax.jit(lambda p, a, b: spatial_sharded_apply(
            model_sp, mesh, p, a, b, train=False))(params, img1, img2)
        _assert_tree_close(ref, got, 1e-4,
                           keys=["disp", "prob", "disp_pred"])
        # integer-valued proposals must match exactly
        np.testing.assert_array_equal(np.asarray(ref["initial_proposal"]),
                                      np.asarray(got["initial_proposal"]))
        _assert_tree_close(ref, got, 1e-4, keys=["proposal"])

    def test_batch1_eval_replicates_over_data_axis(self, setup):
        # eval always runs B=1; with a data axis > 1 the batch can't shard,
        # so spatial_sharded_apply must replicate it over `data` (regression:
        # this raised at trace time in shard_map)
        _, model, model_sp, _, params, mesh, img1, img2 = setup
        ref = jax.jit(lambda p, a, b: model.apply(p, a, b, train=False))(
            params, img1[:1], img2[:1])
        got = jax.jit(lambda p, a, b: spatial_sharded_apply(
            model_sp, mesh, p, a, b, train=False))(params, img1[:1], img2[:1])
        _assert_tree_close(ref, got, 1e-4, keys=["disp", "prob", "disp_pred"])

    def test_train_outputs_losses_and_grads_match(self, setup):
        _, model, model_sp, criterion, params, mesh, img1, img2 = setup
        rng = np.random.RandomState(1)
        disp_gt = jnp.asarray((rng.rand(B, H, W) * 40).astype(np.float32))
        valid = jnp.asarray(rng.rand(B, H, W) > 0.2)
        targets = {"disp": disp_gt, "valid": valid}

        def loss_ref(p):
            out = model.apply(p, img1, img2, train=True)
            return criterion(out, targets)["total"]

        def loss_sp(p):
            out = spatial_sharded_apply(model_sp, mesh, p, img1, img2,
                                        train=True)
            return criterion(out, targets)["total"]

        l_ref, g_ref = jax.jit(jax.value_and_grad(loss_ref))(params)
        l_sp, g_sp = jax.jit(jax.value_and_grad(loss_sp))(params)
        assert abs(float(l_ref) - float(l_sp)) < 1e-4, (l_ref, l_sp)

        # Decode-region grads (everything the shard_map collectives touch)
        # must match tightly.  Backbone grads run under GSPMD, where XLA's
        # partitioned conv/instance-norm reductions reorder f32 sums; params
        # feeding an instance norm have near-zero theoretical grads (IN
        # cancels constant shifts), so elementwise comparison is noise there
        # — an unsharded-vs-GSPMD-only probe shows the same deviation with
        # no shard_map involved.  Compare backbone grads by relative L2.
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_sp = jax.tree_util.tree_leaves(g_sp)
        bb_scale = max(np.abs(np.asarray(r)).max()
                       for (path, r) in flat_ref
                       if "backbone" in jax.tree_util.keystr(path))
        for (path, r), g in zip(flat_ref, flat_sp):
            key = jax.tree_util.keystr(path)
            r, g = np.asarray(r), np.asarray(g)
            if "backbone" in key:
                # IN-cancelled leaves (conv biases) carry ~zero true grad,
                # so normalize by the backbone-wide grad scale
                err = np.abs(r - g).max() / bb_scale
                assert err < 1e-2, (key, err)
            else:
                err = np.abs(r - g).max() / (np.abs(r).max() + 1e-6)
                assert err < 5e-3, (key, err)


class TestSpatialTrainStep:
    def test_make_train_step_spatial_runs(self, setup):
        cfg, _, model_sp, criterion, params, mesh, img1, img2 = setup
        from nmrf_tpu.parallel import make_train_step, replicated, shard_batch
        from nmrf_tpu.solver import build_optimizer

        tx, _ = build_optimizer(params, cfg)
        opt_state = tx.init(params)
        rep = replicated(mesh)
        params_r = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
        rng = np.random.RandomState(2)
        batch = shard_batch({
            "img1": np.asarray(img1), "img2": np.asarray(img2),
            "disp": (rng.rand(B, H, W) * 40).astype(np.float32),
            "valid": np.ones((B, H, W), bool),
        }, mesh)
        step = make_train_step(model_sp, criterion, tx, mesh=mesh)
        params2, _, losses = step(params_r, opt_state, batch)
        assert np.isfinite(float(losses["total"]))
        # params actually moved
        delta = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()), params_r, params2))
        assert delta > 0


class TestSpatialSwinForwardParity:
    @pytest.mark.slow
    def test_swin_forward_matches_unsharded(self):
        """Swin variant under the spatial mesh: the deformable backbone
        (tap-MSDA Pallas path) runs under GSPMD, the decode region
        H-sharded inside shard_map — must match the unsharded forward.

        Parity contract (root cause of the round-2 red test, diagnosed with
        tools/debug_swin_spatial.py): every CONTINUOUS tensor matches to f32
        reduction-reorder noise (<1e-4; measured <7e-7 here), but the
        decode's winner selection is an argmax over N=4 logits — one pixel
        in this fixture has a top1-top2 logit gap of 4.8e-8, so the sharded
        path's (equally valid) different summation order flips its winner,
        shifting final disp by up to the candidate gap at a few pixels.
        That is selection noise, not a sharding bug, so the discrete check
        is tie-aware: any argmax flip must sit on a sub-1e-5 logit margin
        and disp must match tightly away from flip influence."""
        cfg = get_cfg()
        cfg.BACKBONE.MODEL_TYPE = "swin"
        cfg.BACKBONE.OUT_CHANNELS = 128
        cfg.BACKBONE.COMPAT = False
        cfg.DATASETS.DIVIS_BY = 32
        cfg.DPN.MAX_DISP = 64
        cfg.TPU.MSDA_TAP_RADIUS = 2  # small tap span keeps CPU time sane
        cfg.freeze()
        model, _ = build_model(cfg)
        model_sp, _ = build_model(cfg, spatial_axis="spatial")
        rng = np.random.RandomState(1)
        img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
        img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
        params = jax.jit(
            lambda r: model.init(r, img1[:1], img2[:1], train=False))(
            jax.random.PRNGKey(0))
        mesh = make_mesh(DATA, SPATIAL)
        # train=True surfaces the aux per-layer tensors (all drop rates are
        # 0 in this config, so train and eval compute identically)
        ref = jax.jit(lambda p, a, b: model.apply(p, a, b, train=True))(
            params, img1, img2)
        got = jax.jit(lambda p, a, b: spatial_sharded_apply(
            model_sp, mesh, p, a, b, train=True))(params, img1, img2)

        # 1) continuous parity: every pre-selection tensor, every layer
        _assert_tree_close(ref, got, 1e-4,
                           keys=["prob", "proposal", "coarse_disp_layers",
                                 "logits_layers"])
        np.testing.assert_array_equal(np.asarray(ref["initial_proposal"]),
                                      np.asarray(got["initial_proposal"]))

        # 2) discrete winner selection: flips allowed only on degenerate
        # (noise-level) logit margins, and only a handful of them
        rl = np.asarray(ref["logits_layers"][-1])
        gl = np.asarray(got["logits_layers"][-1])
        flips = rl.argmax(-1) != gl.argmax(-1)
        if flips.any():
            srt = np.sort(rl, axis=-1)
            gaps = (srt[..., -1] - srt[..., -2])[flips]
            assert gaps.max() < 1e-5, f"non-tie argmax flip, margin {gaps.max()}"
            assert flips.mean() < 1e-3, f"{flips.sum()} flips / {flips.size}"

        # 3) final disparity: strict when selection agreed everywhere;
        # otherwise bounded by flip influence (median pool + refinement
        # damp a 2 px coarse winner change to <0.1 px downstream)
        for k in ("disp", "disp_pred"):
            r, g = np.asarray(ref[k]), np.asarray(got[k])
            err = np.abs(r - g)
            if not flips.any():
                assert err.max() < 1e-4, f"{k}: {err.max()}"
            else:
                assert err.max() < 0.1, f"{k}: {err.max()}"
                assert (err > 1e-4).mean() < 0.01, (k, (err > 1e-4).mean())
