"""Criterion loss parity vs inline-torch goldens of the reference math
(``nmrf/models/NMRF.py:301-385``)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from nmrf_tpu.models.losses import Criterion

RNG = np.random.RandomState(0)


def make_crit(**kw):
    kw.setdefault("max_disp", 192)
    kw.setdefault("loss_weights", [1.0] * 10)
    return Criterion(**kw)


class TestLossProp:
    def test_matches_torch_reference(self):
        """Reference Criterion.loss_prop (NMRF.py:301-320)."""
        B, H, W, N = 2, 16, 24, 4
        gt = (RNG.rand(B, H, W) * 400).astype(np.float32)
        gt[0, :3] = 0.0
        prop = (RNG.rand(B, (H // 8) * (W // 8), N) * 300).astype(np.float32)

        # torch golden
        tgt = torch.from_numpy(gt.copy())
        tgt[tgt >= 320] = 0
        tgt = tgt.reshape(B, H // 8, 8, W // 8, 8).permute(0, 1, 3, 2, 4)
        tgt = tgt.reshape(B, -1, 64)
        tp = torch.from_numpy(prop)
        dist = (tgt[:, :, :, None] - tp[:, :, None, :]).abs()
        _, idx = torch.min(dist, dim=-1)
        src = torch.gather(tp, dim=-1, index=idx)
        mask = (tgt > 0) & (tgt < 192)
        total = mask.sum()
        want = F.smooth_l1_loss(src[mask], tgt[mask], reduction="sum") / (total + 1e-6)

        got = make_crit().loss_prop(jnp.asarray(prop), jnp.asarray(gt))["loss_prop"]
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


class TestLossInit:
    def test_matches_torch_reference(self):
        """Reference Criterion.loss_init (NMRF.py:322-366)."""
        B, H, W, D = 2, 16, 24, 12
        gt = (RNG.rand(B, H, W) * 100).astype(np.float32)
        gt[1, 5:8] = 0.0
        prob_np = np.abs(RNG.rand(B * (H // 8) * (W // 8), D)).astype(np.float32)
        prob_np /= prob_np.sum(-1, keepdims=True)

        # torch golden
        tprob = torch.from_numpy(prob_np)
        tgt_disp = torch.clamp(torch.from_numpy(gt), min=0)
        valid = (tgt_disp > 0) & (tgt_disp < 320)
        ref = torch.arange(W).view(1, 1, -1).repeat(B, H, 1)
        coord = ref - tgt_disp
        valid = valid & (coord >= 0)
        scaled = tgt_disp / 8
        weights = torch.ones_like(scaled)
        weights[~valid] = 0

        def cells(x):
            return (x.reshape(B, H // 8, 8, W // 8, 8).permute(0, 1, 3, 2, 4)
                    .reshape(-1, 64))

        scaled_c, weights_c, valid_c = cells(scaled), cells(weights), cells(valid.float())
        lower = torch.floor(scaled_c).to(torch.int64)
        high = lower + 1
        high_p = scaled_c - lower
        lower = torch.clamp(lower, max=D - 1)
        high = torch.clamp(high, max=D - 1)
        label = torch.zeros_like(tprob)
        label.scatter_reduce_(-1, lower, (1 - high_p) * weights_c, reduce="sum")
        label.scatter_reduce_(-1, high, high_p * weights_c, reduce="sum")
        label = label / torch.clamp(label.sum(-1, keepdim=True), min=1e-3)
        mask = label > 0
        log_prob = -(torch.log(torch.clamp(tprob[mask], min=1e-6)) * label[mask]).sum()
        valid_pixs = (valid_c.sum(-1) > 0).sum()
        want = log_prob / (valid_pixs + 1e-6)

        got = make_crit().loss_init(jnp.asarray(prob_np), jnp.asarray(gt))["init"]
        np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


class TestLossCoarseDisp:
    @pytest.mark.parametrize("loss_type", ["L1", "SMOOTH_L1"])
    def test_coarse_matches_torch(self, loss_type):
        """Reference Criterion.loss_coarse (NMRF.py:368-377)."""
        B, H, W, N = 1, 8, 8, 4
        gt = (RNG.rand(B, H, W) * 100).astype(np.float32)
        pred = (RNG.rand(B, H, W, N) * 100).astype(np.float32)
        logits = RNG.randn(B, H, W, N).astype(np.float32)

        fn = F.smooth_l1_loss if loss_type == "SMOOTH_L1" else F.l1_loss
        tgt = torch.from_numpy(gt)
        tpred = torch.from_numpy(pred)
        tlog = torch.from_numpy(logits)
        mask = (tgt > 0) & (tgt < 192)
        tprob = F.softmax(tlog, dim=-1)
        err = fn(tpred, tgt.unsqueeze(-1).expand_as(tpred), reduction="none")
        want = torch.sum(tprob * err, dim=-1)[mask].mean()

        crit = make_crit(loss_type=loss_type)
        got = crit.loss_coarse(jnp.asarray(pred), jnp.asarray(logits),
                               jnp.asarray(gt))["loss_coarse_disp"]
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    @pytest.mark.parametrize("loss_type", ["L1", "SMOOTH_L1"])
    def test_disp_matches_torch(self, loss_type):
        """Reference Criterion.loss_disp (NMRF.py:379-385)."""
        B, H, W = 1, 8, 8
        gt = (RNG.rand(B, H, W) * 250).astype(np.float32)  # some beyond 192
        pred = (RNG.rand(B, H, W) * 100).astype(np.float32)
        fn = F.smooth_l1_loss if loss_type == "SMOOTH_L1" else F.l1_loss
        tgt = torch.from_numpy(gt)
        tp = torch.from_numpy(pred)
        mask = (tgt > 0) & (tgt < 192)
        want = fn(tp[mask], tgt[mask], reduction="mean")
        crit = make_crit(loss_type=loss_type)
        got = crit.loss_disp(jnp.asarray(pred), jnp.asarray(gt))["loss_disp"]
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_no_valid_pixels_is_finite(self):
        gt = np.zeros((1, 8, 8), np.float32)
        pred = (RNG.rand(1, 8, 8) * 10).astype(np.float32)
        crit = make_crit()
        got = crit.loss_disp(jnp.asarray(pred), jnp.asarray(gt))["loss_disp"]
        assert float(got) == 0.0
