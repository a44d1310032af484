"""NMRF training criterion.

Behavioral parity target: reference ``Criterion`` (``nmrf/models/NMRF.py:276-429``)
and loss weighting in ``build`` (``NMRF.py:432-447``).

All boolean-indexed reductions become masked sums (static shapes); the
data-dependent "dummy loss when no valid pixels" branches become
``where(count > 0, loss, 0)`` — numerically identical totals, jit-safe.

Known reference defect handled here (SURVEY.md §2.9.2): the proposal matching
loss is emitted as ``loss_prop`` but weighted under key ``proposal_disp``,
so it receives zero gradient weight.  ``fix_proposal_weight=True`` (default)
weights it at 1.0; False replicates the reference bug bit-for-bit.
"""

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def smooth_l1(x, y):
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def l1(x, y):
    return jnp.abs(x - y)


def _masked_mean(x, mask):
    cnt = mask.sum()
    return jnp.where(cnt > 0, (x * mask).sum() / jnp.maximum(cnt, 1), 0.0)


class Criterion:
    """Pure-function loss aggregator (not a flax module; no parameters)."""

    def __init__(self, max_disp=192, loss_type="L1",
                 loss_weights: Sequence[float] = (1.0,) * 10,
                 aux_loss=True, fix_proposal_weight=True,
                 num_infer_layers=5, num_refine_layers=5):
        assert loss_type in ("L1", "SMOOTH_L1"), loss_type
        self.max_disp = max_disp
        self.loss_fn = smooth_l1 if loss_type == "SMOOTH_L1" else l1
        self.loss_weights = list(loss_weights)
        self.aux_loss = aux_loss
        self.fix_proposal_weight = fix_proposal_weight
        self.num_infer_layers = num_infer_layers
        self.num_refine_layers = num_refine_layers

    # ---- individual losses (reference NMRF.py:301-385) ---- #

    def loss_prop(self, disp_prop, gt_disp):
        """disp_prop: [B, hw, N] (already x8); gt_disp: [B, H, W]."""
        B, H, W = gt_disp.shape
        tgt = jnp.where(gt_disp >= 320, 0.0, gt_disp)
        tgt = tgt.reshape(B, H // 8, 8, W // 8, 8).transpose(0, 1, 3, 2, 4)
        tgt = tgt.reshape(B, -1, 64)  # [B, hw, 64]
        dist = jnp.abs(tgt[:, :, :, None] - disp_prop[:, :, None, :])
        idx = jnp.argmin(dist, axis=-1)  # [B, hw, 64] nearest proposal per GT
        # one-hot select instead of take_along_axis: the [B, hw, 64] gather
        # (+ its scatter-add transpose in the backward) cost 44 ms of the
        # 888 ms production train step (r4 trace) — TPU has no vector
        # gather unit; the N=4 multiply-sum fuses and its backward is a
        # plain reduction.  one_hot(argmin) keeps first-winner tie
        # semantics, matching take_along_axis exactly.
        sel = jax.nn.one_hot(idx, disp_prop.shape[-1], dtype=disp_prop.dtype)
        src = (sel * disp_prop[:, :, None, :]).sum(-1)  # [B, hw, 64]
        mask = (tgt > 0) & (tgt < self.max_disp)
        total = mask.sum()
        loss = (smooth_l1(src, tgt) * mask).sum() / (total + 1e-6)
        return {"loss_prop": loss}

    def loss_init(self, prob, gt_disp):
        """prob: [B*h*w, D]; gt_disp: [B, H, W] (H=8h)."""
        nd = prob.shape[-1]
        B, H, W = gt_disp.shape
        gt = jnp.maximum(gt_disp, 0.0)
        valid = (gt > 0) & (gt < 320)
        coord = jnp.arange(W, dtype=gt.dtype)[None, None, :] - gt
        valid = valid & (coord >= 0)

        tgt = gt / 8.0
        w = valid.astype(gt.dtype)

        def cells(x):
            x = x.reshape(B, H // 8, 8, W // 8, 8).transpose(0, 1, 3, 2, 4)
            return x.reshape(-1, 64)

        tgt_c, w_c, valid_c = cells(tgt), cells(w), cells(valid.astype(gt.dtype))

        from ..ops.histogram import soft_histogram
        label = soft_histogram(tgt_c, w_c, nd)
        label = label / jnp.maximum(label.sum(-1, keepdims=True), 1e-3)

        log_prob = -(jnp.log(jnp.maximum(prob, 1e-6)) * label).sum()
        valid_pixs = (valid_c.sum(-1) > 0).sum()
        return {"init": log_prob / (valid_pixs + 1e-6)}

    def loss_coarse(self, disp_pred, logits_pred, disp_gt):
        """disp_pred/logits_pred: [B, H, W, N] (pred already x8)."""
        mask = (disp_gt > 0) & (disp_gt < self.max_disp)
        prob = jax.nn.softmax(logits_pred, axis=-1)
        err = self.loss_fn(disp_pred, disp_gt[..., None])
        exp_err = (prob * err).sum(-1)
        return {"loss_coarse_disp": _masked_mean(exp_err, mask)}

    def loss_disp(self, disp_pred, disp_gt):
        mask = (disp_gt > 0) & (disp_gt < self.max_disp)
        return {"loss_disp": _masked_mean(self.loss_fn(disp_pred, disp_gt), mask)}

    # ---- aggregation (reference NMRF.py:387-429, build NMRF.py:432-447) ---- #

    def weight_dict(self):
        num_infer_layers = self.num_infer_layers
        num_refine_layers = self.num_refine_layers
        w = {"init": 1.0}
        if self.fix_proposal_weight:
            w["loss_prop"] = 1.0
        else:
            w["proposal_disp"] = 1.0  # reference defect: never matches a loss
        lw = self.loss_weights
        assert len(lw) == num_infer_layers + num_refine_layers
        if self.aux_loss:
            for i in range(num_infer_layers + num_refine_layers - 1):
                if i < num_infer_layers:
                    w[f"loss_coarse_disp_{i}"] = lw[i]
                else:
                    w[f"loss_disp_{i}"] = lw[i]
        w["loss_disp"] = lw[-1]
        return w

    def __call__(self, outputs, targets) -> Dict[str, jnp.ndarray]:
        """Returns dict of scalar losses incl. 'total' and 'epe_train'."""
        gt = jnp.where(targets["valid"], targets["disp"], 0.0)

        losses = {}
        losses.update(self.loss_prop(outputs["proposal"] * 8.0, gt))
        losses.update(self.loss_init(outputs["prob"], gt))
        if "disp_pred" in outputs:
            losses.update(self.loss_disp(outputs["disp_pred"] * 4.0, gt))

        # metric (reference: mean abs err over valid, NMRF.py:411-414)
        valid = (gt > 0) & (gt < self.max_disp)
        losses["epe_train"] = _masked_mean(jnp.abs(outputs["disp"] - gt), valid)

        # aux layer losses
        if self.aux_loss and "coarse_disp_layers" in outputs:
            coarse = outputs["coarse_disp_layers"]  # [L_i, B, H, W, N]
            logits = outputs["logits_layers"]
            L_i = coarse.shape[0]
            for i in range(L_i):
                l = self.loss_coarse(coarse[i] * 8.0, logits[i], gt)
                losses[f"loss_coarse_disp_{i}"] = l["loss_coarse_disp"]
            if "disp_pred_layers" in outputs:
                dpl = outputs["disp_pred_layers"]  # [L_r, B, H, W]
                for j in range(dpl.shape[0] - 1):
                    l = self.loss_disp(dpl[j] * 4.0, gt)
                    losses[f"loss_disp_{L_i + j}"] = l["loss_disp"]

        wd = self.weight_dict()
        losses["total"] = sum(
            losses[k] * wd[k] for k in losses if k in wd)
        return losses
