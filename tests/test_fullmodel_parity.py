"""Full-model forward parity vs the torch reference (VERDICT round-1 item #1).

Builds the actual reference NMRF from /root/reference on CPU (random init,
train mode — all drop rates default to 0 so numerics equal eval mode, and
train mode exposes per-layer coarse/logit outputs), converts its
``state_dict()`` with the torch->JAX converter, and demands the flax model
reproduce the complete forward pass — probability volume, proposals, every
intermediate coarse disparity + selection logit layer, and the final
disparity map — to float32 tolerance.  This turns the per-module parity
tests into a single checkpoint-level guarantee covering weight conversion,
module wiring, and output assembly.

Tie handling: the model contains two discrete selections whose tie order is
implementation-defined even between the reference's own CPU and CUDA
backends — topk over probability plateaus (DPN.py:125; plateaus come from
the zero-filled out-of-range correlation) and argmax over near-duplicate
proposal logits (NMRF.py:233).  The test pins topk ties to a well-defined
order on both sides and requires any final-disp mismatch to be spatially
traceable to an argmax near-tie; continuous outputs are compared strictly.

Reference forward contract: /root/reference/nmrf/models/NMRF.py:189-262.
"""

import contextlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmrf_tpu.config import get_cfg as get_cfg_tpu
from nmrf_tpu.models import build_model
from nmrf_tpu.utils.checkpoint import convert_torch_state_dict

from .ref_torch import load_reference

# H, W chosen divisible by 32 (no InputPadder padding in the reference,
# NMRF.py:233-235, and exact swin 1/32 pyramid for the DeformNeck spatial
# shapes, adaptor_modules.py:25-34) and with H/8, W/8 divisible by
# window_size=6 and H/4, W/4 divisible by refine_window_size=4 so both
# implementations see identical (un)padded window grids.
H, W = 96, 192


@contextlib.contextmanager
def _stable_topk():
    """Patch torch.topk with a stable tie-break (lowest index first among
    equal values) for the duration of the reference forward.

    The reference's seed selection (DPN.py:125) calls torch.topk on a
    probability vector that contains exact-equal plateaus wherever the
    correlation volume is zero-filled (out-of-range disparities at the left
    image border, submodule.py build_correlation_volume).  torch's topk tie
    order there is implementation-defined (and differs between CPU and CUDA),
    i.e. the reference's own output at those pixels is backend-dependent.
    jax.lax.top_k documents lowest-index-first ties; this patch pins the
    reference to the same well-defined order so the comparison tests
    conversion + forward math, not torch's unspecified tie permutation.
    """
    import torch

    orig = torch.topk

    def topk(x, k, dim=-1, largest=True, sorted=True):
        assert largest and sorted and dim == -1
        idx = torch.argsort(x, dim=dim, descending=True, stable=True)[..., :k]
        return torch.gather(x, dim, idx), idx

    torch.topk = topk
    try:
        yield
    finally:
        torch.topk = orig


def _dilate(mask, radius):
    """Binary dilation of [B, H, W] by a square structuring element."""
    import cv2

    kernel = np.ones((2 * radius + 1, 2 * radius + 1), np.uint8)
    return np.stack([cv2.dilate(m.astype(np.uint8), kernel) for m in mask]) > 0


def _forward_pair(backbone: str):
    import torch

    get_cfg_ref, build_ref = load_reference()
    ref_cfg = get_cfg_ref()
    ref_cfg.BACKBONE.MODEL_TYPE = backbone
    torch.manual_seed(20260817)
    ref_model, _ = build_ref(ref_cfg)
    ref_model.train()

    rng = np.random.RandomState(7)
    img1 = rng.rand(1, 3, H, W).astype(np.float32) * 255.0
    img2 = rng.rand(1, 3, H, W).astype(np.float32) * 255.0

    with torch.no_grad(), _stable_topk():
        ref_out = ref_model({"img1": torch.from_numpy(img1.copy()),
                             "img2": torch.from_numpy(img2.copy())})

    variables, unmatched = convert_torch_state_dict(ref_model.state_dict())
    assert unmatched == [], f"unconverted torch keys: {unmatched[:10]}"

    cfg = get_cfg_tpu()
    cfg.BACKBONE.MODEL_TYPE = backbone
    cfg.freeze()
    model, _ = build_model(cfg)

    # structural check: converted tree must exactly match the model tree
    target = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
                             train=False),
        jax.random.PRNGKey(0))
    t_paths = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(dict(target))[0]}
    c_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(variables)[0]}
    missing = sorted(set(t_paths) - set(c_paths))
    extra = sorted(set(c_paths) - set(t_paths))
    assert missing == [], f"model params not covered by converter: {missing[:10]}"
    assert extra == [], f"converted params not in model: {extra[:10]}"
    for k in t_paths:
        assert tuple(t_paths[k]) == tuple(c_paths[k]), (k, t_paths[k], c_paths[k])

    j1 = jnp.asarray(img1.transpose(0, 2, 3, 1))
    j2 = jnp.asarray(img2.transpose(0, 2, 3, 1))
    out = jax.jit(
        lambda v, a, b: model.apply(
            v, a, b, train=True, rngs={"dropout": jax.random.PRNGKey(0)})
    )(variables, j1, j2)
    out = {k: np.asarray(v) for k, v in out.items()}
    ref = {k: (v.numpy() if hasattr(v, "numpy") else v)
           for k, v in ref_out.items()}
    ref["aux_outputs"] = [{k: v.numpy() for k, v in d.items()}
                          for d in ref_out["aux_outputs"]]
    return ref, out


@pytest.mark.parametrize("backbone", ["resnet", "swin"])
def test_full_forward_parity(backbone):
    ref, got = _forward_pair(backbone)
    n_infer = got["coarse_disp_layers"].shape[0]

    # --- continuous outputs: strict float32 tolerance --- #
    # initial probability volume [B*H/8*W/8, D]
    np.testing.assert_allclose(got["prob"], ref["prob"], atol=2e-4, rtol=1e-3)
    # proposals [B, H/8*W/8, N] (topk tie order pinned on both sides)
    np.testing.assert_allclose(got["initial_proposal"], ref["initial_proposal"],
                               atol=1e-3, rtol=0)
    np.testing.assert_allclose(got["proposal"], ref["proposal"],
                               atol=1e-3, rtol=0)
    # every inference layer's coarse disparity + selection logits [B,H,W,N]
    for i in range(n_infer):
        np.testing.assert_allclose(got["coarse_disp_layers"][i],
                                   ref["aux_outputs"][i]["disp_pred"],
                                   atol=1e-3, rtol=0, err_msg=f"coarse layer {i}")
        np.testing.assert_allclose(got["logits_layers"][i],
                                   ref["aux_outputs"][i]["logits_pred"],
                                   atol=1e-4, rtol=0, err_msg=f"logits layer {i}")

    # --- selection-dependent final disparity: tie-aware comparison --- #
    # A pixel whose top-2 logit margin is below float32 cross-framework noise
    # can legitimately select a different proposal; the refinement's window
    # attention then spreads that choice locally.  Require every mismatch to
    # be within the refinement receptive field of such a near-tie, and the
    # overall mismatch area to be small.
    logits = ref["aux_outputs"][n_infer - 1]["logits_pred"]  # [B,H,W,N]
    srt = np.sort(logits, axis=-1)
    near_tie = (srt[..., -1] - srt[..., -2]) < 1e-5
    # refinement: 4x4 pool then 5 window-attention layers (window 4, 1/4 res)
    # -> receptive field <= 4 * (1 + 5*4) = 84 full-res px; round up
    tie_region = _dilate(near_tie, radius=96)

    bad = np.abs(got["disp"] - ref["disp"]) > 4e-3
    assert not bad[~tie_region].any(), (
        f"{bad[~tie_region].sum()} disp mismatches outside any near-tie region")
    assert bad.mean() < 0.10, f"mismatch fraction {bad.mean():.3f}"

    bad_pred = np.abs(got["disp_pred"] - ref["disp_pred"]) > 1e-3
    assert not bad_pred[~tie_region].any()
