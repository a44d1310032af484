"""Tap-MSDA exactness guard (VERDICT r2 item 7).

The tap kernel drops contributions whose learned offsets leave the tap span
(ops/pallas/msda.py docstring contract); training must notice.  These tests
drive the full chain: sown ``msda_tap_oob`` intermediate -> train-step metric
-> TapOOBGuard warn/fallback decision.
"""

import logging

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmrf_tpu.config import get_cfg
from nmrf_tpu.models import build_model
from nmrf_tpu.parallel import make_mesh, make_train_step
from nmrf_tpu.utils.guards import TapOOBGuard

B, H, W = 1, 96, 96  # h8=12: local 6 rows on a 2-tile mesh (window 6)


@pytest.fixture(scope="module")
def swin_setup():
    cfg = get_cfg()
    cfg.BACKBONE.MODEL_TYPE = "swin"
    cfg.BACKBONE.OUT_CHANNELS = 128
    cfg.BACKBONE.COMPAT = False
    cfg.DATASETS.DIVIS_BY = 32
    cfg.DPN.MAX_DISP = 64
    cfg.SOLVER.MAX_DISP = 48
    cfg.TPU.MSDA_TAP_RADIUS = 2
    cfg.freeze()
    model, criterion = build_model(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    params = jax.jit(lambda r: model.init(r, img, img, train=False))(
        jax.random.PRNGKey(0))
    batch = {
        "img1": img, "img2": img,
        "disp": jnp.asarray((rng.rand(B, H, W) * 30).astype(np.float32)),
        "valid": jnp.ones((B, H, W), bool),
    }
    return cfg, model, criterion, params, batch


def _push_offsets_oob(params, shift=50.0):
    """Force every sampling offset far outside the tap span."""
    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy

    def bump(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = bump(v)
            else:
                out[k] = v
        if "sampling_offsets" in tree:
            so = dict(tree["sampling_offsets"])
            so["bias"] = jnp.full_like(so["bias"], shift)
            out["sampling_offsets"] = so
        return out

    return {"params": bump(p["params"])}


def test_train_step_surfaces_oob_metric(swin_setup):
    cfg, model, criterion, params, batch = swin_setup
    from nmrf_tpu.solver import build_optimizer

    tx, _ = build_optimizer(params, cfg)
    opt_state = tx.init(params)
    step = make_train_step(model, criterion, tx, monitor_oob=True)
    _, _, losses = step(params, opt_state, batch)
    assert "msda_tap_oob" in losses
    # init offsets are <= 4 px at the coarsest level; with radius 2 some
    # fraction may exceed, but it must be a valid fraction
    oob0 = float(losses["msda_tap_oob"])
    assert 0.0 <= oob0 <= 1.0

    # synthetic out-of-range offsets must trip the metric to ~1.0
    bad_params = _push_offsets_oob(params)
    _, _, losses_bad = step(bad_params, opt_state, batch)
    oob_bad = float(losses_bad["msda_tap_oob"])
    assert oob_bad > 0.9, oob_bad
    assert oob_bad > oob0


def test_spatial_train_step_surfaces_oob_metric(swin_setup):
    cfg, _, criterion, params, batch = swin_setup
    from nmrf_tpu.solver import build_optimizer

    model_sp, _ = build_model(cfg, spatial_axis="spatial")
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    tx, _ = build_optimizer(params, cfg)
    opt_state = tx.init(params)
    step = make_train_step(model_sp, criterion, tx, mesh=mesh,
                           monitor_oob=True)
    bad_params = _push_offsets_oob(params)
    _, _, losses = step(bad_params, opt_state, batch)
    assert float(losses["msda_tap_oob"]) > 0.9


def test_oob_carry_preserves_spike_between_log_points(swin_setup):
    """An OOB spike at a non-log step must still trip the guard at the next
    log point: the step reports max(step oob, carry) and the caller threads
    the carry forward (VERDICT r3 weak #5).  Simulates train.py's loop: step
    1 runs clean params, step 2 spikes (bad params), step 3 runs clean again;
    the value read at the 'log point' after step 3 must reflect the spike."""
    cfg, model, criterion, params, batch = swin_setup
    from nmrf_tpu.solver import build_optimizer

    tx, _ = build_optimizer(params, cfg)
    opt_state = tx.init(params)
    step = make_train_step(model, criterion, tx, monitor_oob=True)

    bad_params = _push_offsets_oob(params)
    oob_carry = 0.0
    # step 1: clean (low oob)
    _, _, losses = step(params, opt_state, batch, 0, oob_carry)
    oob_carry = losses["msda_tap_oob"]
    baseline = float(oob_carry)
    # step 2: spike (not a log point — no readback)
    _, _, losses = step(bad_params, opt_state, batch, 1, oob_carry)
    oob_carry = losses["msda_tap_oob"]
    # step 3: clean again; the log-point readback happens after this step
    _, _, losses = step(params, opt_state, batch, 2, oob_carry)
    interval_max = float(losses["msda_tap_oob"])
    assert interval_max > 0.9, interval_max  # spike survived to the readback

    # without the carry the same sequence would hide the spike
    _, _, losses_no_carry = step(params, opt_state, batch, 2, 0.0)
    assert float(losses_no_carry["msda_tap_oob"]) <= max(baseline, 0.5)

    g = TapOOBGuard(thresh=1e-3, fallback=True)
    assert g.check(interval_max) is True  # guard trips on the interval max


def test_guard_warn_and_fallback_decision(caplog):
    g = TapOOBGuard(thresh=1e-3, fallback=False)
    with caplog.at_level(logging.WARNING, logger="nmrf_tpu.utils.guards"):
        assert g.check(0.0) is False
        assert g.check(5e-4) is False
        assert caplog.records == []
        assert g.check(0.02) is False  # warns but no fallback configured
    assert any("DROPPED" in r.getMessage() for r in caplog.records)

    g2 = TapOOBGuard(thresh=1e-3, fallback=True)
    assert g2.check(0.02) is True    # request rebuild exactly once
    assert g2.check(0.5) is False    # already fired
    g3 = TapOOBGuard(thresh=-1, fallback=True)
    assert not g3.enabled and g3.check(1.0) is False
