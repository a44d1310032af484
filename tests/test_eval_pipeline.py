"""End-to-end evaluation pipeline: train.evaluate on a synthetic dataset.

Drives the full eval flow the CLI uses (reference ``main.py:302-324`` +
``nmrf/utils/evaluation.py:166-289``): build_val_dataset -> InputPadder +
eval-bucket padding -> jitted eval step -> DispEvaluator metrics -> csv
logging.  Tiny shapes, CPU.
"""

import logging

import numpy as np
import jax
import jax.numpy as jnp

from nmrf_tpu.config import get_cfg
from nmrf_tpu.models import build_model


import pytest


@pytest.mark.parametrize("size", ["synthetic_2x48x96", "synthetic_1x50x70"])
def test_evaluate_synthetic_end_to_end(size):
    """48x96 divides everything; 50x70 forces real padder + bucket padding
    (56x72 -> 64x96) and the proposal-grid crop back to the padder extent."""
    import train as train_mod

    cfg = get_cfg()
    cfg.DPN.MAX_DISP = 64
    cfg.DATASETS.TEST = [size]
    cfg.TEST.EVAL_THRESH = [["1.0", "3.0"]]
    cfg.TEST.EVAL_MAX_DISP = [64]
    cfg.TEST.EVAL_ONLY_VALID = [True]
    cfg.TEST.EVAL_PROP = [True]
    cfg.TPU.EVAL_BUCKET = 32
    cfg.freeze()

    model, _ = build_model(cfg)
    img = jnp.zeros((1, 48, 96, 3), jnp.float32)
    params = jax.jit(lambda r: model.init(r, img, img, train=False))(
        jax.random.PRNGKey(0))

    @jax.jit
    def eval_step(p, a, b):
        return model.apply(p, a, b, train=False)

    logger = logging.getLogger("test_eval")
    results = train_mod.evaluate(eval_step, params, cfg, logger)

    res = results["disp"]
    assert np.isfinite(res["epe"]) and res["epe"] > 0
    for k in ("bad 1.0", "bad 3.0", "prop_epe", "prop_recall_3"):
        assert k in res and np.isfinite(res[k]), (k, res)
    # random-init model on synthetic stereograms: epe is large but bounded
    assert res["epe"] < 64
