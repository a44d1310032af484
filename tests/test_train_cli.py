"""train.py CLI end-to-end: short synthetic run -> checkpoint -> resume.

Subprocess-drives the real CLI on CPU (reference ``main.py`` train loop):
4 steps on random-dot stereograms with in-training eval, then resumes from
the saved checkpoint and verifies the step counter continues to 6.  Also
covers --eval-only.  Marked slow (two fresh jit compiles).
"""

import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

BASE_OPTS = [
    "DATASETS.TRAIN", "('synthetic_4x32x64',)",
    "DATASETS.TEST", "['synthetic_1x32x64']",
    "TEST.EVAL_THRESH", "[['1.0']]",
    "TEST.EVAL_MAX_DISP", "[64]",
    "TEST.EVAL_ONLY_VALID", "[True]",
    "TEST.EVAL_PROP", "[False]",
    "TEST.EVAL_PERIOD", "4",
    "DPN.MAX_DISP", "64",
    "SOLVER.MAX_DISP", "48",
    "SOLVER.IMS_PER_BATCH", "2",
    "SOLVER.LATEST_CHECKPOINT_PERIOD", "2",
    "SOLVER.CHECKPOINT_PERIOD", "100",
    "DATALOADER.NUM_WORKERS", "0",
    "TPU.EVAL_BUCKET", "32",
]


def _run(args, cwd):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    return subprocess.run(
        [sys.executable, osp.join(REPO, "train.py")] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1500)


@pytest.mark.slow
def test_train_resume_eval_only(tmp_path):
    ckpt = str(tmp_path / "ckpt")

    # ---- 4 training steps from scratch ---- #
    r = _run(["--checkpoint-dir", ckpt] + BASE_OPTS
             + ["SOLVER.MAX_ITER", "4"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Training done" in r.stderr + r.stdout
    assert osp.exists(osp.join(ckpt, "config.yaml"))

    from nmrf_tpu.utils.checkpoint import restore_checkpoint
    state, _ = restore_checkpoint(ckpt)
    assert int(state["step"]) == 4

    # ---- resume to 6: the loop must continue from step 4 ---- #
    r = _run(["--checkpoint-dir", ckpt] + BASE_OPTS
             + ["SOLVER.MAX_ITER", "6", "SOLVER.RESUME", ckpt],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    state, _ = restore_checkpoint(ckpt)
    assert int(state["step"]) == 6

    # ---- eval-only restores and evaluates ---- #
    r = _run(["--checkpoint-dir", str(tmp_path / "eval"), "--eval-only"]
             + BASE_OPTS + ["SOLVER.RESUME", ckpt], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    log = r.stderr + r.stdout
    assert "copypaste:" in log and "epe" in log, (r.stdout[-500:],
                                                  r.stderr[-500:])
