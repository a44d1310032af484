"""Every shipped YAML config merges cleanly and resolves to a valid model
spec (reference ``configs/*.yaml`` parity — values match the reference
tree; ``__BASE__`` chains resolve)."""

import glob
import os.path as osp

import pytest

from nmrf_tpu.config import get_cfg
from nmrf_tpu.models import build_model

CONFIGS = sorted(glob.glob(
    osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
             "configs", "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[osp.basename(p) for p in CONFIGS])
def test_config_merges_and_builds(path):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    cfg.freeze()
    # constructing the modules validates every spec field (flax dataclass
    # construction is cheap — no params are materialized)
    model, criterion = build_model(cfg)
    assert model.backbone_type in ("resnet", "swin")
    assert len(cfg.SOLVER.LOSS_WEIGHTS) == (cfg.NMP.NUM_INFER_LAYERS
                                            + cfg.NMP.NUM_REFINE_LAYERS)
    assert cfg.DPN.MAX_DISP % 8 == 0
    # eval lists stay aligned with the test datasets
    n = len(cfg.DATASETS.TEST)
    for k in ("EVAL_THRESH", "EVAL_MAX_DISP", "EVAL_ONLY_VALID", "EVAL_PROP"):
        assert len(getattr(cfg.TEST, k)) >= n, (path, k)


def test_all_configs_found():
    assert len(CONFIGS) >= 6, CONFIGS  # the reference ships 6 variants


def test_merge_from_list_rejects_unknown_keys():
    """yacs parity: a typo'd override (or a stray CLI flag landing in the
    KEY VALUE remainder) must raise, not silently create a dead key."""
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["--config-file", "configs/sceneflow_swint.yaml"])
    with pytest.raises(KeyError):
        cfg.merge_from_list(["SOLVER.BASE_LRR", "1e-4"])
    with pytest.raises(KeyError):
        cfg.merge_from_list(["SOLVERR.BASE_LR", "1e-4"])
    cfg.merge_from_list(["SOLVER.BASE_LR", "1e-4"])  # valid key still merges
    assert cfg.SOLVER.BASE_LR == 1e-4


def test_merge_from_file_rejects_unknown_keys(tmp_path):
    """File merges are strict too (ADVICE r2): a typo'd YAML key — including
    one inherited through a __BASE__ chain — raises instead of becoming a
    silent dead key."""
    bad = tmp_path / "bad.yaml"
    bad.write_text("SOLVER:\n  BASE_LRR: 1e-4\n")
    with pytest.raises(KeyError, match="SOLVER.BASE_LRR"):
        get_cfg().merge_from_file(str(bad))
    child = tmp_path / "child.yaml"
    child.write_text(f"__BASE__: {bad.name}\n")
    with pytest.raises(KeyError, match="SOLVER.BASE_LRR"):
        get_cfg().merge_from_file(str(child))
    ok = tmp_path / "ok.yaml"
    ok.write_text("SOLVER:\n  BASE_LR: 1e-4\n")
    cfg = get_cfg().merge_from_file(str(ok))
    assert cfg.SOLVER.BASE_LR == 1e-4
