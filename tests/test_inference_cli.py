"""inference.py CLI end-to-end on CPU (reference ``inference.py`` parity).

Drives all three modes — ``--input`` glob pairs, ``--dataset-name`` demo
rendering, and KITTI submission — plus the ``SOLVER.RESUME`` native
checkpoint restore inside ``build()`` (save -> restore -> predict round
trip).  Tiny shapes; the jitted eval step compiles once per config.
"""

import os
import os.path as osp
import sys

import numpy as np
import pytest
from PIL import Image

import inference as cli
from nmrf_tpu.data.frame_io import read_disp_kitti

H, W = 32, 64
OPTS = ["DPN.MAX_DISP", "64"]


def _png(path, size=(H, W)):
    os.makedirs(osp.dirname(path), exist_ok=True)
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(*size, 3) * 255).astype(np.uint8)).save(path)


def _run(argv):
    old = sys.argv
    sys.argv = ["inference.py"] + argv
    try:
        cli.main()
    finally:
        sys.argv = old


class TestInferenceCLI:
    def test_input_glob_mode(self, tmp_path):
        for n in ("a", "b"):
            _png(str(tmp_path / f"{n}_left.png"))
            _png(str(tmp_path / f"{n}_right.png"))
        out = str(tmp_path / "out")
        _run(["--input", str(tmp_path / "*_left.png"),
              str(tmp_path / "*_right.png"), "--output", out] + OPTS)
        made = sorted(os.listdir(out))
        assert made == ["a_left_disp.png", "b_left_disp.png"]
        im = np.asarray(Image.open(osp.join(out, made[0])))
        assert im.shape[:2] == (H, W)

    def test_kitti_submission_mode(self, tmp_path):
        root = str(tmp_path / "data" / "KITTI" / "KITTI_2015" / "testing")
        _png(osp.join(root, "image_2", "000000_10.png"))
        _png(osp.join(root, "image_3", "000000_10.png"))
        out = str(tmp_path / "sub")
        _run(["--dataset-name", "kitti_2015", "--output", out,
              "DATASETS.ROOT", str(tmp_path / "data")] + OPTS)
        files = os.listdir(out)
        assert files == ["000000_10.png"]
        # uint16 x256 submission encoding round-trips (frame_io parity)
        disp, valid = read_disp_kitti(osp.join(out, files[0]))
        assert disp.shape == (H, W) and np.isfinite(disp).all()

    def test_dataset_demo_mode_with_restore(self, tmp_path):
        """eth3d demo rendering + SOLVER.RESUME native-checkpoint restore
        (the build() orbax path: restore raw tree, keep params)."""
        import jax
        import jax.numpy as jnp

        from nmrf_tpu.config import get_cfg
        from nmrf_tpu.models import build_model
        from nmrf_tpu.utils.checkpoint import save_checkpoint
        from nmrf_tpu.data.frame_io import write_pfm

        # fake ETH3D layout
        droot = str(tmp_path / "data")
        sc = osp.join(droot, "ETH3D", "two_view_training", "scene_1l")
        _png(osp.join(sc, "im0.png"))
        _png(osp.join(sc, "im1.png"))
        gt = osp.join(droot, "ETH3D", "two_view_training_gt", "scene_1l")
        os.makedirs(gt, exist_ok=True)
        write_pfm(osp.join(gt, "disp0GT.pfm"),
                  np.full((H, W), 5.0, np.float32))

        # save a native checkpoint to restore through the CLI
        cfg = get_cfg()
        cfg.merge_from_list(OPTS)
        cfg.freeze()
        model, _ = build_model(cfg)
        dummy = jnp.zeros((1, 64, 128, 3), jnp.float32)
        params = jax.jit(lambda r: model.init(r, dummy, dummy, train=False))(
            jax.random.PRNGKey(7))
        ckpt_dir = str(tmp_path / "ckpt")
        save_checkpoint(ckpt_dir, 3, {"params": params, "opt_state": {},
                                      "step": 3})

        out = str(tmp_path / "demo")
        _run(["--dataset-name", "eth3d", "--show-attr", "error",
              "--output", out, "DATASETS.ROOT", droot,
              "SOLVER.RESUME", ckpt_dir] + OPTS)
        files = os.listdir(out)
        assert files == ["000000.png"]
        im = np.asarray(Image.open(osp.join(out, files[0])))
        assert im.shape[:2] == (H, W)
