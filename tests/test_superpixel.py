"""SLIC-lite superpixel generator + superpixel-guided proposal metrics.

The reference's EVAL_PROP chain is broken in its snapshot (no
``downsample_disp`` source, no ``super_pixel_label`` producer — SURVEY.md
§2.1); here the chain is complete: ``data/superpixel.py`` ->
``ops/downsample.py`` -> ``DispEvaluator._process_prop``.
"""

import numpy as np

from nmrf_tpu.data.superpixel import slic_segments
from nmrf_tpu.evalx.evaluation import DispEvaluator


class TestSlicSegments:
    def test_partition_and_shapes(self):
        rng = np.random.RandomState(0)
        img = rng.rand(64, 96, 3).astype(np.float32) * 255
        lab = slic_segments(img)
        assert lab.shape == (64, 96)
        assert lab.min() >= 0 and lab.max() < (64 // 8) * (96 // 8)
        # every superpixel is non-empty on a random image
        assert len(np.unique(lab)) == (64 // 8) * (96 // 8)

    def test_flat_image_is_grid(self):
        """On a constant image color carries no signal; the spatial term
        keeps each pixel with its seeding cell -> exact 8x8 grid."""
        img = np.full((32, 40, 3), 128.0, np.float32)
        lab = slic_segments(img)
        ci, cj = np.meshgrid(np.arange(32) // 8, np.arange(40) // 8,
                             indexing="ij")
        np.testing.assert_array_equal(lab, ci * 5 + cj)

    def test_color_edge_moves_boundary(self):
        """A vertical color edge offset from the grid pulls superpixel
        boundaries toward the image edge (the whole point of SLIC)."""
        img = np.zeros((32, 64, 3), np.float32)
        img[:, :36] = 30.0
        img[:, 36:] = 220.0
        lab = slic_segments(img, iters=3)
        # columns 32..35 sit in grid cell 4 but share the dark color of
        # cell 3; their labels should differ from the bright columns 36+
        left = np.unique(lab[:, 32:36] % 8)
        right = np.unique(lab[:, 36:40] % 8)
        assert not (set(left.tolist()) & set(right.tolist()))

    def test_nondivisible_padding(self):
        rng = np.random.RandomState(1)
        img = rng.rand(37, 50, 3).astype(np.float32) * 255
        lab = slic_segments(img)
        assert lab.shape == (37, 50)
        assert lab.min() >= 0


class TestEvaluatorSuperpixel:
    def _run(self, with_image):
        rng = np.random.RandomState(0)
        H, W = 64, 96
        disp = (rng.rand(1, H, W) * 40 + 1).astype(np.float32)
        valid = np.ones((1, H, W), bool)
        prop = (rng.rand(1, (H // 8) * (W // 8), 4) * 5).astype(np.float32)
        inputs = {"disp": disp, "valid": valid}
        if with_image:
            inputs["img1"] = rng.rand(1, H, W, 3).astype(np.float32) * 255
        ev = DispEvaluator(thres=["1.0"], only_valid=True, max_disp=192)
        ev.process(inputs, {"disp": disp.copy(), "proposal": prop})
        return ev.evaluate()["disp"]

    def test_slic_path_produces_metrics(self):
        res = self._run(with_image=True)
        assert np.isfinite(res["prop_epe"])
        assert 0 <= res["prop_recall_3"] <= 100
        assert 0 <= res["prop_recall_8"] <= 100

    def test_fallback_close_to_slic_on_smooth_data(self):
        """With dense valid GT, superpixel pooling and mean pooling agree
        to within a couple px on random smooth disparity."""
        a = self._run(with_image=True)
        b = self._run(with_image=False)
        assert abs(a["prop_epe"] - b["prop_epe"]) < 3.0

    def test_explicit_labels_take_precedence(self):
        rng = np.random.RandomState(0)
        H, W = 32, 40
        disp = (rng.rand(1, H, W) * 20 + 1).astype(np.float32)
        valid = np.ones((1, H, W), bool)
        prop = np.zeros((1, (H // 8) * (W // 8), 4), np.float32)
        ci, cj = np.meshgrid(np.arange(H) // 8, np.arange(W) // 8,
                             indexing="ij")
        labels = (ci * (W // 8) + cj)[None]
        inputs = {"disp": disp, "valid": valid, "super_pixel_label": labels,
                  "img1": rng.rand(1, H, W, 3).astype(np.float32) * 255}
        ev = DispEvaluator(thres=None, only_valid=True, max_disp=192)
        ev.process(inputs, {"disp": disp.copy(), "proposal": prop})
        res = ev.evaluate()["disp"]
        # grid labels + dense valid => pooled gt == plain mean; proposals are
        # all 0 so prop_epe == mean of pooled gt
        g = disp[0].reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
        expected = g.reshape(H // 8, W // 8, 64).mean(-1).mean()
        np.testing.assert_allclose(res["prop_epe"], expected, rtol=1e-5)


def test_downsample_disp_numpy_matches_jnp():
    """Host (numpy) dispatch is bit-identical to the jnp golden — the
    evaluator uses the numpy path to avoid per-frame device round-trips."""
    import jax.numpy as jnp

    from nmrf_tpu.ops.downsample import downsample_disp

    rng = np.random.default_rng(3)
    disp = (rng.random((2, 16, 24)) * 50).astype(np.float32)
    disp[rng.random((2, 16, 24)) < 0.3] = 0.0
    label = rng.integers(0, 9, (2, 16, 24)).astype(np.int32)
    got_np = downsample_disp(disp, label)
    got_j = np.asarray(downsample_disp(jnp.asarray(disp), jnp.asarray(label)))
    assert isinstance(got_np, np.ndarray)
    np.testing.assert_allclose(got_np, got_j, atol=1e-6)
