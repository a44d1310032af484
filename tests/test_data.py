"""Data layer tests: IO round-trips, augmentors, padder, synthetic data,
prefetch loader."""

import os

import numpy as np
import pytest

from nmrf_tpu.data import frame_io
from nmrf_tpu.data.loader import PrefetchLoader, ShardedBatchSampler
from nmrf_tpu.data.synthetic import SyntheticStereoDataset, make_stereo_pair
from nmrf_tpu.data.transforms import FlowAugmentor, SparseFlowAugmentor


class TestFrameIO:
    def test_pfm_roundtrip(self, tmp_path):
        arr = np.random.RandomState(0).rand(7, 9).astype(np.float32)
        path = str(tmp_path / "x.pfm")
        frame_io.write_pfm(path, arr)
        got = frame_io.read_pfm(path)
        np.testing.assert_allclose(got, arr, atol=1e-6)

    def test_kitti_disp_roundtrip(self, tmp_path):
        disp = np.abs(np.random.RandomState(0).rand(5, 6) * 100).astype(np.float32)
        disp[0, 0] = 0.0
        path = str(tmp_path / "d.png")
        frame_io.write_disp_kitti(path, disp)
        got, valid = frame_io.read_disp_kitti(path)
        np.testing.assert_allclose(got, np.round(disp * 256) / 256, atol=1e-6)
        assert not valid[0, 0]

    def test_flo_reader(self, tmp_path):
        flow = np.random.RandomState(0).rand(4, 5, 2).astype(np.float32)
        path = str(tmp_path / "f.flo")
        with open(path, "wb") as f:
            np.array([202021.25], np.float32).tofile(f)
            np.array([5], np.int32).tofile(f)
            np.array([4], np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
        got = frame_io.read_flow(path)
        np.testing.assert_allclose(got, flow, atol=1e-6)

    def test_input_padder_proposal_mode(self):
        """Reference InputPadder semantics (frame_utils.py:259-281)."""
        img = np.random.RandomState(0).rand(37, 50, 3).astype(np.float32)
        padder = frame_io.InputPadder(img.shape, mode="proposal", divis_by=8)
        (p,) = padder.pad(img)
        assert p.shape == (40, 56, 3)
        # right/bottom only
        np.testing.assert_array_equal(p[:37, :50], img)
        disp = p.sum(-1)
        un = padder.unpad(disp)
        assert un.shape == (37, 50)


class TestAugmentors:
    def test_dense_augmentor_shapes(self):
        np.random.seed(0)
        aug = FlowAugmentor(crop_size=[64, 96], do_flip=False)
        img1 = (np.random.rand(100, 140, 3) * 255).astype(np.uint8)
        img2 = (np.random.rand(100, 140, 3) * 255).astype(np.uint8)
        flow = np.random.rand(100, 140, 2).astype(np.float32) * 10
        o1, o2, of = aug(img1, img2, flow)
        assert o1.shape == (64, 96, 3) and o2.shape == (64, 96, 3)
        assert of.shape == (64, 96, 2)

    def test_sparse_augmentor_shapes(self):
        """The reference's sparse augmentor crashes on arity (SURVEY §2.9.1);
        ours must run."""
        np.random.seed(0)
        aug = SparseFlowAugmentor(crop_size=[64, 96])
        img1 = (np.random.rand(100, 140, 3) * 255).astype(np.uint8)
        img2 = (np.random.rand(100, 140, 3) * 255).astype(np.uint8)
        flow = np.random.rand(100, 140, 2).astype(np.float32) * 10
        valid = np.random.rand(100, 140) > 0.5
        o1, o2, of, ov = aug(img1, img2, flow, valid)
        assert o1.shape == (64, 96, 3)
        assert of.shape == (64, 96, 2)
        assert ov.shape == (64, 96) and ov.dtype == bool

    def test_sparse_resize_scatters_valid(self):
        flow = np.zeros((10, 10, 2), np.float32)
        flow[5, 5] = [4.0, 0.0]
        valid = np.zeros((10, 10), np.float32)
        valid[5, 5] = 1
        fi, vi = SparseFlowAugmentor.resize_sparse_flow_map(flow, valid, 2.0, 2.0)
        assert fi.shape == (20, 20, 2)
        assert vi.sum() == 1
        yy, xx = np.argwhere(vi)[0]
        np.testing.assert_allclose(fi[yy, xx], [8.0, 0.0])


class TestSynthetic:
    def test_pair_consistency(self):
        """Left pixels must equal right pixels shifted by GT disparity."""
        img1, img2, disp, valid = make_stereo_pair(32, 64, max_disp=8)
        H, W = disp.shape
        for y in (3, 17, 29):
            for x in range(int(disp[y].max()) + 1, W):
                d = int(disp[y, x])
                if valid[y, x]:
                    np.testing.assert_allclose(img1[y, x], img2[y, x - d])

    def test_dataset_deterministic(self):
        ds = SyntheticStereoDataset(size=4, height=32, width=64)
        a, b = ds[2], ds[2]
        np.testing.assert_array_equal(a["img1"], b["img1"])

    def test_pair_aligned_quantum(self):
        """disp_quantum=8 (the convergence gate's task): every disparity is
        a positive multiple of 8 and the warp stays consistent."""
        rng = np.random.RandomState(3)
        img1, img2, disp, valid = make_stereo_pair(
            64, 128, max_disp=48, rng=rng, disp_quantum=8)
        assert np.all(disp % 8 == 0) and disp.min() >= 8
        assert disp.max() <= 48
        for y in (5, 33):
            for x in range(int(disp[y].max()) + 1, 128):
                if valid[y, x]:
                    np.testing.assert_allclose(
                        img1[y, x], img2[y, x - int(disp[y, x])])

    def test_pair_default_unchanged(self):
        """disp_quantum default leaves the historical sample stream
        bit-identical (per-seed determinism contract)."""
        a = make_stereo_pair(32, 64, max_disp=8, rng=np.random.RandomState(5))
        b = make_stereo_pair(32, 64, max_disp=8, rng=np.random.RandomState(5),
                             disp_quantum=1)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class _GlobalRngDataset:
    """Module-level (spawn-picklable) dataset whose samples depend on the
    global numpy RNG, like the real augmentors."""

    def __len__(self):
        return 4

    def __getitem__(self, i):
        import random
        return {"img1": np.random.rand(8, 8, 3).astype(np.float32),
                # stdlib random too: ColorJitter/AdjustGamma draw from it
                "img2": np.full((8, 8, 3), random.random(), np.float32),
                "disp": np.zeros((8, 8), np.float32),
                "valid": np.ones((8, 8), bool)}


class TestPrefetchLoader:
    def test_batches_and_shapes(self):
        ds = SyntheticStereoDataset(size=10, height=32, width=64)
        sampler = ShardedBatchSampler(len(ds), 4, rank=0, world_size=2, seed=0)
        loader = PrefetchLoader(ds, sampler, num_workers=2)
        batches = list(loader)
        assert len(batches) == 10 // 4
        b = batches[0]
        assert b["img1"].shape == (2, 32, 64, 3)  # local batch = 4/2
        assert b["disp"].shape == (2, 32, 64)
        assert b["valid"].dtype == bool

    def test_process_mode_matches_thread_mode(self):
        # synthetic samples are a pure function of the index, so decode in
        # worker processes must yield byte-identical batches
        ds = SyntheticStereoDataset(size=8, height=32, width=64)
        sampler = ShardedBatchSampler(len(ds), 4, rank=0, world_size=1, seed=0)
        thread = list(PrefetchLoader(ds, sampler, num_workers=2))
        ploader = PrefetchLoader(ds, sampler, num_workers=2,
                                 use_processes=True)
        try:
            proc = list(ploader)
        finally:
            ploader.shutdown()
        assert len(thread) == len(proc) == 2
        for bt, bp in zip(thread, proc):
            for k in ("img1", "img2", "disp", "valid"):
                np.testing.assert_array_equal(bt[k], bp[k])

    def test_process_mode_deterministic_augmentation(self):
        # global-np.random augmentation draws are reproducible per
        # (seed, epoch, rank, step, slot) in process mode
        ds = _GlobalRngDataset()
        sampler = ShardedBatchSampler(len(ds), 2, rank=0, world_size=1, seed=0)

        def run():
            loader = PrefetchLoader(ds, sampler, num_workers=2,
                                    use_processes=True, seed=123)
            try:
                return list(loader)
            finally:
                loader.shutdown()

        a, b = run(), run()
        assert len(a) == len(b) == 2
        for ba, bb in zip(a, b):
            np.testing.assert_array_equal(ba["img1"], bb["img1"])
            np.testing.assert_array_equal(ba["img2"], bb["img2"])
        # different slots got different draws
        assert not np.array_equal(a[0]["img1"][0], a[0]["img1"][1])

    def test_worker_error_propagates(self):
        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                raise RuntimeError("boom")

        sampler = ShardedBatchSampler(4, 2, seed=0)
        loader = PrefetchLoader(Bad(), sampler, num_workers=1)
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)


class TestEvaluator:
    def test_epe_d1_math(self):
        from nmrf_tpu.evalx import DispEvaluator

        ev = DispEvaluator(thres=["1.0", "3.0"], only_valid=True, max_disp=192,
                           eval_prop=False)
        gt = np.zeros((1, 4, 4), np.float32) + 10
        pred = gt + 4.0  # epe 4 everywhere; d1: 4>3 and 4/10>0.05 -> 100%
        valid = np.ones((1, 4, 4), bool)
        ev.process({"disp": gt, "valid": valid}, {"disp": pred})
        res = ev.evaluate()["disp"]
        assert res["epe"] == pytest.approx(4.0)
        assert res["d1"] == pytest.approx(100.0)
        assert res["bad 1.0"] == pytest.approx(100.0)
        assert res["bad 3.0"] == pytest.approx(100.0)

    def test_proposal_recall(self):
        from nmrf_tpu.evalx import DispEvaluator

        ev = DispEvaluator(thres=None, only_valid=True, max_disp=192,
                           eval_prop=True)
        H = W = 16
        gt = np.full((1, H, W), 24.0, np.float32)
        valid = np.ones((1, H, W), bool)
        pred = gt.copy()
        # proposals at 1/8: [1, 4 cells, N=2]; one matches 24/8*8=24 exactly
        prop = np.zeros((1, (H // 8) * (W // 8), 2), np.float32)
        prop[..., 0] = 3.0  # x8 = 24 -> dist 0
        prop[..., 1] = 0.0
        ev.process({"disp": gt, "valid": valid},
                   {"disp": pred, "proposal": prop})
        res = ev.evaluate()["disp"]
        assert res["prop_epe"] == pytest.approx(0.0)
        assert res["prop_recall_3"] == pytest.approx(100.0)


class TestDistGather:
    def test_single_process_identity(self):
        from nmrf_tpu.utils.dist import all_gather_float_lists

        out = all_gather_float_lists([1.0, 2.5, 3.0])
        assert out == [[1.0, 2.5, 3.0]]
