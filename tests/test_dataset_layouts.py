"""Dataset adapters vs fabricated on-disk layouts.

Round-1 gap (VERDICT §2.22): the eight adapters were "present but never
exercised against real dataset layouts".  These tests fabricate each
dataset's directory tree with tiny real files (PNG/PFM/NPY/JSON) matching
the layouts the reference globs (``/root/reference/nmrf/data/datasets.py``
:147-174 SceneFlow, :187-189 Carla, :201-203 ETH3D, :214-216 Sintel,
:229-234 FallingThings, :246-253 TartanAir, :268-316 KITTI, :328-338
Middlebury), then assert enumeration, left/right/disparity pairing, and a
full ``__getitem__`` round-trip (image/disparity/valid contract).

Pure host-side code: no jax, no jit.
"""

import json
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from nmrf_tpu.data import datasets as D
from nmrf_tpu.data.frame_io import write_pfm

H, W = 32, 48


def _rgb(path, value=None, size=(H, W)):
    os.makedirs(osp.dirname(path), exist_ok=True)
    rng = np.random.RandomState(0)
    arr = (rng.rand(*size, 3) * 255).astype(np.uint8) if value is None \
        else np.full((*size, 3), value, np.uint8)
    Image.fromarray(arr).save(path)


def _gray16(path, arr):
    os.makedirs(osp.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint16)).save(path)


def _pfm(path, arr=None):
    os.makedirs(osp.dirname(path), exist_ok=True)
    if arr is None:
        arr = np.linspace(1.0, 40.0, H * W, dtype=np.float32).reshape(H, W)
    write_pfm(path, arr)


def _check_sample(ds, index=0, sparse=None):
    """__getitem__ contract: float32 HxWx3 images, HxW disp, bool valid."""
    s = ds[index]
    assert s["img1"].shape == (H, W, 3) and s["img1"].dtype == np.float32
    assert s["img2"].shape == (H, W, 3)
    assert s["disp"].shape == (H, W) and s["disp"].dtype == np.float32
    assert s["valid"].shape == (H, W) and s["valid"].dtype == np.bool_
    assert np.isfinite(s["disp"][s["valid"]]).all()
    return s


class TestSceneFlow:
    def _build(self, root):
        sf = osp.join(root, "SceneFlow")
        for split, scene in [("TRAIN", "A/0000"), ("TEST", "B/0001")]:
            for side in ("left", "right"):
                _rgb(osp.join(sf, "FlyingThings3D/frames_finalpass",
                              split, scene, side, "0006.png"))
            _pfm(osp.join(sf, "FlyingThings3D/disparity",
                          split, scene, "left", "0006.pfm"))
        for side in ("left", "right"):
            _rgb(osp.join(sf, "Monkaa/frames_finalpass/scene_x",
                          side, "0048.png"))
            _rgb(osp.join(sf, "Driving/frames_finalpass/35mm_focallength",
                          "scene_forwards/fast", side, "0401.png"))
        _pfm(osp.join(sf, "Monkaa/disparity/scene_x/left/0048.pfm"))
        _pfm(osp.join(sf, "Driving/disparity/35mm_focallength",
                      "scene_forwards/fast/left/0401.pfm"))
        return sf

    def test_train_split(self, tmp_path):
        sf = self._build(str(tmp_path))
        ds = D.SceneFlowDatasets(root=sf)  # things TRAIN + monkaa + driving
        assert len(ds) == 3
        for (i1, i2), dp in zip(ds.image_list, ds.disparity_list):
            assert osp.exists(i1) and osp.exists(i2) and osp.exists(dp)
            assert "/left/" in i1 and "/right/" in i2
            assert "/disparity/" in dp and dp.endswith(".pfm")
        _check_sample(ds)

    def test_things_test_split(self, tmp_path):
        sf = self._build(str(tmp_path))
        ds = D.SceneFlowDatasets(root=sf, things_test=True)
        assert len(ds) == 1 and "/TEST/" in ds.image_list[0][0]
        _check_sample(ds)


class TestCarla:
    def test_layout(self, tmp_path):
        root = str(tmp_path / "Carla")
        ep = osp.join(root, "episode_0000/generated")
        for i in range(2):
            _rgb(osp.join(ep, "images_rgb", f"00000{i}_0.png"))
            _rgb(osp.join(ep, "images_rgb", f"00000{i}_1.png"))
            # depth encoding: (B*65536 + G*256 + R)/16777215 * 1000 m, read
            # as BGR (frame_io.read_disp_carla); B=10 -> ~39 m, in range
            arr = np.zeros((H, W, 3), np.uint8)
            arr[..., 2] = 10  # PIL writes RGB; blue channel = high byte
            os.makedirs(osp.join(ep, "images_depth"), exist_ok=True)
            Image.fromarray(arr).save(
                osp.join(ep, "images_depth", f"00000{i}_20.png"))
        ds = D.Carla(root=root)
        assert len(ds) == 2
        for (i1, i2), dp in zip(ds.image_list, ds.disparity_list):
            assert i1.endswith("_0.png") and i2.endswith("_1.png")
            assert dp.endswith("_20.png")
        s = _check_sample(ds)
        assert s["valid"].all() and (s["disp"] > 0).all()


class TestETH3D:
    def test_layout(self, tmp_path):
        root = str(tmp_path / "ETH3D")
        for scene in ("delivery_area_1l", "playground_1l"):
            _rgb(osp.join(root, "two_view_training", scene, "im0.png"))
            _rgb(osp.join(root, "two_view_training", scene, "im1.png"))
            _pfm(osp.join(root, "two_view_training_gt", scene, "disp0GT.pfm"))
        ds = D.ETH3D(root=root, split="training")
        assert len(ds) == 2 and ds.sparse
        for (i1, i2), dp in zip(ds.image_list, ds.disparity_list):
            scene = i1.split(os.sep)[-2]
            assert dp.split(os.sep)[-2] == scene
        _check_sample(ds)


class TestSintelStereo:
    def test_layout(self, tmp_path):
        root = str(tmp_path / "SintelStereo")
        # R < 64 so the uint8 R*4 term cannot wrap (reference
        # frame_utils.py:187-193 does uint8 arithmetic on the R plane)
        disp_rgb = np.zeros((H, W, 3), np.uint8)
        disp_rgb[..., 0] = 5  # disp = 20 px
        for render in ("clean", "final"):
            for scene in ("alley_1",):
                _rgb(osp.join(root, "training", f"{render}_left",
                              scene, "frame_0001.png"))
                _rgb(osp.join(root, "training", f"{render}_right",
                              scene, "frame_0001.png"))
        os.makedirs(osp.join(root, "training/disparities/alley_1"),
                    exist_ok=True)
        Image.fromarray(disp_rgb).save(
            osp.join(root, "training/disparities/alley_1/frame_0001.png"))
        occ = np.zeros((H, W), np.uint8)
        occ[:4] = 255  # occluded strip
        os.makedirs(osp.join(root, "training/occlusions/alley_1"),
                    exist_ok=True)
        Image.fromarray(occ).save(
            osp.join(root, "training/occlusions/alley_1/frame_0001.png"))

        ds = D.SintelStereo(root=root)
        # clean + final pass both pair against the same disparity list (*2)
        assert len(ds) == 2 and ds.sparse
        s = _check_sample(ds)
        assert not s["valid"][:4].any() and s["valid"][4:].all()
        np.testing.assert_allclose(s["disp"][s["valid"]], 20.0)


class TestFallingThings:
    def test_layout(self, tmp_path):
        root = str(tmp_path / "FallingThings")
        scene = "mixed/kitchen_0"
        names = ["000000.left.jpg", "000001.left.jpg"]
        for n in names:
            _rgb(osp.join(root, scene, n))
            _rgb(osp.join(root, scene, n.replace("left.jpg", "right.jpg")))
            _gray16(osp.join(root, scene,
                             n.replace("left.jpg", "left.depth.png")),
                    np.full((H, W), 3000, np.uint16))
        with open(osp.join(root, scene, "_camera_settings.json"), "w") as f:
            json.dump({"camera_settings":
                       [{"intrinsic_settings": {"fx": 768.0}}]}, f)
        with open(osp.join(root, "filenames.txt"), "w") as f:
            f.write("\n".join(osp.join(scene, n) for n in names))

        ds = D.FallingThings(root=root)
        assert len(ds) == 2
        s = _check_sample(ds)
        # disp = fx * 6 * 100 / depth_png = 768*600/3000
        np.testing.assert_allclose(s["disp"][s["valid"]], 153.6, rtol=1e-5)


class TestTartanAir:
    def test_layout_and_filters(self, tmp_path):
        root = str(tmp_path)
        entries = [
            "abandonedfactory/Easy/P000/image_left/000000_left.png",
            "seasonsforest_winter/Easy/P001/image_left/000000_left.png",
        ]
        for e in entries:
            _rgb(osp.join(root, e))
            _rgb(osp.join(root, e.replace("_left", "_right")))
            depth = osp.join(root, e.replace("image_left", "depth_left")
                             .replace("left.png", "left_depth.npy"))
            os.makedirs(osp.dirname(depth), exist_ok=True)
            np.save(depth, np.full((H, W), 8.0, np.float32))
        with open(osp.join(root, "tartanair_filenames.txt"), "w") as f:
            f.write("\n".join(entries))

        ds = D.TartanAir(root=root)
        # seasonsforest_winter/Easy is excluded (reference datasets.py:248)
        assert len(ds) == 1
        assert "abandonedfactory" in ds.image_list[0][0]
        assert "image_right" in ds.image_list[0][1]
        assert ds.disparity_list[0].endswith("_left_depth.npy")
        s = _check_sample(ds)
        np.testing.assert_allclose(s["disp"][s["valid"]], 10.0)  # 80/8

        assert len(D.TartanAir(root=root, keywords=("nomatch",))) == 0


class TestKITTI:
    def _build(self, root):
        for year, imdirs, dispdir in [
                ("KITTI_2012", ("colored_0", "colored_1"), "disp_occ"),
                ("KITTI_2015", ("image_2", "image_3"), "disp_occ_0")]:
            for split in ("training", "testing"):
                for d in imdirs:
                    _rgb(osp.join(root, year, split, d, "000000_10.png"))
            _gray16(osp.join(root, year, "training", dispdir,
                             "000000_10.png"),
                    np.full((H, W), 20 * 256, np.uint16))

    def test_training_list(self, tmp_path):
        root = str(tmp_path / "KITTI")
        self._build(root)
        fdir = str(tmp_path / "filenames")
        os.makedirs(fdir)
        lines = [
            "colored_0/000000_10.png colored_1/000000_10.png "
            "disp_occ/000000_10.png",
            "image_2/000000_10.png image_3/000000_10.png "
            "disp_occ_0/000000_10.png",
        ]
        # reference lists carry a leading split dir; routing keys on the
        # second path component (load_path: line[0].split('/')[1])
        lines = [" ".join("training/" + p for p in l.split()) for l in lines]
        with open(osp.join(fdir, "KITTI_mix.txt"), "w") as f:
            f.write("\n".join(lines))

        ds = D.KITTI(root=root, image_set="kitti_mix", filenames_dir=fdir)
        assert len(ds) == 2 and ds.sparse
        assert "KITTI_2012" in ds.image_list[0][0]
        assert "KITTI_2015" in ds.image_list[1][0]
        for (i1, i2), dp in zip(ds.image_list, ds.disparity_list):
            assert osp.exists(i1) and osp.exists(i2) and osp.exists(dp)
        s = _check_sample(ds)
        np.testing.assert_allclose(s["disp"][s["valid"]], 20.0)

    @pytest.mark.parametrize("image_set,subdir",
                             [("kitti_2012", "colored_0"),
                              ("kitti_2015", "image_2")])
    def test_testing_split(self, tmp_path, image_set, subdir):
        root = str(tmp_path / "KITTI")
        self._build(root)
        ds = D.KITTI(root=root, split="testing", image_set=image_set)
        assert len(ds) == 1 and ds.is_test
        assert subdir in ds.image_list[0][0]
        s = ds[0]
        assert s["img1"].shape == (H, W, 3) and s["meta"] == "000000_10.png"

    def test_shipped_manifests_route(self):
        """The byte-identical filename manifests shipped in filenames/
        parse and route 2012-vs-2015 correctly (no files needed —
        enumeration never stats the disk)."""
        fdir = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                        "filenames")
        for image_set, n_expected in [("kitti_mix", 394),
                                      ("kitti_2015_train", 160)]:
            ds = D.KITTI(root="datasets/KITTI", image_set=image_set,
                         filenames_dir=fdir)
            assert len(ds) == n_expected, (image_set, len(ds))
            for (i1, _), dp in zip(ds.image_list, ds.disparity_list):
                year = "KITTI_2015" if "image_2" in i1 else "KITTI_2012"
                assert year in i1 and year in dp


class TestMiddlebury:
    def test_2014_split(self, tmp_path):
        root = str(tmp_path / "Middlebury")
        for scene in ("Adirondack-perfect",):
            base = osp.join(root, "2014", scene)
            _rgb(osp.join(base, "im0.png"))
            for s in ("", "E", "L"):
                _rgb(osp.join(base, f"im1{s}.png"))
            _pfm(osp.join(base, "disp0.pfm"))
        ds = D.Middlebury(root=root, split="2014")
        assert len(ds) == 3  # exposures E / L / default
        suffixes = sorted(osp.basename(i2) for _, i2 in ds.image_list)
        assert suffixes == ["im1.png", "im1E.png", "im1L.png"]
        _check_sample(ds)

    def test_eval3_split(self, tmp_path):
        root = str(tmp_path / "Middlebury")
        scenes = ("Jadeplant", "Motorcycle")
        for scene in scenes + ("NotOfficial",):
            base = osp.join(root, "MiddEval3/trainingF", scene)
            _rgb(osp.join(base, "im0.png"))
            _rgb(osp.join(base, "im1.png"))
            _pfm(osp.join(base, "disp0GT.pfm"))
            occ = np.full((H, W), 255, np.uint8)
            Image.fromarray(occ).save(osp.join(base, "mask0nocc.png"))
        with open(osp.join(root, "MiddEval3/official_train.txt"), "w") as f:
            f.write("\n".join(scenes))
        ds = D.Middlebury(root=root, split="F")
        assert len(ds) == 2  # NotOfficial filtered out
        assert all(any(s in i1 for s in scenes) for i1, _ in ds.image_list)
        _check_sample(ds)


class TestBuilders:
    def test_build_val_dataset_routing(self, tmp_path):
        from nmrf_tpu.config import get_cfg

        sf = TestSceneFlow()._build(str(tmp_path))
        cfg = get_cfg()
        cfg.DATASETS.ROOT = str(tmp_path)
        ds = D.build_val_dataset(cfg, "things")
        assert len(ds) == 1 and "/TEST/" in ds.image_list[0][0]

    def test_build_train_dataset_concat(self, tmp_path):
        from nmrf_tpu.config import get_cfg

        TestSceneFlow()._build(str(tmp_path))
        cfg = get_cfg()
        cfg.DATASETS.ROOT = str(tmp_path)
        cfg.DATASETS.TRAIN = ("sceneflow", "synthetic_2x64x96")
        cfg.DATASETS.CROP_SIZE = (H, W)
        ds = D.build_train_dataset(cfg)
        assert len(ds) == 3 + 2  # sceneflow fixture + synthetic
