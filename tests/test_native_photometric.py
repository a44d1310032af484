"""Parity of the native (C++) fused photometric kernel vs the PIL path.

The PIL chain in nmrf_tpu/data/transforms.py is the golden (it itself is
the parity port of torchvision ColorJitter + the reference's AdjustGamma,
reference nmrf/data/transforms.py:31-155).  Contracts proven here:

  * brightness / contrast / saturation / gamma: bit-exact vs ImageEnhance
    (PIL blend truncation, rounded-mean contrast constant, LUT gamma).
  * RGB->HSV: S/V bit-exact, H within +-1 wrap-aware (PIL convert.c's
    float op ordering is not exactly recoverable; validated over 2^24
    enumeration during development — here a dense random sample).
  * HSV->RGB: within +-1 (2 of 2^24 inputs differ by 1 in enumeration).
  * fused pipeline: identical stdlib-random consumption as the PIL path,
    deterministic, and pixelwise close (hue quantization jitter only).

No jax involved; skips wholesale when no C++ toolchain is available.
"""

import ctypes
import random

import numpy as np
import pytest
from PIL import Image, ImageEnhance

from nmrf_tpu import native
from nmrf_tpu.data import transforms as T

lib = native.load()
pytestmark = pytest.mark.skipif(lib is None, reason="no native toolchain")

U8P = ctypes.POINTER(ctypes.c_uint8)
I32P = ctypes.POINTER(ctypes.c_int32)


def _run_native(arr, codes, b=1.0, c=1.0, s=1.0, hue_shift=0, lut=None):
    out = np.ascontiguousarray(arr, dtype=np.uint8).copy()
    codes = np.asarray(codes, dtype=np.int32)
    if lut is None:
        lut = np.arange(256, dtype=np.uint8)
        has = 0
    else:
        has = 1
    lib.nmrf_photometric(out.ctypes.data_as(U8P), out.size // 3,
                         codes.ctypes.data_as(I32P), len(codes),
                         b, c, s, hue_shift, lut.ctypes.data_as(U8P), has)
    return out


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(7)
    return rng.randint(0, 256, (64, 96, 3), dtype=np.uint8)


@pytest.mark.parametrize("factor", [0.0, 0.37, 0.73, 1.0, 1.42, 2.5])
def test_brightness_exact(img, factor):
    ref = np.asarray(ImageEnhance.Brightness(Image.fromarray(img)).enhance(factor))
    np.testing.assert_array_equal(_run_native(img, [0], b=factor), ref)


@pytest.mark.parametrize("factor", [0.0, 0.61, 1.0, 1.39])
def test_contrast_exact(img, factor):
    ref = np.asarray(ImageEnhance.Contrast(Image.fromarray(img)).enhance(factor))
    np.testing.assert_array_equal(_run_native(img, [1], c=factor), ref)


@pytest.mark.parametrize("factor", [0.0, 0.6, 1.0, 1.4])
def test_saturation_exact(img, factor):
    ref = np.asarray(ImageEnhance.Color(Image.fromarray(img)).enhance(factor))
    np.testing.assert_array_equal(_run_native(img, [2], s=factor), ref)


def test_gamma_exact(img):
    gamma, gain = 1.73, 1.1
    ref = np.asarray(T._adjust_gamma(Image.fromarray(img), gamma, gain))
    out = _run_native(img, [], lut=T._gamma_lut(gamma, gain))
    np.testing.assert_array_equal(out, ref)


def test_rgb2hsv_close():
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 256, (512, 512, 3), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(rgb).convert("HSV")).astype(np.int32)
    out = np.empty_like(rgb)
    lib.nmrf_rgb2hsv(np.ascontiguousarray(rgb).ctypes.data_as(U8P),
                     out.ctypes.data_as(U8P), rgb.size // 3)
    out = out.astype(np.int32)
    np.testing.assert_array_equal(out[..., 1:], ref[..., 1:])  # S, V exact
    dh = np.abs(out[..., 0] - ref[..., 0])
    assert np.minimum(dh, 256 - dh).max() <= 1
    assert (dh > 0).mean() < 0.01


def test_hsv2rgb_close():
    rng = np.random.RandomState(1)
    hsv = rng.randint(0, 256, (512, 512, 3), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(hsv, "HSV").convert("RGB")).astype(np.int32)
    out = np.empty_like(hsv)
    lib.nmrf_hsv2rgb(np.ascontiguousarray(hsv).ctypes.data_as(U8P),
                     out.ctypes.data_as(U8P), hsv.size // 3)
    assert np.abs(out.astype(np.int32) - ref).max() <= 1


def test_hue_roundtrip_close(img):
    for hue_factor in (-0.15, 0.09, 0.159):
        ref = np.asarray(T._adjust_hue(Image.fromarray(img), hue_factor))
        out = _run_native(img, [3], hue_shift=int(round(hue_factor * 255)))
        # only quantization jitter from PIL's +-1 H step
        assert np.abs(out.astype(np.int32) - ref.astype(np.int32)).max() <= 8
        assert (out != ref).mean() < 0.02


def test_fused_pipeline_matches_pil(img):
    jit = T.ColorJitter(brightness=0.4, contrast=0.4,
                        saturation=(0.6, 1.4), hue=0.5 / 3.14)
    gam = T.AdjustGamma(0.8, 1.2, 1.0, 1.02)
    for seed in range(8):
        random.seed(seed)
        out = T.fused_photometric(img, jit, gam)
        random.seed(seed)
        order, b, c, s, h = jit.sample_params()
        gain, gamma = gam.sample_params()
        ref = np.array(T._adjust_gamma(
            jit.apply(Image.fromarray(img), order, b, c, s, h), gamma, gain))
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        # hue's +-1 H quantization can be amplified by later contrast /
        # brightness stages; everything else is bit-exact
        assert diff.max() <= 12, (seed, order, diff.max())
        assert (diff > 0).mean() < 0.05


def test_fused_pipeline_rng_stream_and_determinism(img):
    jit = T.ColorJitter(0.4, 0.4, (0.6, 1.4), 0.1)
    gam = T.AdjustGamma(0.9, 1.1)
    random.seed(3)
    a = T.fused_photometric(img, jit, gam)
    tail_native = random.random()
    random.seed(3)
    b = T.fused_photometric(img, jit, gam)
    assert np.array_equal(a, b)
    # same stream consumption as the PIL fallback path
    random.seed(3)
    jit.sample_params()
    gam.sample_params()
    assert random.random() == tail_native


def test_fused_does_not_mutate_input(img):
    before = img.copy()
    random.seed(0)
    T.fused_photometric(img, T.ColorJitter(0.3, 0.3, (0.7, 1.3), 0.1),
                        T.AdjustGamma(1, 1))
    np.testing.assert_array_equal(img, before)
