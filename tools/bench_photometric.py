#!/usr/bin/env python
"""PIL vs native C++ photometric chain, ms/sample at training crop size.

The chain is the per-sample color_transform hot path of both augmentors
(ColorJitter 4-op shuffle + AdjustGamma, usually over the 2HxW stacked
pair).  No jax involved.  Usage: python tools/bench_photometric.py
"""

import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from PIL import Image
    from nmrf_tpu.data import transforms as T
    from nmrf_tpu import native

    rng = np.random.RandomState(0)
    # stacked pair at the sceneflow crop (2*256 x 512)
    arr = rng.randint(0, 256, (512, 512, 3), dtype=np.uint8)
    jit = T.ColorJitter(0.4, 0.4, (0.6, 1.4), 0.5 / 3.14)
    gam = T.AdjustGamma(0.8, 1.2)

    def pil_once(i):
        random.seed(i)
        order, b, c, s, h = jit.sample_params()
        gain, gamma = gam.sample_params()
        return np.array(T._adjust_gamma(
            jit.apply(Image.fromarray(arr), order, b, c, s, h), gamma, gain))

    def native_once(i):
        random.seed(i)
        return T.fused_photometric(arr, jit, gam)

    assert native.load() is not None, "native toolchain unavailable"
    for name, fn in (("pil", pil_once), ("native", native_once)):
        fn(0)  # warm (JIT the .so build / PIL imports)
        t0 = time.perf_counter()
        n = 50
        for i in range(n):
            fn(i)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{name}: {ms:.2f} ms/sample")


if __name__ == "__main__":
    main()
