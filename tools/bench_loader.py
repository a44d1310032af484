#!/usr/bin/env python
"""Host data-pipeline throughput: threaded vs process-pool decode.

PIL decode + the numpy augmentors hold the GIL, so the threaded loader
caps near 1 core; DATALOADER.USE_PROCESSES trades pickling overhead for
real parallelism.  This measures both on the synthetic dataset (pure
numpy sample generation — a LOWER bound on the process-pool win, since
real PFM/PNG decode is heavier per byte).

No jax involved.  Usage:
    python tools/bench_loader.py [--size 64] [--batch 8] [--workers 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nmrf_tpu.data.loader import PrefetchLoader, ShardedBatchSampler
from nmrf_tpu.data.synthetic import SyntheticStereoDataset


class _AugmentedSynthetic:
    """Synthetic samples through the real training augmentor (PIL
    ColorJitter/gamma + numpy spatial transforms) — the actual per-sample
    host work during training, minus file IO."""

    def __init__(self, base, crop):
        from nmrf_tpu.data.transforms import FlowAugmentor
        self.base = base
        self.aug = FlowAugmentor(crop_size=crop)

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        import numpy as np
        s = self.base[i]
        flow = np.stack([s["disp"], np.zeros_like(s["disp"])], axis=-1)
        img1, img2, flow = self.aug(
            s["img1"].astype(np.uint8), s["img2"].astype(np.uint8), flow)
        disp = flow[..., 0].astype(np.float32)
        return {"img1": img1.astype(np.float32),
                "img2": img2.astype(np.float32),
                "disp": disp, "valid": disp < 512}


def run(ds, sampler, workers, use_processes, label):
    loader = PrefetchLoader(ds, sampler, num_workers=workers,
                            use_processes=use_processes)
    try:
        it = iter(loader)
        next(it)  # warm up (spawn workers, fill caches)
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            n += batch["img1"].shape[0]
        dt = time.perf_counter() - t0
        print(f"{label:>10}: {n / dt:8.1f} samples/s "
              f"({dt / max(n, 1) * 1e3:.1f} ms/sample)")
        return n / dt
    finally:
        loader.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--no-aug", action="store_true",
                    help="raw synthetic generation only (numpy-bound)")
    args = ap.parse_args()

    ds = SyntheticStereoDataset(size=args.size, height=args.height,
                                width=args.width)
    if not args.no_aug:
        ds = _AugmentedSynthetic(
            ds, (args.height // 2, args.width // 2))
    sampler = ShardedBatchSampler(len(ds), args.batch, seed=0)
    print(f"{args.size} samples @ {args.height}x{args.width}"
          f"{' +augmentor' if not args.no_aug else ''}, "
          f"batch {args.batch}, {args.workers} workers, "
          f"{os.cpu_count()} cores")
    t = run(ds, sampler, args.workers, False, "threads")
    p = run(ds, sampler, args.workers, True, "processes")
    print(f"process/thread speedup: {p / t:.2f}x")


if __name__ == "__main__":
    main()
