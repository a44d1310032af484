#!/usr/bin/env python
"""On-chip autotune of the window-native attention column block (WB).

``choose_column_block`` caps WB*T at a fixed target (512) picked when the
kernel landed; this sweeps every divisor WB of the window-column count at
the production shapes (inference ws=6 N=2 and refinement ws=4 N=1 at
KITTI 1/8 and 1/4 resolutions) and prints per-WB steady-state latency.
Run on the real chip (needs the Mosaic compiler); chained-readback
methodology from nmrf_tpu.utils.benchmarks.

Usage:  python tools/autotune_attention.py [--iters 20] [--dtype bfloat16]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes for a CPU interpret-mode smoke run")
    args = ap.parse_args()

    from nmrf_tpu.utils.runtime import backend_init_watchdog, configure_jax
    configure_jax()
    backend_init_watchdog()
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.ops.pallas.attention import (
        window_attention_native, window_meta)
    from nmrf_tpu.utils.benchmarks import chained_ms

    dtype = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    # KITTI padded 1248x384: 1/8 grid 48x156 (inference, ws 6, N 2),
    # 1/4 grid 96x312 (refinement, ws 4, N 1)
    cases = [
        ("inference", 48, 156, 6, 2, 4, 32, True),
        ("refinement", 96, 312, 4, 1, 4, 32, False),
    ]
    if args.tiny:
        cases = [("inference", 12, 24, 6, 2, 2, 8, True),
                 ("refinement", 8, 16, 4, 1, 2, 8, False)]
    results = {}
    for name, Hg, Wg, ws, N, h, hd, cand in cases:
        C = h * hd
        P = ws * ws
        T = P * N
        nww = Wg // ws
        qkv = jnp.asarray(rng.randn(1, Hg, Wg, N, 3 * C), dtype)
        scale = hd ** -0.5
        divisors = [d for d in range(1, nww + 1) if nww % d == 0]
        results[name] = {}
        for WB in divisors:
            if WB * T > 4096:  # far past any plausible VMEM fit
                continue
            meta, _ = window_meta(ws, ws, WB, N)
            R = len(meta[:, 0])
            nwh, nwwB = Hg // ws, Wg // (WB * ws)
            qr = jnp.asarray(rng.randn(1, nwh, nwwB, h, R, P), dtype) * 0.1
            kr = jnp.asarray(rng.randn(1, nwh, nwwB, h, R, P), dtype) * 0.1
            ve = jnp.asarray(rng.randn(h, R, P * hd), dtype) * 0.1
            try:
                ms = chained_ms(
                    lambda x, qr=qr, kr=kr, ve=ve, WB=WB: (
                        window_attention_native(
                            x, qr, kr, ve, 0, scale, ws, ws, WB, h, cand)),
                    qkv, iters=args.iters)
            except Exception as e:
                print(f"{name} WB={WB:3d} (R={WB*T:5d}): FAIL "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            results[name][WB] = ms
            print(f"{name} WB={WB:3d} (R={WB*T:5d}): {ms:7.3f} ms",
                  flush=True)
        if results[name]:
            best = min(results[name], key=results[name].get)
            print(f"{name}: best WB={best} @ {results[name][best]:.3f} ms "
                  f"(current heuristic target 512 -> WB="
                  f"{max(d for d in divisors if d * T <= 512)})", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
