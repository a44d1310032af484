#!/usr/bin/env python
"""On-chip probe of the tap-based MSDA kernel at KITTI adaptor shapes.

Compiles ops/pallas/msda.py on the TPU, checks parity against the exact
gather op (bounded offsets), and times both with the chained-readback
methodology.  Usage: python tools/probe_msda_taps.py [RADIUS] [ITERS]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nmrf_tpu.utils.runtime import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.ops.msda import ms_deform_attn, ms_deform_attn_taps

    r = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print("backend:", jax.default_backend(), flush=True)

    Hq, Wq = 96, 320  # 384x1280 / 4
    M, D, P = 8, 8, 4
    rng = np.random.default_rng(0)

    from nmrf_tpu.utils.benchmarks import chained_ms

    def timed(tag, fn, *args):
        dt = chained_ms(fn, *args, iters=iters)
        print(json.dumps({"part": tag, "ms": round(dt, 3)}), flush=True)

    ry, rx = np.meshgrid((np.arange(Hq) + 0.5) / Hq,
                         (np.arange(Wq) + 0.5) / Wq, indexing="ij")
    ref = np.stack([rx.reshape(-1), ry.reshape(-1)], -1)

    for lvl, (Hl, Wl) in enumerate([(96, 320), (48, 160), (24, 80), (12, 40)]):
        B, Lq = 1, Hq * Wq
        value = jnp.asarray(
            rng.standard_normal((B, Hl * Wl, M, D)), jnp.bfloat16)
        offs = np.clip(rng.standard_normal((B, Lq, M, 1, P, 2)) * (r - 1) / 3,
                       -(r - 1), r - 1)
        locs = jnp.asarray(
            (ref[None, :, None, None, None, :]
             + offs / np.array([Wl, Hl], np.float32)).astype(np.float32))
        w = rng.random((B, Lq, M, 1, P)).astype(np.float32)
        w = jnp.asarray(w / w.sum((-2, -1), keepdims=True), jnp.bfloat16)

        exact = jax.jit(lambda v, l, a: ms_deform_attn(
            v, [(Hl, Wl)], l, a))
        taps = jax.jit(lambda v, l, a: ms_deform_attn_taps(
            v, [(Hl, Wl)], l, a, (Hq, Wq), r))
        try:
            got = np.asarray(taps(value, locs, w), np.float32)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL l{lvl}: {type(e).__name__}: {str(e)[:600]}")
            continue
        want = np.asarray(exact(value, locs, w), np.float32)
        err = np.max(np.abs(got - want))
        scale = np.max(np.abs(want)) + 1e-9
        print(f"l{lvl} ({Hl}x{Wl}) max_abs_err={err:.4e} "
              f"rel={err / scale:.2e}", flush=True)
        timed(f"taps_l{lvl}", taps, value, locs, w)
        timed(f"exact_l{lvl}", exact, value, locs, w)


if __name__ == "__main__":
    main()
