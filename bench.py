#!/usr/bin/env python
"""Benchmark: KITTI-resolution stereo inference on one chip.

Baseline: the reference reports 90 ms/frame at 1242x375 on an RTX 3090
(BASELINE.md).  We measure steady-state device latency of the full NMRF
forward (resnet backbone, default config) at the same logical resolution,
padded to divisibility like the reference's InputPadder ('proposal' mode).

Measurement notes (this environment): the device sits behind a relay with
~30 ms per-call RTT, async dispatch does not serialize executions, and
``block_until_ready`` is unreliable — so frames are CHAINED (each forward
consumes a token derived from the previous output, forcing sequential device
execution) and a single host readback closes the pipeline.  Per-frame time =
total / K, excluding relay round-trips.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_MS = 90.0


def main():
    from nmrf_tpu.utils.runtime import backend_init_watchdog, configure_jax

    configure_jax()
    # fail fast if the axon tunnel is down (nothing on stdout so a partial
    # metric line is never recorded)
    backend_init_watchdog()
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.config import get_cfg
    from nmrf_tpu.data.frame_io import InputPadder
    from nmrf_tpu.models import build_model

    argv = sys.argv[1:]
    profile_dir = None
    if "--profile-dir" in argv:
        i = argv.index("--profile-dir")
        profile_dir = argv[i + 1]
        del argv[i:i + 2]
    repeat = 1
    if "--repeat" in argv:
        # time the K-frame chain N times and report mean/min/max spread on
        # stderr (the stdout JSON line stays the driver contract: mean value)
        i = argv.index("--repeat")
        repeat = int(argv[i + 1])
        del argv[i:i + 2]
    config_file = None
    if "--config-file" in argv:
        # bench an alternate variant, e.g. configs/sceneflow_swint.yaml
        # (the reference's flagship leaderboard model)
        i = argv.index("--config-file")
        config_file = argv[i + 1]
        del argv[i:i + 2]

    cfg = get_cfg()
    if config_file:
        cfg.merge_from_file(config_file)
    # bf16 is the TPU deployment dtype for the hot path (norms/softmax/
    # disparity arithmetic stay f32; parity deltas validated in tests);
    # override with `TPU.COMPUTE_DTYPE float32` for the f32 number.
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    # tanh-GELU inside bf16 compute only: <~1e-3 relative vs erf — far
    # inside bf16 rounding (the erf lowering is transcendental-heavy on the
    # VPU).  Part of the combined 65.79 -> 63.45 swin win together with the
    # positional-logits rework (34c603c, repeat-6 artifact means,
    # 2026-08-20); its isolated contribution was not re-measured.
    # `TPU.GELU_APPROX False` restores exact erf.
    cfg.TPU.GELU_APPROX = True
    cfg.merge_from_list(argv)
    cfg.freeze()

    model, _ = build_model(cfg)

    H, W = 375, 1242  # KITTI 2015
    padder = InputPadder((H, W), mode="proposal", divis_by=cfg.DATASETS.DIVIS_BY)
    rng = np.random.RandomState(0)
    img1 = np.asarray(padder.pad((rng.rand(H, W, 3) * 255).astype(np.float32))[0])
    img2 = np.asarray(padder.pad((rng.rand(H, W, 3) * 255).astype(np.float32))[0])
    img1 = jnp.asarray(img1[None])
    img2 = jnp.asarray(img2[None])

    params = jax.jit(lambda r: model.init(r, img1, img2, train=False))(
        jax.random.PRNGKey(0))

    K = 16

    @jax.jit
    def chained(p, a, b):
        def body(tok, _):
            disp = model.apply(p, a + tok, b, train=False)["disp"]
            # data dependency: next frame consumes a zero token derived from
            # this frame's output, forcing sequential execution
            return disp.mean() * 0.0, ()

        tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return tok

    # deployed-program roofline inputs (stderr; folded into FLOPS.json):
    # XLA's own flops/bytes of the compiled K-frame chain, per frame.
    # Bytes = fusion-boundary traffic, the HBM proxy (VERDICT r4 weak #3:
    # report MBU next to MFU so "layout/latency-bound" is a number).
    try:
        ca = chained.lower(params, img1, img2).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        # cost analysis counts the scan BODY once (trip count not
        # multiplied), so these are already per-frame (validated: the
        # chain's flop count matches the flat single-forward lowering)
        print(f"bench.py: deployed per-frame flops "
              f"{ca['flops'] / 1e9:.2f} GFLOP, hbm bytes "
              f"{ca['bytes accessed'] / 1e9:.3f} GB", file=sys.stderr,
              flush=True)
    except Exception as e:  # best-effort per backend
        print(f"bench.py: cost_analysis unavailable: {e}", file=sys.stderr)
    # warmup/compile (host readback closes the pipeline)
    float(chained(params, img1, img2))
    if profile_dir:
        # jax.profiler device trace (TensorBoard-compatible; summarize with
        # tools/profile_model.py:summarize_trace)
        jax.profiler.start_trace(profile_dir)
    samples = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        float(chained(params, img1, img2))
        samples.append((time.perf_counter() - t0) / K * 1000.0)
    ms = float(np.mean(samples))
    if profile_dir:
        jax.profiler.stop_trace()
    if repeat > 1:
        print(f"bench.py: {repeat} chains of {K}: mean {ms:.3f} ms  "
              f"min {min(samples):.3f}  max {max(samples):.3f}  "
              f"samples {[round(s, 3) for s in samples]}",
              file=sys.stderr, flush=True)

    variant = ""
    if config_file:
        import os
        variant = "_" + os.path.splitext(os.path.basename(config_file))[0]
    print(json.dumps({
        "metric": "kitti_1242x375_latency" + variant,
        "value": round(ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(BASELINE_MS / ms, 3),  # >1 means faster than 3090
    }))


if __name__ == "__main__":
    main()
