#!/usr/bin/env python
"""Capture a ``jax.profiler`` device trace of the NMRF forward and print the
top HLO ops by device time (SURVEY.md §5 tracing: the TPU equivalent of the
reference's wall-clock decomposition, ``nmrf/utils/evaluation.py`` timers).

The axon relay forwards device-side op events (verified: per-fusion timings
arrive in the ``.trace.json.gz``), so this works both on the real chip and
on CPU.  The trace directory is TensorBoard-compatible
(``tensorboard --logdir <dir>``); this script additionally parses the trace
inline so no viewer is needed.

Usage:
    python tools/profile_model.py [--out DIR] [--top K] [CFG OVERRIDES...]
"""

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_trace(trace_dir, top=40):
    """Parse the newest trace.json.gz under ``trace_dir``; return rows of
    (total_ms, count, name, source) sorted by device time, plus device total.
    """
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in str(e.get("args", {}).get("name", ""))}
    if not device_pids:  # CPU fallback: any non-host device track
        device_pids = {e["pid"] for e in events
                       if e.get("ph") == "M" and e.get("name") == "process_name"
                       and "device" in str(e.get("args", {}).get("name", ""))}
    dur = collections.Counter()
    cnt = collections.Counter()
    src = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e["name"]
        args = e.get("args", {}) or {}
        d = float(e.get("dur", 0)) / 1000.0
        if name.startswith("jit_"):
            total = max(total, d)
            continue
        # control-flow region events (hlo_category 'while'/'conditional'/
        # 'call') duplicate their children's time; keep HLO leaves only
        if args.get("hlo_category") in ("while", "conditional", "call"):
            continue
        dur[name] += d
        cnt[name] += 1
        meta = args.get("tf_op") or args.get("name") or ""
        if meta and name not in src:
            src[name] = str(meta)
    rows = [(dur[k], cnt[k], k, src.get(k, "")) for k in dur]
    rows.sort(reverse=True)
    return rows[:top], total, sum(dur.values())


def main():
    argv = sys.argv[1:]
    out = "/tmp/nmrf_profile"
    top = 40
    def _take(flag):
        i = argv.index(flag)
        if i + 1 >= len(argv):
            raise SystemExit(f"usage: {flag} <value>")
        v = argv[i + 1]
        del argv[i:i + 2]
        return v

    if "--out" in argv:
        out = _take("--out")
    if "--top" in argv:
        top = int(_take("--top"))

    from nmrf_tpu.utils.runtime import backend_init_watchdog, configure_jax

    configure_jax()
    backend_init_watchdog()
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.config import get_cfg
    from nmrf_tpu.data.frame_io import InputPadder
    from nmrf_tpu.models import build_model

    cfg = get_cfg()
    if "--config-file" in argv:
        i = argv.index("--config-file")
        if i + 1 >= len(argv):
            raise SystemExit("usage: --config-file <path>")
        cfg.merge_from_file(argv[i + 1])
        del argv[i:i + 2]
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.merge_from_list(argv)
    cfg.freeze()
    model, _ = build_model(cfg)

    H, W = 375, 1242
    if os.environ.get("PROFILE_SIZE"):
        H, W = (int(v) for v in os.environ["PROFILE_SIZE"].split("x"))
    padder = InputPadder((H, W), mode="proposal", divis_by=cfg.DATASETS.DIVIS_BY)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(np.asarray(
        padder.pad((rng.rand(H, W, 3) * 255).astype(np.float32))[0])[None])
    img2 = jnp.asarray(np.asarray(
        padder.pad((rng.rand(H, W, 3) * 255).astype(np.float32))[0])[None])

    params = jax.jit(lambda r: model.init(r, img1, img2, train=False))(
        jax.random.PRNGKey(0))

    K = 4

    @jax.jit
    def chained(p, a, b):
        def body(tok, _):
            disp = model.apply(p, a + tok, b, train=False)["disp"]
            return disp.mean() * 0.0, ()

        tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return tok

    float(chained(params, img1, img2))  # compile + warmup
    jax.profiler.start_trace(out)
    float(chained(params, img1, img2))
    jax.profiler.stop_trace()

    rows, module_ms, sum_ms = summarize_trace(out, top)
    print(f"# trace: {out}  (module {module_ms:.2f} ms for {K} frames = "
          f"{module_ms / K:.2f} ms/frame; leaf-op sum {sum_ms:.2f} ms)")
    print(f"{'ms_total':>9}  {'ms/frame':>9} {'n':>5}  op")
    for d, c, name, meta in rows:
        label = f"{name}   [{meta}]" if meta else name
        print(f"{d:9.3f}  {d / K:9.3f} {c:5d}  {label}")


if __name__ == "__main__":
    main()
