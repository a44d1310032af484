#!/usr/bin/env python
"""Dump the compiled TPU HLO of the full forward and print the body of the
named fusions (default: the profiled hot ones) — ground truth for what XLA
actually fused, e.g. whether the mlp/fc2 fusion carries the erf-gelu.

Usage: python tools/dump_fusion.py [--config-file CFG] [name-substr ...]
"""
import re
import sys

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from nmrf_tpu.utils.runtime import configure_jax  # noqa: E402

configure_jax()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nmrf_tpu.config import get_cfg  # noqa: E402
from nmrf_tpu.data.frame_io import InputPadder  # noqa: E402
from nmrf_tpu.models import build_model  # noqa: E402


def main():
    argv = sys.argv[1:]
    config_file = None
    if "--config-file" in argv:
        i = argv.index("--config-file")
        config_file = argv[i + 1]
        del argv[i:i + 2]
    names = argv or ["fusion."]

    cfg = get_cfg()
    if config_file:
        cfg.merge_from_file(config_file)
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.freeze()
    model, _ = build_model(cfg)
    H, W = 375, 1242
    padder = InputPadder((H, W), mode="proposal", divis_by=cfg.DATASETS.DIVIS_BY)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(np.asarray(
        padder.pad((rng.rand(H, W, 3) * 255).astype(np.float32))[0])[None])
    img2 = jnp.asarray(np.asarray(
        padder.pad((rng.rand(H, W, 3) * 255).astype(np.float32))[0])[None])
    params = jax.jit(lambda r: model.init(r, img1, img2, train=False))(
        jax.random.PRNGKey(0))
    fn = jax.jit(lambda p, a, b: model.apply(p, a, b, train=False)["disp"])
    txt = fn.lower(params, img1, img2).compile().as_text()
    print(f"HLO: {len(txt.splitlines())} lines", file=sys.stderr)
    # print each requested fusion computation body (the `%fused_computation`
    # a fusion instruction calls, plus the instruction line itself)
    for name in names:
        for m in re.finditer(
                rf'^\s*%?{re.escape(name)}[^\s=]*\s*=.*$', txt, re.M):
            line = m.group(0)
            print("=" * 100)
            print(line[:400])
            cm = re.search(r'calls=%?([\w.\-]+)', line)
            if cm:
                body = re.search(
                    rf'^%?{re.escape(cm.group(1))}\s*\([^)]*\).*?^}}',
                    txt, re.M | re.S)
                if body:
                    print(body.group(0)[:4000])


if __name__ == "__main__":
    main()
