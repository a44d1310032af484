#!/usr/bin/env python
"""How much correspondence signal does the cost volume carry at RANDOM init?

Convergence-gate diagnosis (r4): the gate plateaus at holdout EPE ~15 while
the DPN 'init' classification loss sticks WORSE than uniform — the modal
head isn't learning the matching within the gate's step budget.  This probe
separates task difficulty from optimization speed: with an UNTRAINED
(random kaiming) backbone, how accurate is the raw group-correlation
argmax over disparity bins vs ground truth?

  * 8-aligned disparities (multiples of 8 px = integer 1/8-res bins): the
    right patch at the true shift is the SAME dots, so correlation of any
    deterministic feature map peaks at the true bin -> high accuracy
    expected with zero training.
  * unaligned disparities (the gate's default task): the true shift falls
    between bins; feature pooling over 8x8 blocks sees different dot
    samplings -> whatever accuracy remains must be LEARNED.

Usage: JAX_PLATFORMS=cpu python tools/probe_costvolume_signal.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def aligned_pair(H, W, max_disp, rng):
    """Random-dot pair whose disparities are multiples of 8 (bin-exact)."""
    from nmrf_tpu.data.synthetic import make_stereo_pair

    i1, i2, d, v = make_stereo_pair(H, W, max_disp=max_disp, rng=rng)
    # re-warp with quantized disparity
    dq = np.maximum(np.round(d / 8.0), 1.0) * 8.0
    xs = np.arange(W)
    di = dq.astype(np.int64)
    i1q = i2[np.arange(H)[:, None], np.clip(xs[None, :] - di, 0, W - 1), :]
    vq = (xs[None, :] - di) >= 0
    return i1q, i2, dq.astype(np.float32), vq


def main():
    from nmrf_tpu.utils.runtime import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp

    from nmrf_tpu.data.synthetic import make_stereo_pair
    from nmrf_tpu.models import build_model
    from nmrf_tpu.config import get_cfg
    from nmrf_tpu.ops.correlation import correlation_volume

    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.freeze()
    model, _ = build_model(cfg)
    H, W = 192, 384
    rngk = jax.random.PRNGKey(0)
    img0 = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = jax.jit(lambda r: model.init(r, img0, img0, train=False))(rngk)

    def cost_argmax(params, img1, img2):
        def fwd(p, a, b):
            f1, f2 = model.apply(p, a, b, method=model.extract_feature)
            cv = correlation_volume(f1[0], f2[0], model.max_disp // 8,
                                    model.cost_group)
            return cv.astype(jnp.float32).sum(3)  # [B, h8, w8, D] over groups

        return jax.jit(fwd)(params, img1, img2)

    for name, gen in [("aligned8", aligned_pair),
                      ("unaligned", make_stereo_pair)]:
        accs, acc1s = [], []
        for s in range(4):
            rng = np.random.RandomState(100 + s)
            if gen is make_stereo_pair:
                i1, i2, d, v = gen(H, W, max_disp=48, rng=rng)
            else:
                i1, i2, d, v = gen(H, W, 48, rng)
            cv = np.asarray(cost_argmax(params, jnp.asarray(i1)[None],
                                        jnp.asarray(i2)[None]))[0]
            # GT bin at 1/8 res (center sample), valid mask likewise
            g8 = d[3::8, 3::8] / 8.0
            v8 = v[3::8, 3::8]
            top1 = cv.argmax(-1)
            err = np.abs(top1 - g8)
            accs.append((err[v8] <= 0.5).mean())   # exact bin
            acc1s.append((err[v8] <= 1.5).mean())  # within 1 bin
        print(f"{name}: raw cost-volume argmax exact-bin acc "
              f"{np.mean(accs):.3f}, within-1-bin {np.mean(acc1s):.3f}")


if __name__ == "__main__":
    main()
