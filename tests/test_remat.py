"""TPU.REMAT: rematerialized NMP layer stacks.

With remat on, every scanned propagation/inference/refinement layer is
re-run in the backward pass instead of keeping its activations — forward
values must be bit-identical and gradients numerically identical (same ops,
re-executed).  Memory shrinkage itself is only observable on a real device;
here we pin the invariants that make the flag safe to flip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmrf_tpu.config import get_cfg
from nmrf_tpu.models import build_model


def _cfg(remat: bool):
    cfg = get_cfg()
    cfg.DPN.MAX_DISP = 64
    cfg.SOLVER.MAX_DISP = 48
    cfg.TPU.REMAT = remat
    cfg.freeze()
    return cfg


@pytest.fixture(scope="module")
def setups():
    rng = np.random.RandomState(7)
    B, H, W = 1, 32, 64
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    disp = jnp.asarray(rng.rand(B, H, W).astype(np.float32) * 40)
    out = {}
    for remat in (False, True):
        model, criterion = build_model(_cfg(remat))
        params = model.init(jax.random.PRNGKey(0), img1, img2, train=False)
        out[remat] = (model, criterion, params)
    return out, (img1, img2, disp)


def test_param_trees_identical(setups):
    out, _ = setups
    p0 = jax.tree_util.tree_leaves(out[False][2])
    p1 = jax.tree_util.tree_leaves(out[True][2])
    assert len(p0) == len(p1)
    for a, b in zip(p0, p1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_bitwise_equal(setups):
    out, (img1, img2, _) = setups
    res = {}
    for remat in (False, True):
        model, _, params = out[remat]
        res[remat] = jax.jit(
            lambda p, a, b, m=model: m.apply(p, a, b, train=False))(
                params, img1, img2)
    for a, b in zip(jax.tree_util.tree_leaves(res[False]),
                    jax.tree_util.tree_leaves(res[True])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_drop_path_uses_dedicated_stream():
    """DropPath draws from the 'drop_path' stream when provided (so spatial
    sharding can keep a sample's stochastic-depth decision identical across
    H-tiles while folding 'dropout' per tile), else falls back to
    'dropout'."""
    from nmrf_tpu.models.layers import DropPath

    m = DropPath(rate=0.5, deterministic=False)
    x = jnp.ones((64, 4))
    k = jax.random.PRNGKey
    base = m.apply({}, x, rngs={"dropout": k(0), "drop_path": k(1)})
    # changing the unused 'dropout' key must not change the draw
    same = m.apply({}, x, rngs={"dropout": k(9), "drop_path": k(1)})
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    # changing 'drop_path' must
    diff = m.apply({}, x, rngs={"dropout": k(0), "drop_path": k(2)})
    assert not np.array_equal(np.asarray(base), np.asarray(diff))
    # fallback path still works without the dedicated stream
    fb = m.apply({}, x, rngs={"dropout": k(3)})
    assert fb.shape == x.shape


def test_grads_match(setups):
    out, (img1, img2, disp) = setups
    valid = jnp.ones_like(disp, dtype=bool)
    grads = {}
    for remat in (False, True):
        model, criterion, params = out[remat]

        def loss_fn(p, m=model, c=criterion):
            o = m.apply(p, img1, img2, train=True)
            return c(o, {"disp": disp, "valid": valid})["total"]

        grads[remat] = jax.jit(jax.grad(loss_fn))(params)
    flat0 = jax.tree_util.tree_leaves(grads[False])
    flat1 = jax.tree_util.tree_leaves(grads[True])
    assert flat0 and len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
