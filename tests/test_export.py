"""AOT serving export (utils/export.py): serialize -> deserialize -> call
round-trips must match the live model exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmrf_tpu.config import get_cfg
from nmrf_tpu.models import build_model
from nmrf_tpu.utils.export import export_eval, save_exported, load_exported


@pytest.fixture(scope="module")
def setup():
    cfg = get_cfg()
    cfg.DPN.MAX_DISP = 64
    cfg.SOLVER.MAX_DISP = 48
    cfg.freeze()
    model, _ = build_model(cfg)
    rng = np.random.RandomState(3)
    shape = (1, 32, 64, 3)
    img1 = jnp.asarray(rng.rand(*shape).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(*shape).astype(np.float32) * 255)
    params = model.init(jax.random.PRNGKey(0), img1, img2, train=False)
    want = jax.jit(
        lambda a, b: model.apply(params, a, b, train=False))(img1, img2)
    return model, params, (img1, img2), want


def _assert_trees_equal(got, want, tol=0.0):
    lg = jax.tree_util.tree_leaves(got)
    lw = jax.tree_util.tree_leaves(want)
    assert len(lg) == len(lw) and lg
    for g, w in zip(lg, lw):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=tol)


def test_frozen_roundtrip(setup, tmp_path):
    model, params, (img1, img2), want = setup
    exp = export_eval(model, params, img1.shape, platforms=("cpu",))
    path = str(tmp_path / "model.nmrfx")
    size = save_exported(exp, path, extra_meta={"test": True})
    assert size > 0 and (tmp_path / "model.nmrfx.json").exists()
    rt = load_exported(path)
    # the artifact carries its own weights: call with images only
    _assert_trees_equal(rt.call(img1, img2), want)


def test_hotswap_convention(setup):
    model, params, (img1, img2), want = setup
    exp = export_eval(model, params, img1.shape, platforms=("cpu",),
                      freeze_params=False)
    rt = jax.export.deserialize(exp.serialize())
    # NOT tol=0: the persistent compile cache on this machine can serve the
    # live-jit side an executable AOT-compiled on a host with different CPU
    # features (cpu_aot_loader warns about the feature mismatch), while the
    # deserialized artifact compiles fresh — different instruction selection
    # legitimately drifts f32 results by a few ulp (observed 1.9e-6).
    # Bit-equality across distinct compilations is not a sound contract;
    # the frozen round-trip test above keeps the exact check where both
    # sides share one executable.
    _assert_trees_equal(rt.call(params, img1, img2), want, tol=1e-4)


def test_http_serving_roundtrip(setup, tmp_path):
    """tools/serve_http.py: POST an npz pair, get the unpadded disparity,
    matching the live model through pad/unpad."""
    import io
    import sys
    import threading
    import urllib.request
    from http.server import HTTPServer

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent
                           / "tools"))
    import serve_http

    model, params, (img1, img2), want = setup
    exp = export_eval(model, params, img1.shape, platforms=("cpu",))
    path = str(tmp_path / "m.nmrfx")
    save_exported(exp, path)
    rt = load_exported(path)

    srv = HTTPServer(("127.0.0.1", 0),
                     serve_http.make_handler(rt, {"magic": "test"}))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        with urllib.request.urlopen(base + "/healthz") as r:
            assert b"magic" in r.read()
        # a smaller-than-exported pair exercises the pad/unpad path
        H, W = 30, 60
        a = np.asarray(img1)[0, :H, :W]
        b = np.asarray(img2)[0, :H, :W]
        buf = io.BytesIO()
        np.savez(buf, img1=a, img2=b)
        req = urllib.request.Request(base + "/disparity", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            disp = np.load(io.BytesIO(r.read()))
        assert disp.shape == (H, W) and np.isfinite(disp).all()
        # parity with the live model on the same padded input
        p1 = np.pad(a, ((0, 2), (0, 4), (0, 0)), mode="edge")[None]
        p2 = np.pad(b, ((0, 2), (0, 4), (0, 0)), mode="edge")[None]
        want2 = jax.jit(lambda x, y: model.apply(params, x, y, train=False))(
            jnp.asarray(p1), jnp.asarray(p2))
        np.testing.assert_allclose(disp, np.asarray(want2["disp"])[0, :H, :W],
                                   atol=1e-5)
    finally:
        srv.shutdown()


def test_wrong_shape_rejected(setup):
    model, params, (img1, img2), _ = setup
    exp = export_eval(model, params, img1.shape, platforms=("cpu",))
    bad = jnp.zeros((1, 40, 64, 3), jnp.float32)
    with pytest.raises(Exception):
        jax.block_until_ready(exp.call(bad, bad))
