"""SPMD batch partitioning of the Pallas kernels (ops/pallas/partitioning.py).

A pallas_call is an opaque custom call: without a partitioning rule, a
data-parallel jit must all-gather its operands and run the full batch on
every device (r3 SCALING.json recorded exactly those all-gathers).  These
tests assert the two halves of the fix:

  1. numerical: batch-sharded partitioned call == unsharded call, bitwise;
  2. structural: the compiled HLO of a DP forward contains NO all-gather
     (the batch stays sharded through the kernel).
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nmrf_tpu.ops.pallas.attention import (stripe_attention_direct,
                                           window_attention_native,
                                           window_meta)
from nmrf_tpu.ops.pallas.msda import msda_taps_level


def dp_mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


def _hlo(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def test_stripe_attention_batch_partitioned():
    B, Hp, Wp, N, C = 4, 8, 6, 3, 32
    h = 2
    H_sp, W_sp = 8, 2
    T = H_sp * W_sp * N
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(B, Hp, Wp, N, C).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(rng.randn(T, T).astype(np.float32))

    ref = stripe_attention_direct(q, k, v, mask, 0.25, H_sp, W_sp, h)

    mesh = dp_mesh()
    sh = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))
    ms = jax.device_put(mask, NamedSharding(mesh, P()))

    def fn(q, k, v, mask):
        return stripe_attention_direct(q, k, v, mask, 0.25, H_sp, W_sp, h,
                                       partition=True)

    out = jax.jit(fn)(qs, ks, vs, ms)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert out.sharding.is_equivalent_to(sh, out.ndim)
    hlo = _hlo(fn, qs, ks, vs, ms)
    assert not re.search(r"all-gather", hlo), "batch was gathered"


def test_window_attention_batch_partitioned():
    B, Hp, Wp, N = 4, 8, 8, 2
    wh = ww = 4
    h, hd = 2, 8
    C3 = 3 * h * hd
    WB = 1
    P_ = wh * ww
    R = wh * WB * ww * N
    nwh, nwwB = Hp // wh, Wp // (WB * ww)
    rng = np.random.RandomState(1)
    qkv = jnp.asarray(rng.randn(B, Hp, Wp, N, C3).astype(np.float32))
    qr = jnp.asarray(rng.randn(B, nwh, nwwB, h, R, P_).astype(np.float32))
    kr = jnp.asarray(rng.randn(B, nwh, nwwB, h, R, P_).astype(np.float32))
    ve = jnp.asarray(rng.randn(h, R, hd * P_).astype(np.float32))
    window_meta(wh, ww, WB, N)  # sanity: shapes consistent

    ref = window_attention_native(qkv, qr, kr, ve, 2, 0.25, wh, ww, WB, h,
                                  True)

    mesh = dp_mesh()
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    qkvs = jax.device_put(qkv, sh)
    qrs = jax.device_put(qr, sh)
    krs = jax.device_put(kr, sh)
    ves = jax.device_put(ve, rep)

    def fn(qkv, qr, kr, ve):
        return window_attention_native(qkv, qr, kr, ve, 2, 0.25, wh, ww,
                                       WB, h, True, partition=True)

    out = jax.jit(fn)(qkvs, qrs, krs, ves)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert out.sharding.is_equivalent_to(sh, out.ndim)
    hlo = _hlo(fn, qkvs, qrs, krs, ves)
    assert not re.search(r"all-gather", hlo), "batch was gathered"


def test_msda_taps_batch_partitioned():
    B, Hl, Wl, M, D, Pp = 4, 4, 6, 2, 8, 3
    f = 2
    Hq, Wq = Hl * f, Wl * f
    rng = np.random.RandomState(2)
    vm = jnp.asarray(rng.randn(B, Hl, Wl, M * D).astype(np.float32))
    dx = jnp.asarray((rng.rand(B, Hq, Wq, M * Pp) * 2 - 1).astype(np.float32))
    dy = jnp.asarray((rng.rand(B, Hq, Wq, M * Pp) * 2 - 1).astype(np.float32))
    aw = jnp.asarray(rng.rand(B, Hq, Wq, M * Pp).astype(np.float32))

    ref = msda_taps_level(vm, dx, dy, aw, M, 2)

    mesh = dp_mesh()
    sh = NamedSharding(mesh, P("data"))
    args = tuple(jax.device_put(t, sh) for t in (vm, dx, dy, aw))

    def fn(vm, dx, dy, aw):
        return msda_taps_level(vm, dx, dy, aw, M, 2, partition=True)

    out = jax.jit(fn)(*args)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert out.sharding.is_equivalent_to(sh, out.ndim)
    hlo = _hlo(fn, *args)
    assert not re.search(r"all-gather", hlo), "batch was gathered"


def test_partitioned_op_unsharded_inputs_match():
    """No mesh / replicated inputs: the partitioned op is a passthrough."""
    B, Hp, Wp, N, C = 2, 4, 4, 2, 16
    T = 4 * 2 * N
    rng = np.random.RandomState(3)
    q, k, v = (jnp.asarray(rng.randn(B, Hp, Wp, N, C).astype(np.float32))
               for _ in range(3))
    mask = jnp.zeros((T, T), jnp.float32)
    ref = stripe_attention_direct(q, k, v, mask, 0.5, 4, 2, 2)
    out = jax.jit(lambda *a: stripe_attention_direct(
        *a, 0.5, 4, 2, 2, partition=True))(q, k, v, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_dp_train_step_grad_matches_with_partitioned_kernels():
    """Gradients flow through the partitioned forward (custom_vjp remat
    backward is plain jnp — GSPMD partitions it natively): a 4-way DP
    value_and_grad equals the single-device one."""
    from nmrf_tpu.ops.pallas.attention import stripe_attention_op

    B, Hp, Wp, N, C = 4, 8, 6, 3, 32
    H_sp, W_sp, h = 8, 2, 2
    T = H_sp * W_sp * N
    rng = np.random.RandomState(4)
    q, k, v = (jnp.asarray(rng.randn(B, Hp, Wp, N, C).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(rng.randn(T, T).astype(np.float32))

    def loss(q, k, v, part):
        out = stripe_attention_op(q, k, v, mask, 0.25, H_sp, W_sp, h, part)
        return (out * out).sum()

    lr, gr = jax.value_and_grad(lambda a, b, c: loss(a, b, c, False),
                                argnums=(0, 1, 2))(q, k, v)

    mesh = dp_mesh()
    sh = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))
    lp, gp = jax.jit(jax.value_and_grad(
        lambda a, b, c: loss(a, b, c, True), argnums=(0, 1, 2)))(qs, ks, vs)

    # sharded reduction changes the summation order of the scalar loss
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_window_native_dp_grad_with_pallas_backward():
    """The r4 fused Pallas BACKWARD under batch partitioning: a 4-way DP
    value_and_grad through window_attention_native_op (dx/dqr/dkr kernels
    sharded; per-sample d(ve) partials summed across shards) equals the
    single-device result, including the value-table cotangent."""
    from nmrf_tpu.ops.pallas.attention import window_attention_native_op

    B, H, W, N, dim, heads, ws, WB = 4, 8, 12, 2, 16, 2, 4, 3
    hd = dim // heads
    scale = hd ** -0.5
    Pw = ws * ws
    R = ws * WB * ws * N
    nwh, nwwB = H // ws, W // (WB * ws)
    rng = np.random.RandomState(7)
    qkv = jnp.asarray(rng.randn(B, H, W, N, 3 * dim).astype(np.float32))
    qr, kr = (jnp.asarray(
        (rng.randn(B, nwh, nwwB, heads, R, Pw) * 0.1).astype(np.float32))
        for _ in range(2))
    ve = jnp.asarray(
        (rng.randn(heads, R, Pw * hd) * 0.1).astype(np.float32))

    def loss(qkv, qr, kr, ve, part):
        out = window_attention_native_op(
            qkv, qr, kr, ve, 2, 0, scale, ws, ws, WB, heads, True,
            -1e9, None, part)
        return (out * out).sum()

    lr, gr = jax.value_and_grad(
        lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(qkv, qr, kr, ve)

    mesh = dp_mesh()
    sh = NamedSharding(mesh, P("data"))
    qs = jax.device_put(qkv, sh)
    qrs = jax.device_put(qr, sh)
    krs = jax.device_put(kr, sh)
    lp, gp = jax.jit(jax.value_and_grad(
        lambda *a: loss(*a, True), argnums=(0, 1, 2, 3)))(qs, qrs, krs, ve)

    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    for name, a, b in zip(("dqkv", "dqr", "dkr", "dve"), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_window_pos_op_dp_grad():
    """The r5 fully-fused positional op under batch partitioning: the
    per-sample d(k_embed)/d(q_embed)/d(ve) table partials must sum across
    shards to the single-device cotangents."""
    from nmrf_tpu.ops.pallas.attention import (window_attention_pos_op,
                                               window_meta)

    B, H, W, N, dim, heads, ws, WB = 4, 8, 12, 2, 16, 2, 4, 3
    hd = dim // heads
    scale = hd ** -0.5
    Pw = ws * ws
    rng = np.random.RandomState(7)
    qkv = jnp.asarray(rng.randn(B, H, W, N, 3 * dim).astype(np.float32))
    ke, qe, veT = (jnp.asarray(
        (rng.randn(Pw, Pw, heads, hd) * 0.1).astype(np.float32))
        for _ in range(3))
    meta, _ = window_meta(ws, ws, WB, N)
    ve = veT.transpose(2, 0, 3, 1)[:, meta[:, 0]].reshape(
        heads, len(meta), hd * Pw)

    def loss(qkv, ke, qe, ve, part):
        out = window_attention_pos_op(
            qkv, ke, qe, ve, 2, 0, scale, ws, ws, WB, heads, True,
            -1e9, None, part)
        return (out * out).sum()

    lr, gr = jax.value_and_grad(
        lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(qkv, ke, qe, ve)

    mesh = dp_mesh()
    sh = NamedSharding(mesh, P("data"))
    qs = jax.device_put(qkv, sh)
    lp, gp = jax.jit(jax.value_and_grad(
        lambda *a: loss(*a, True), argnums=(0, 1, 2, 3)))(qs, ke, qe, ve)

    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    for name, a, b in zip(("dqkv", "dke", "dqe", "dve"), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
