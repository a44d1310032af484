#!/usr/bin/env python
"""Bisect which Mosaic constructs the tap-MSDA kernel can use on this TPU.

Each probe is a minimal pallas_call exercising ONE construct; prints OK/FAIL.
"""
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nmrf_tpu.utils.runtime import configure_jax
configure_jax()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
H, W, C = 64, 96, 64
x = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)


def run(tag, kernel, scratch=None, grid=None):
    kwargs = {}
    if scratch is not None:
        kwargs["scratch_shapes"] = scratch
    try:
        out = pl.pallas_call(
            kernel,
            grid=grid or (1,),
            in_specs=[pl.BlockSpec((H, W, C), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((H, W, C), lambda i: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, W, C), jnp.float32),
            **kwargs,
        )(x)
        out.block_until_ready()
        print(f"OK   {tag}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {tag}: {type(e).__name__}: {msg}", flush=True)
        return False


# 1. dynamic row slice (leading axis) driven by fori var
def k1(x_ref, o_ref):
    def body(t, acc):
        return acc + x_ref[pl.ds(t, H - 8), :, :][0:H - 8]
    acc = jax.lax.fori_loop(0, 8, body, jnp.zeros((H - 8, W, C), jnp.float32))
    o_ref[...] = jnp.pad(acc, ((0, 8), (0, 0), (0, 0)))
run("dyn_row_slice_fori", k1)

# 2. broadcast-upsample rows (leading) inside fori
def k2(x_ref, o_ref):
    f = 2
    def body(t, acc):
        s = x_ref[pl.ds(t, H // f), :, :]
        s = jnp.broadcast_to(s[:, None], (H // f, f, W, C))
        return acc + s.reshape(H, W, C)
    o_ref[...] = jax.lax.fori_loop(0, 4, body, jnp.zeros((H, W, C), jnp.float32))
run("bcast_row_upsample_fori", k2)

# 3. scratch store + static middle slice read
def k3(x_ref, o_ref, s_ref):
    s_ref[...] = x_ref[...]
    o_ref[...] = jnp.pad(s_ref[:, 4:W - 4, :], ((0, 0), (4, 4), (0, 0)))
run("scratch_static_mid_slice", k3, scratch=[pltpu.VMEM((H, W, C), jnp.float32)])

# 4. DYNAMIC middle-axis (sublane) slice from scratch, fori var
def k4(x_ref, o_ref, s_ref):
    s_ref[...] = x_ref[...]
    def body(t, acc):
        return acc + s_ref[:, pl.ds(t, W - 8), :]
    acc = jax.lax.fori_loop(0, 8, body, jnp.zeros((H, W - 8, C), jnp.float32))
    o_ref[...] = jnp.pad(acc, ((0, 0), (0, 8), (0, 0)))
run("dyn_mid_slice_fori", k4, scratch=[pltpu.VMEM((H, W, C), jnp.float32)])

# 5. dynamic middle slice with stride-4 alignment only
def k5(x_ref, o_ref, s_ref):
    s_ref[...] = x_ref[...]
    def body(t, acc):
        return acc + s_ref[:, pl.ds(t * 4, W - 32), :]
    acc = jax.lax.fori_loop(0, 8, body, jnp.zeros((H, W - 32, C), jnp.float32))
    o_ref[...] = jnp.pad(acc, ((0, 0), (0, 32), (0, 0)))
run("dyn_mid_slice_x4_fori", k5, scratch=[pltpu.VMEM((H, W, C), jnp.float32)])

# 6. big f32 fori carry + dot_general inside loop
SEL = jnp.asarray(np.eye(C, dtype=np.float32))
def k6(x_ref, o_ref):
    flat = x_ref[...].reshape(H * W, C)
    def body(t, acc):
        return acc + jax.lax.dot_general(flat, SEL, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
    acc = jax.lax.fori_loop(0, 4, body, jnp.zeros((H * W, C), jnp.float32))
    o_ref[...] = acc.reshape(H, W, C)
run("fori_carry_dot", k6)

# 7. nested fori with scratch write in outer, dyn read in inner
def k7(x_ref, o_ref, s_ref):
    def outer(ty, acc):
        s_ref[...] = x_ref[...] * (1.0 + ty.astype(jnp.float32))
        def inner(tx, acc):
            return acc + s_ref[:, pl.ds(tx, W - 8), :]
        return jax.lax.fori_loop(0, 4, inner, acc)
    acc = jax.lax.fori_loop(0, 4, outer,
                            jnp.zeros((H, W - 8, C), jnp.float32))
    o_ref[...] = jnp.pad(acc, ((0, 0), (0, 8), (0, 0)))
run("nested_fori_scratch", k7, scratch=[pltpu.VMEM((H, W, C), jnp.float32)])
