#!/usr/bin/env python
"""Probe: does the remote Mosaic backend support ``pltpu.repeat`` on the lane
axis, and does it reproduce the selector-matmul tile exactly?

Context (ops/pallas/attention.py): the window-native kernel tiles q [R, hd]
to qtile [R, P*hd] with a constant 0/1 matmul (R*hd*P*hd MACs).  In the
(s, c) = s*hd + c lane order, ``pltpu.repeat(q, P, axis=1)`` is the same
array for free on the VPU.  This probe checks the construct compiles and is
bit-identical before the kernel adopts it.
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)
R, hd, P = 144, 32, 36
PH = P * hd
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((R, hd)), jnp.float32)

c_ids = np.tile(np.arange(hd), P)
t_tile = jnp.asarray(
    (np.arange(hd)[:, None] == c_ids[None, :]).astype(np.float32))


def k_matmul(q_ref, t_ref, o_ref):
    o_ref[...] = lax.dot_general(
        q_ref[...], t_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def k_repeat(q_ref, o_ref):
    o_ref[...] = pltpu.repeat(q_ref[...], P, axis=1)


def call(kernel, inputs, shapes):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(s, lambda s=s: tuple(0 for _ in s),
                               memory_space=pltpu.VMEM) for s in shapes],
        out_specs=pl.BlockSpec((R, PH), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, PH), jnp.float32),
    )(*inputs)


a = call(k_matmul, (q, t_tile), ((R, hd), (hd, PH)))
a.block_until_ready()
print("selector-matmul ok", flush=True)
try:
    b = call(k_repeat, (q,), ((R, hd),))
    b.block_until_ready()
    print("repeat ok; max|diff| =", float(jnp.max(jnp.abs(a - b))), flush=True)
except Exception as e:  # noqa: BLE001
    print("repeat FAIL:", type(e).__name__, str(e).split("\n")[0][:300])

# value-term repeat: attn_s [R, P] (P=36, NOT lane-aligned) tiled hd times
# in c-major lane order c*P+s; golden = selector matmul with
# T2[s, c*P+s'] = (s == s')
attn_s = jnp.asarray(rng.standard_normal((R, P)), jnp.float32)
s_ids2 = np.tile(np.arange(P), hd)
t2 = jnp.asarray(
    (np.arange(P)[:, None] == s_ids2[None, :]).astype(np.float32))


def k_matmul2(a_ref, t_ref, o_ref):
    o_ref[...] = lax.dot_general(
        a_ref[...], t_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def k_repeat2(a_ref, o_ref):
    o_ref[...] = pltpu.repeat(a_ref[...], hd, axis=1)


a2 = call(k_matmul2, (attn_s, t2), ((R, P), (P, PH)))
a2.block_until_ready()
print("selector-matmul2 ok", flush=True)
try:
    b2 = call(k_repeat2, (attn_s,), ((R, P),))
    b2.block_until_ready()
    print("repeat2 (36-lane src) ok; max|diff| =",
          float(jnp.max(jnp.abs(a2 - b2))), flush=True)
except Exception as e:  # noqa: BLE001
    print("repeat2 FAIL:", type(e).__name__, str(e).split("\n")[0][:300])
