"""Chained-readback latency measurement (the only honest timing on the
axon relay: async dispatch does not serialize executions and
``block_until_ready`` is unreliable, so iterations are CHAINED — each call
consumes a token derived from the previous output — and a single host
readback closes the pipeline).

``bench.py`` (the driver metric) keeps its own inline copy of this exact
pattern; tools build on this helper so the methodology lives in one
audited place.
"""

import time

import jax
import jax.numpy as jnp


def chained_ms(fn, *args, iters=20):
    """Steady-state per-call latency of ``fn(*args)`` in milliseconds.

    ``fn`` must accept the first argument perturbed by a scalar token of
    the same dtype and return an array (any shape); iterations run inside
    one ``lax.scan`` so the device executes them back-to-back.
    """

    @jax.jit
    def chained(*a):
        def body(tok, _):
            out = fn(a[0] + tok.astype(a[0].dtype), *a[1:])
            return jnp.mean(out).astype(jnp.float32) * 0.0, ()

        tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return tok

    float(chained(*args))  # compile + warm up
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / iters * 1e3
