"""Finite-difference gradient checking (jax.test_util.check_grads was removed
in this JAX version).  Central differences vs reverse-mode VJP.

NOTE: everything is jitted and fed jnp arrays — in this environment each XLA
compile is a remote roundtrip and numpy inputs to jitted functions are
pathologically slow, so we compile exactly twice (fn, grad) and reuse.
"""

import numpy as np
import jax
import jax.numpy as jnp


def check_grads(fn, args, eps=1e-3, atol=1e-2, rtol=1e-2, probes=8):
    """Check d fn / d args for a scalar-valued fn via central differences."""
    args = [jnp.asarray(a) for a in args]
    fn_j = jax.jit(fn)
    grads = jax.jit(jax.grad(fn, argnums=tuple(range(len(args)))))(*args)
    rng = np.random.RandomState(0)
    for i, (a, g) in enumerate(zip(args, grads)):
        a_np = np.asarray(a, dtype=np.float32)
        g_np = np.asarray(g, dtype=np.float64)
        flat = a_np.reshape(-1)
        for _ in range(min(probes, flat.size)):
            j = rng.randint(flat.size)
            ap, am = flat.copy(), flat.copy()
            ap[j] += eps
            am[j] -= eps
            args_p = list(args)
            args_m = list(args)
            args_p[i] = jnp.asarray(ap.reshape(a_np.shape))
            args_m[i] = jnp.asarray(am.reshape(a_np.shape))
            fd = (float(fn_j(*args_p)) - float(fn_j(*args_m))) / (2 * eps)
            an = g_np.reshape(-1)[j]
            assert abs(fd - an) <= atol + rtol * abs(fd), (
                f"grad mismatch arg{i}[{j}]: fd={fd}, ad={an}")
