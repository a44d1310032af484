"""JAX runtime configuration shared by all entry points.

Centralizes environment quirks:
  * the machine sitecustomize may pin ``jax_platforms`` via jax.config (which
    silently overrides the JAX_PLATFORMS env var) — re-pin from the env so
    ``JAX_PLATFORMS=cpu python train.py ...`` behaves as expected;
  * persistent compilation cache (each XLA compile can be a remote roundtrip
    here; caching makes them one-time).
"""

import os


def configure_jax(cache_dir: str = "/root/.jax_cache",
                  matmul_precision: str = None):
    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)
    if cache_dir:
        if env_platforms and "cpu" in env_platforms.split(","):
            # partition the cache by platform: CPU executables AOT-compiled
            # by the remote helper record that machine's features (the
            # cpu_aot_loader mismatch warnings — "could lead to SIGILL");
            # keep locally-run CPU artifacts in their own cache
            cache_dir = cache_dir + "_cpu"
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if matmul_precision:
        jax.config.update("jax_default_matmul_precision", matmul_precision)


def backend_init_watchdog(timeout_s: int = 180):
    """Initialize the backend, failing FAST if it is unreachable.

    The axon TPU relay can go down for hours; ``jax.devices()`` then hangs
    forever inside a C++ RPC (unkillable by KeyboardInterrupt).  Arm a
    watchdog thread around the first backend touch and hard-exit with a
    diagnostic on timeout — long-running tools (convergence gate, benches,
    profilers) prefer a clean retryable failure over a silent hang.
    Returns the device list on success.
    """
    import sys
    import threading

    done = threading.Event()

    def arm():
        if not done.wait(timeout_s):
            print(f"backend init timed out after {timeout_s}s "
                  "(axon tunnel down?)", file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=arm, daemon=True).start()
    import jax

    devices = jax.devices()
    done.set()
    return devices
