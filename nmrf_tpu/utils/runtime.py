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
