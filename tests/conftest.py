"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of the reference's "multi-node only via real
runs" gap (SURVEY.md §4): sharding/collective logic is exercised on
``xla_force_host_platform_device_count=8`` CPU devices so multi-chip code
paths are tested without hardware.

ENVIRONMENT QUIRK: this machine's python sitecustomize registers a remote-TPU
PJRT plugin and pins ``jax_platforms="axon,cpu"`` via jax.config — which wins
over the JAX_PLATFORMS env var, silently routing "CPU" tests through the
remote TPU tunnel (~25x slower).  Pin the config back to cpu here, before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # override sitecustomize pin
jax.config.update("jax_enable_x64", False)
# Parity tests compare against torch float32 goldens; the default matmul
# precision in this JAX build is bf16-like even on CPU.
jax.config.update("jax_default_matmul_precision", "highest")
# Persist compiled executables across test sessions — in a CPU-only cache:
# the shared /root/.jax_cache also holds CPU executables AOT-compiled by
# the remote helper on a different machine (feature mismatch -> SIGILL risk).
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
