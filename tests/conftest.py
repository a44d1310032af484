"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of the reference's "multi-node only via real
runs" gap (SURVEY.md §4): sharding/collective logic is exercised on
``xla_force_host_platform_device_count=8`` CPU devices so multi-chip code
paths are tested without hardware.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the real TPU
# tunnel, which unit tests must not grab (and which blocks concurrent use).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Parity tests compare against torch float32 goldens; the default matmul
# precision in this JAX build is bf16-like even on CPU.
jax.config.update("jax_default_matmul_precision", "highest")
