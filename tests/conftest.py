"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4): XLA hosts 8 fake devices on CPU, so sharding/collective code
paths are exercised for real, just slowly.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
