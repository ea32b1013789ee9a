"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4): XLA hosts 8 fake devices on CPU, so sharding/collective code
paths are exercised for real, just slowly.
"""

import os

# overwrite, not setdefault: the shell pre-sets JAX_PLATFORMS=axon (the TPU
# tunnel) and tests must NOT run through it
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is NOT enough here: the machine's sitecustomize registers
# the axon TPU backend at interpreter startup, so we must also force the
# platform through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# single-core machine: persist compiled executables across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
