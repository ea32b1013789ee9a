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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    # XLA:CPU's concurrency-optimized schedule lets independent collectives
    # become ready simultaneously; with one executor thread per virtual
    # device the devices can then rendezvous DIFFERENT collectives (e.g. a
    # data-axis BatchNorm all-reduce vs a pipeline ppermute) — a cyclic
    # wait that aborts after the 40 s rendezvous timeout. The sequential
    # scheduler keeps one consistent collective order on every device
    # (measured: 0/14 aborts vs ~70% on the pp train step).
    flags = flags + " --xla_cpu_enable_concurrency_optimized_scheduler=false"
os.environ["XLA_FLAGS"] = flags

import pytest  # noqa: E402
import jax  # noqa: E402

# The env var alone is NOT enough here: the machine's sitecustomize registers
# the axon TPU backend at interpreter startup, so we must also force the
# platform through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# single-core machine: persist compiled executables across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# The FSDP pipelines use `jax.set_mesh` as the documented GLOBAL setter (the
# ambient mesh powers models/vit.py constrain_batch); jax offers no public
# un-set, so restore the pristine thread-local state after every test to keep
# tests order-independent.
from jax._src import config as _jconfig  # noqa: E402

_PRISTINE_MESH_STATE = (
    _jconfig.abstract_mesh_context_manager.get_local(),
    _jconfig.device_context.get_local(),
)


@pytest.fixture(autouse=True)
def _reset_ambient_mesh():
    yield
    _jconfig.abstract_mesh_context_manager.set_local(_PRISTINE_MESH_STATE[0])
    _jconfig.device_context.set_local(_PRISTINE_MESH_STATE[1])
