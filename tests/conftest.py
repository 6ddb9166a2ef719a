"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests must not require TPU hardware; multi-chip sharding tests use
xla_force_host_platform_device_count so the full pjit/shard_map paths
compile and execute on CPU.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not honored when a TPU plugin (axon) is registered;
# force the CPU platform explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: kernels here are compile-heavy and the test
# host may be single-core; cache across pytest processes.
from snap_rnaseq_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
