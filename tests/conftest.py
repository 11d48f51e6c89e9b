"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before the first jax import (the reference project had no
multi-device tests at all; here multi-chip sharding is tested on host CPU
devices per the standard JAX pattern).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize overrides JAX_PLATFORMS at import
# (jax.config.update("jax_platforms", "axon,cpu")); force CPU back
# programmatically so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: repeated pytest runs on the 1-vCPU test
# machine skip recompiles of unchanged programs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
