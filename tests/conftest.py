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
# NOTE: deliberately no persistent compilation cache here — XLA:CPU AOT
# entries written by TPU-backend processes carry different machine-feature
# flags and reload with "could lead to SIGILL" warnings (observed flaky
# numerics); compile fresh instead.
