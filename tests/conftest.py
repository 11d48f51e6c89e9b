"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before the first jax import (the reference project had no
multi-device tests at all; here multi-chip sharding is tested on host CPU
devices per the standard JAX pattern).

Opt-in real-hardware mode: ``VIVIM_TESTS_ON_DEVICE=1`` skips the CPU
forcing so the session's real accelerator backend is used — meant for the
hardware parity subset only::

    VIVIM_TESTS_ON_DEVICE=1 python -m pytest tests/test_on_device.py -q

(the rest of the suite assumes the 8-device CPU mesh and is not expected
to pass single-chip).
"""

import os

_ON_DEVICE = os.environ.get("VIVIM_TESTS_ON_DEVICE", "") not in ("", "0")

if not _ON_DEVICE:
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
if not _ON_DEVICE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: deliberately no persistent compilation cache here — XLA:CPU AOT
# entries written by TPU-backend processes carry different machine-feature
# flags and reload with "could lead to SIGILL" warnings (observed flaky
# numerics); compile fresh instead.


# ---------------------------------------------------------------------------
# Test tiers (round-4 verdict item 6).  The suite splits in two:
#
#   fast tier  —  python -m pytest -m "not slow"   (target: < 5 min on 1 CPU)
#   slow tier  —  python -m pytest -m slow         (multi-device-mesh compiles,
#                 torch goldens, CLI/e2e runs; ~25 min on 1 CPU)
#
# Tiering is by module, maintained here in ONE place rather than scattered
# per-file pytestmark lines, so moving a module between tiers is a one-line
# diff and nothing can silently fall out of both tiers.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_MODULES = {
    # 8-device-mesh jit compiles (minutes each on XLA:CPU)
    "test_seq_scan", "test_tensor_parallel", "test_distributed_ckpt",
    "test_graft_entry", "test_dropout_and_remat", "test_fsdp",
    "test_pipeline", "test_expert_parallel",
    # full-CLI / end-to-end training runs
    "test_train_e2e", "test_cli_mains", "test_infer_cli",
    "test_binary", "test_polyp",
    # torch golden twins (torch import + dual-framework forward/backward)
    "test_vivim_golden", "test_edge_loss_golden", "test_segformer",
    "test_vivim_convert", "test_losses",
    # full-model forwards / LM decode scans
    "test_vivim", "test_streaming_lm",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
