"""Pallas TPU kernels and their pure-jnp reference twins.

Every performance kernel ships with a sequential pure-jnp reference in
`refs.py` (the ref-twin pattern of the reference project's kernel test
suites, see /root/reference/mamba/tests/ops/test_selective_scan.py).
"""

from vivim_tpu.kernels.refs import (
    causal_conv1d_ref,
    selective_scan_ref_cm,
    causal_conv1d_update_ref,
    mamba_inner_ref,
    selective_scan_ref,
    selective_state_update_ref,
)
from vivim_tpu.kernels.causal_conv1d import causal_conv1d, causal_conv1d_update
from vivim_tpu.kernels.selective_scan import selective_scan, selective_scan_cm
from vivim_tpu.kernels.mamba_inner import mamba_inner

__all__ = [
    "causal_conv1d",
    "causal_conv1d_ref",
    "causal_conv1d_update",
    "causal_conv1d_update_ref",
    "mamba_inner",
    "mamba_inner_ref",
    "selective_scan",
    "selective_scan_cm",
    "selective_scan_ref",
    "selective_scan_ref_cm",
    "selective_state_update_ref",
]
