"""Fused Mamba inner function — conv1d -> projections -> selective scan.

TPU equivalent of ``mamba_inner_fn_no_out_proj`` / ``mamba_inner_fn``
(/root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:155-434).
The CUDA version hand-fuses the causal conv, the x_proj/dt_proj matmuls and
the scan into one autograd Function with checkpoint_lvl=1 (conv output and
delta recomputed in the backward, :228-241).  On TPU the matmuls belong on
the MXU and XLA fuses the elementwise chain, so this is a jnp composition
around the Pallas scan; the same recompute-in-backward memory behavior is
available with ``jax.checkpoint`` (remat) around the pre-scan chain via
``remat=True``.

Remat is OFF by default: on TPU the recompute is pure cost unless memory
is tight — traces at the bench config (bs=3, clip5, 256px) showed the
backward-pass recompute of the conv + projection chain at ~9 ms of a 91 ms
step (HBM-bound f32 conv fusions + the re-run projection matmuls), while
storing the pre-scan outputs costs only ~1 ms of extra HBM traffic and a
few hundred MB of a 16 GB HBM.  The CUDA reference hard-codes the
recompute (checkpoint_lvl=1) because it targets memory-starved GPUs.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from vivim_tpu.kernels.causal_conv1d import causal_conv1d
from vivim_tpu.kernels.selective_scan import selective_scan


def _pre_scan(xz, conv1d_weight, conv1d_bias, x_proj_weight, delta_proj_weight,
              dstate):
    """Conv + projections (optionally recomputed in the backward pass)."""
    d_inner = xz.shape[-1] // 2
    delta_rank = delta_proj_weight.shape[1]
    x, z = xz[..., :d_inner], xz[..., d_inner:]
    x = causal_conv1d(x, conv1d_weight, conv1d_bias, activation="silu")
    # keep the projection matmuls (and hence the scan I/O) in the activation
    # dtype — fp32 weights would silently promote everything to fp32
    x_dbl = jnp.einsum("bld,rd->blr", x, x_proj_weight.astype(x.dtype))
    delta = jnp.einsum(
        "blr,dr->bld", x_dbl[..., :delta_rank],
        delta_proj_weight.astype(x.dtype))
    B = x_dbl[..., delta_rank : delta_rank + dstate]
    C = x_dbl[..., delta_rank + dstate :]
    return x, z, delta, B, C


def mamba_inner(
    xz,
    conv1d_weight,
    conv1d_bias,
    x_proj_weight,
    delta_proj_weight,
    A,
    D=None,
    delta_bias=None,
    out_proj_weight=None,
    out_proj_bias=None,
    delta_softplus=True,
    implementation=None,
    remat=False,
    seq_axis=None,
    mesh=None,
):
    """Fused Mamba-block inner function, time-major.

    Args match ``refs.mamba_inner_ref``: xz (batch, L, 2*d_inner),
    conv1d_weight (width, d_inner), x_proj_weight (dt_rank+2*dstate, d_inner),
    delta_proj_weight (d_inner, dt_rank), A (d_inner, dstate).
    ``remat=True`` recomputes the pre-scan chain in the backward
    (checkpoint_lvl=1 memory behavior) — off by default, see module doc.

    Returns (batch, L, d_inner), or (batch, L, d_model) with out_proj.
    """
    dstate = A.shape[1]
    pre = (jax.checkpoint(_pre_scan, static_argnums=(5,)) if remat
           else _pre_scan)
    x, z, delta, B, C = pre(
        xz, conv1d_weight, conv1d_bias, x_proj_weight, delta_proj_weight,
        dstate)
    y = selective_scan(
        x, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
        delta_softplus=delta_softplus, implementation=implementation,
        seq_axis=seq_axis, mesh=mesh)
    if out_proj_weight is not None:
        y = jnp.einsum("bld,od->blo", y, out_proj_weight)
        if out_proj_bias is not None:
            y = y + out_proj_bias[None, None, :]
    return y


def _pre_scan_grouped(xz, conv_w_g, conv_b_g, x_proj_g, dt_proj_g, dstate,
                      groups):
    """Grouped conv + projections for the batched tri-directional path.

    xz: (G*B, L, 2*d_inner) with direction-major grouping; weights stacked
    with a leading (G,) axis.  The matmuls become batched einsums (bigger
    MXU tiles) and the whole tri-directional mixer needs ONE scan-kernel
    invocation downstream instead of three.
    """
    G = groups
    GB, L, dd = xz.shape
    d_inner = dd // 2
    nb = GB // G
    delta_rank = dt_proj_g.shape[-1]
    x, z = xz[..., :d_inner], xz[..., d_inner:]
    xg = x.reshape(G, nb, L, d_inner)
    width = conv_w_g.shape[1]
    xf = xg.astype(jnp.float32)
    wf = conv_w_g.astype(jnp.float32)  # (G, W, d)
    xp = jnp.pad(xf, ((0, 0), (0, 0), (width - 1, 0), (0, 0)))
    out = xp[:, :, 0:L, :] * wf[:, None, 0][:, :, None, :]
    for w in range(1, width):
        out = out + xp[:, :, w : w + L, :] * wf[:, None, w][:, :, None, :]
    if conv_b_g is not None:
        out = out + conv_b_g.astype(jnp.float32)[:, None, None, :]
    xc = jax.nn.silu(out).astype(x.dtype)
    x_dbl = jnp.einsum("gnld,grd->gnlr", xc, x_proj_g.astype(x.dtype))
    delta = jnp.einsum("gnlr,gdr->gnld", x_dbl[..., :delta_rank],
                       dt_proj_g.astype(x.dtype))
    Bv = x_dbl[..., delta_rank : delta_rank + dstate]
    Cv = x_dbl[..., delta_rank + dstate :]
    flat = lambda t: t.reshape(GB, L, t.shape[-1])
    return flat(xc), z, flat(delta), flat(Bv), flat(Cv)


def mamba_inner_grouped(
    xz_grouped,
    conv_w_g,
    conv_b_g,
    x_proj_g,
    dt_proj_g,
    A_log_g,
    D_g,
    delta_bias_g,
    nb: int,
    delta_softplus=True,
    implementation=None,
    remat=False,
    seq_axis=None,
    mesh=None,
):
    """Batched multi-direction Mamba inner: one fused scan for all G
    directions (the reference launches the CUDA pipeline once per direction,
    mamba_simple.py:215-260; here the G*B sequences share one kernel grid).

    xz_grouped: (G*B, L, 2*d_inner), direction-major.  Per-direction
    parameter stacks carry a leading (G,) axis.  Returns (G*B, L, d_inner).
    ``remat=True`` recomputes the pre-scan chain in the backward — off by
    default (see module doc: the recompute costs ~9 ms/step at the bench
    config for a few hundred MB of saved activations).
    """
    G = conv_w_g.shape[0]
    dstate = A_log_g.shape[-1]
    pre = (jax.checkpoint(_pre_scan_grouped, static_argnums=(5, 6)) if remat
           else _pre_scan_grouped)
    x, z, delta, Bv, Cv = pre(
        xz_grouped, conv_w_g, conv_b_g, x_proj_g, dt_proj_g, dstate, G)
    rep = lambda t: jnp.repeat(t, nb, axis=0)  # (G, ...) -> (G*B, ...)
    return selective_scan(
        x, delta, rep(-jnp.exp(A_log_g.astype(jnp.float32))), Bv, Cv,
        D=rep(D_g.astype(jnp.float32)), z=z,
        delta_bias=rep(delta_bias_g.astype(jnp.float32)),
        delta_softplus=delta_softplus, implementation=implementation,
        seq_axis=seq_axis, mesh=mesh)
