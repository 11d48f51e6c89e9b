"""Tensor-parallel (Megatron-style) Mamba mixer and LM forward.

The reference carries tensor parallelism only as a vestigial argument
(/root/reference/mamba/mamba_ssm/utils/generation.py:103,133 threads a
``tensor_parallel`` parameter that nothing consumes); no TP implementation
exists anywhere in the repo.  This module is the real capability, built
TPU-first.

Why TP maps perfectly onto Mamba: the selective scan is independent per
channel, so sharding ``d_inner`` over a mesh axis keeps the entire
conv -> dt/scan -> gate chain local to each device.  Only two small
collectives are needed per mixer, exactly Megatron's column/row-parallel
pattern:

- ``in_proj`` is column-parallel (each device computes its d_inner/k slice
  of x and z from the replicated tokens);
- ``x_proj`` is row-parallel: the (dt_rank + 2*dstate) projection contracts
  over the sharded channel axis, so each device computes a partial product
  and one ``psum`` over the TP axis produces the *shared* dt/B/C — these
  are global per-position SSM inputs, not per-channel quantities;
- ``dt_proj`` is column-parallel (per-channel dt slice), the scan and the
  silu(z) gate are fully local;
- ``out_proj`` is row-parallel: partial (B, L, d_model) products,
  ``psum`` over the TP axis.

Per layer that is one (B, L, dt_rank + 2*dstate) and one (B, L, d_model)
all-reduce over ICI — tiny next to the FLOPs they unlock.  Implemented as
a ``shard_map`` island (like the sequence-sharded scan in
``parallel/seq_scan.py``) so the Pallas scan kernel stays local per shard
instead of being replicated around an opaque custom call by GSPMD.

Composes with data parallelism on a 2-D ("data", "model") mesh: the batch
dimension shards over any other mesh axis (``batch_axis``) and stays local
inside the island.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vivim_tpu.kernels.causal_conv1d import causal_conv1d
from vivim_tpu.kernels.selective_scan import selective_scan


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    import inspect

    kw = {}
    sig = inspect.signature(shard_map)
    if "check_rep" in sig.parameters:
        kw["check_rep"] = False
    elif "check_vma" in sig.parameters:
        kw["check_vma"] = False
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     **kw)


def _mixer_local(x, w_x, w_z, conv_w, conv_b, x_proj, dt_proj, dt_bias,
                 A_log, D, out_proj, *, axis_name, dt_rank, dstate,
                 implementation):
    """Per-shard mixer body: everything per-channel is a d_inner/k slice."""
    dtype = x.dtype
    x_l = jnp.einsum("bld,ed->ble", x, w_x.astype(dtype))
    z_l = jnp.einsum("bld,ed->ble", x, w_z.astype(dtype))
    x_c = causal_conv1d(x_l, conv_w, conv_b, activation="silu")
    # row-parallel x_proj: contract over the local channel slice, then
    # all-reduce -> the global dt/B/C inputs every channel shares
    x_dbl = jnp.einsum("bld,rd->blr", x_c, x_proj.astype(dtype))
    x_dbl = jax.lax.psum(x_dbl, axis_name)
    delta = jnp.einsum("blr,dr->bld", x_dbl[..., :dt_rank],
                       dt_proj.astype(dtype))
    B = x_dbl[..., dt_rank:dt_rank + dstate]
    C = x_dbl[..., dt_rank + dstate:]
    y_l = selective_scan(
        x_c, delta, -jnp.exp(A_log.astype(jnp.float32)), B, C,
        D=D.astype(jnp.float32), z=z_l,
        delta_bias=dt_bias.astype(jnp.float32), delta_softplus=True,
        implementation=implementation)
    # row-parallel out_proj: partial products all-reduced over the TP axis
    out = jnp.einsum("bld,od->blo", y_l, out_proj.astype(y_l.dtype))
    return jax.lax.psum(out, axis_name)


def tp_mamba_mixer(params, x, mesh: Mesh, axis_name: str = "model",
                   batch_axis: str | None = None, implementation=None):
    """Run one single-direction Mamba mixer tensor-parallel over ``mesh``.

    ``params``: the flax param dict of a ``MambaV3(bimamba_type="none")``
    (in_proj_kernel, conv1d_kernel/bias, x_proj_kernel, dt_proj_kernel/bias,
    A_log, D, out_proj_kernel) — the SAME tree the unsharded module uses;
    d_inner must divide by the ``axis_name`` mesh-axis size.
    ``x``: (B, L, d_model) tokens, replicated over ``axis_name`` (sharded
    over ``batch_axis`` if given).  Returns (B, L, d_model).
    """
    d_inner = params["A_log"].shape[0]
    dt_rank = params["dt_proj_kernel"].shape[1]
    dstate = params["A_log"].shape[1]
    k = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    if d_inner % k:
        raise ValueError(f"d_inner {d_inner} not divisible by "
                         f"{axis_name} axis size {k}")
    # split the fused in_proj into its x and z halves so each half shards
    # over channels independently (a contiguous slice of the fused
    # (2*d_inner, d_model) kernel would mix x rows and z rows)
    in_proj = params["in_proj_kernel"]
    w_x, w_z = in_proj[:d_inner], in_proj[d_inner:]

    col = P(axis_name, None)       # (d_inner, ...) column-parallel slices
    chan = P(axis_name)            # (d_inner,) vectors
    conv_spec = P(None, axis_name)  # (width, d_inner)
    row = P(None, axis_name)       # contract over the sharded axis
    x_spec = P(batch_axis, None, None)

    body = functools.partial(
        _mixer_local, axis_name=axis_name, dt_rank=dt_rank, dstate=dstate,
        implementation=implementation)
    # a zeros bias is identical to no bias — keeps one shard_map signature
    conv_b = params.get("conv1d_bias")
    if conv_b is None:
        conv_b = jnp.zeros((d_inner,), params["conv1d_kernel"].dtype)
    return _shard_map(
        body, mesh,
        (x_spec, col, col, conv_spec, chan, row, col, chan, col, chan, row),
        x_spec,
    )(x, w_x, w_z, params["conv1d_kernel"], conv_b, params["x_proj_kernel"],
      params["dt_proj_kernel"], params["dt_proj_bias"], params["A_log"],
      params["D"], params["out_proj_kernel"])


def _layer_norm(np_, h, eps=1e-6):
    mean = h.mean(-1, keepdims=True)
    var = ((h - mean) ** 2).mean(-1, keepdims=True)
    hn = (h - mean) * jax.lax.rsqrt(var + eps)
    return hn * np_["scale"] + np_["bias"]


def lm_tp_forward(cfg, params, tokens, mesh: Mesh,
                  axis_name: str = "model", batch_axis: str | None = None,
                  implementation=None):
    """Tensor-parallel ``MambaLM`` forward: same params, same logits.

    Functional twin of ``vivim_tpu.nn.lm.MambaLM.__call__`` with every
    mixer running through ``tp_mamba_mixer``.  The embedding lookup, the
    layer norms and the tied lm_head stay plain pjit ops (GSPMD shards the
    lm_head matmul over the batch axis if the tokens are batch-sharded).

    ``params``: the ``{"params": ...}`` tree (or its inner dict) from
    ``MambaLM.init``.  Returns (B, L, padded_vocab) logits.
    """
    p = params["params"] if "params" in params else params
    emb = p["embedding"]
    h = emb[tokens]
    for i in range(cfg.n_layer):
        res = h
        h = _layer_norm(p[f"norm_{i}"], h)
        h = tp_mamba_mixer(p[f"mixer_{i}"], h, mesh, axis_name=axis_name,
                           batch_axis=batch_axis,
                           implementation=implementation)
        h = res + h
    h = _layer_norm(p["norm_f"], h)
    return h @ emb.T
