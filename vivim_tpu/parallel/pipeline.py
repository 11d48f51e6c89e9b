"""Pipeline parallelism (GPipe-style) for the Mamba LM layer stack.

The reference has no pipeline-parallel implementation anywhere (its
multi-GPU story is single-process CUDA; mamba_ssm's generation utilities
thread only the vestigial ``tensor_parallel`` argument,
/root/reference/mamba/mamba_ssm/utils/generation.py:103).  This module is
a beyond-reference capability, built TPU-first the same way as the
sequence-sharded scan and the Megatron TP mixer: ONE ``shard_map`` island
over a ``pipe`` mesh axis, XLA collectives for the stage-to-stage hops,
and a ``lax.scan`` over schedule ticks so the whole pipeline is a single
compiled program.

Design (the scaling-book collective-pipelining recipe, not a torch
``Pipe`` translation):

- The ``n_layer`` residual blocks are split into ``k = |pipe|``
  contiguous stages of ``n_layer/k`` layers.  Per-layer params are
  STACKED along a leading stage axis (``stack_pipeline_params``) and
  sharded ``P("pipe")``, so each device materializes only its own
  stage's weights — the point of pipeline parallelism: O(n_layer/k)
  parameter HBM per device, like FSDP but without per-step regathers.
- The batch is split into ``M`` microbatches.  A ``lax.scan`` runs
  ``M + k - 1`` ticks; at every tick each device applies its stage to
  its current activation and the activations rotate one stage forward
  via ``lax.ppermute`` (a neighbour hop — rides ICI).  Stage 0 feeds
  microbatch ``t`` in at tick ``t``; stage ``k-1`` banks microbatch
  ``t-(k-1)``.  Bubble fraction is the GPipe ``(k-1)/(M+k-1)``.
- The banked outputs live only on the last stage; one ``psum`` over the
  pipe axis replicates them so the (replicated) final norm + tied
  lm_head run as plain pjit ops outside the island.
- Backward needs no second implementation: ``jax.grad`` through the
  island transposes the schedule scan (the reverse-order pipeline),
  ``ppermute`` into its inverse hop, and the banking ``psum`` into a
  broadcast.  Like GPipe, all microbatch activations of a stage are
  live between forward and backward; wrap the stage fn in
  ``jax.checkpoint`` upstream if that bound binds.

Embedding lookup and lm_head stay outside the island (they are the
first/last "stages" in a torch Pipe; here they are small replicated ops
and keeping them out keeps the island body uniform across devices —
no per-stage ``lax.cond`` branches, which would defeat XLA's single
traced program).

Composes with data parallelism on a ("data", "pipe") mesh: the
microbatch batch dim shards over ``batch_axis`` and stays local inside
the island (same pattern as ``tensor_parallel.tp_mamba_mixer``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vivim_tpu.nn import streaming
from vivim_tpu.parallel.mesh import shard_map_compat as _shard_map


def stack_pipeline_params(p, n_layer: int, n_stages: int):
    """Stack per-layer ``{norm_i, mixer_i}`` params into a pipeline tree.

    Returns a ``{"norm": ..., "mixer": ...}`` tree whose every leaf has
    shape ``(n_stages, n_layer // n_stages, *leaf_shape)`` — leading dim
    sharded ``P(pipe)`` so each device holds exactly its stage's layers.
    All layers of a ``MambaLM`` share one module config, so the per-layer
    trees are structurally identical (a requirement for stacking).
    """
    if n_layer % n_stages:
        raise ValueError(
            f"n_layer {n_layer} not divisible by {n_stages} pipeline stages")
    layers = [{"norm": p[f"norm_{i}"], "mixer": p[f"mixer_{i}"]}
              for i in range(n_layer)]

    def stack(*leaves):
        x = jnp.stack(leaves)
        return x.reshape(n_stages, n_layer // n_stages, *x.shape[1:])

    return jax.tree_util.tree_map(stack, *layers)


def _pipeline_island(stacked, x_mb, *, axis_name, n_stages, n_micro,
                     layers_per_stage, layer_fn):
    """Per-device schedule body (runs under shard_map over ``axis_name``).

    ``stacked``: this device's stage slice, leaves (1, lps, ...).
    ``x_mb``: (M, mb, L, d) microbatched activations (replicated over the
    pipe axis; only stage 0 reads them).  Returns (M, mb, L, d) outputs,
    replicated via the banking psum.
    """
    stage = jax.tree_util.tree_map(lambda a: a[0], stacked)
    s = jax.lax.axis_index(axis_name)
    fwd_hop = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def stage_fn(h):
        for j in range(layers_per_stage):
            lp = jax.tree_util.tree_map(lambda a: a[j], stage)
            h = layer_fn(lp, h)
        return h

    def tick(carry, t):
        h_in, out_buf = carry
        feed = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
        h = stage_fn(jnp.where(s == 0, feed, h_in))
        # the last stage banks microbatch t-(k-1); earlier ticks and other
        # stages re-write the current slot with its existing value (no-op)
        oi = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
        valid = jnp.logical_and(s == n_stages - 1, t >= n_stages - 1)
        cur = jax.lax.dynamic_index_in_dim(out_buf, oi, 0, keepdims=False)
        out_buf = jax.lax.dynamic_update_index_in_dim(
            out_buf, jnp.where(valid, h, cur), oi, 0)
        h_next = jax.lax.ppermute(h, axis_name, fwd_hop)
        return (h_next, out_buf), None

    carry0 = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
    (_, out_buf), _ = jax.lax.scan(
        tick, carry0, jnp.arange(n_micro + n_stages - 1))
    # only the last stage's bank is real; psum replicates it to all stages
    out_buf = jnp.where(s == n_stages - 1, out_buf, jnp.zeros_like(out_buf))
    return jax.lax.psum(out_buf, axis_name)


def lm_pp_forward(cfg, params, tokens, mesh: Mesh, axis_name: str = "pipe",
                  n_micro: int | None = None, batch_axis: str | None = None,
                  implementation=None):
    """Pipeline-parallel ``MambaLM`` forward: same params, same logits.

    Functional twin of ``vivim_tpu.nn.lm.MambaLM.__call__`` with the layer
    stack executed as a ``k``-stage GPipe schedule over ``axis_name``
    (``k`` = that mesh axis's size; ``cfg.n_layer`` must divide by it).

    ``n_micro``: microbatch count (default ``k``; the batch must divide
    by it).  ``params``: the ``{"params": ...}`` tree (or its inner dict)
    from ``MambaLM.init`` — stacking to the stage-sharded layout happens
    here, differentiably, so ``jax.grad`` of a loss through this function
    yields gradients in the ORIGINAL per-layer tree.  Returns
    (B, L, padded_vocab) logits.
    """
    from vivim_tpu.nn import lm as lm_lib

    p = params["params"] if "params" in params else params
    k = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    if cfg.n_layer % k:
        raise ValueError(
            f"n_layer {cfg.n_layer} not divisible by {axis_name} axis "
            f"size {k}")
    n_micro = k if n_micro is None else n_micro
    B = tokens.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro {n_micro}")

    apply_norm = lm_lib.norm_fn_for(cfg)
    emb = p["embedding"]
    dtype = emb.dtype
    h = emb[tokens]
    if getattr(cfg, "residual_in_fp32", False):
        h = h.astype(jnp.float32)

    def layer_fn(lp, h):
        res = h
        out, _, _ = streaming.mamba_prefill(
            lp["mixer"], apply_norm(lp["norm"], h).astype(dtype),
            implementation=implementation)
        return res + out.astype(res.dtype)

    stacked = stack_pipeline_params(p, cfg.n_layer, k)
    x_mb = h.reshape(n_micro, B // n_micro, *h.shape[1:])
    body = functools.partial(
        _pipeline_island, axis_name=axis_name, n_stages=k, n_micro=n_micro,
        layers_per_stage=cfg.n_layer // k, layer_fn=layer_fn)
    mb_spec = P(None, batch_axis, None, None)
    stacked_specs = jax.tree_util.tree_map(lambda _: P(axis_name), stacked)
    y_mb = _shard_map(body, mesh, (stacked_specs, mb_spec), mb_spec)(
        stacked, x_mb)
    h = y_mb.reshape(B, *y_mb.shape[2:])
    h = apply_norm(p["norm_f"], h).astype(dtype)
    return h @ emb.T
