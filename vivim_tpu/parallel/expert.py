"""Expert parallelism for the MoE FFN (GShard-style, shard_map island).

Completes the parallelism matrix (dp / sp / tp / zero / pp / **ep**);
the reference has no MoE and no expert parallelism (beyond-reference,
like ``tensor_parallel`` and ``pipeline``).

Recipe: only the expert FFNs scale with E — their stacked weights
``wi (E, M, F)`` / ``wo (E, F, M)`` and the dispatched token blocks
``(E, C, M)`` shard ``P("expert")`` over the mesh, so each device holds
and runs ``E/k`` experts.  Router math (a (T, E) softmax) is tiny and
stays replicated, as do the dispatch/combine einsums — at the island
boundary XLA lowers the (replicated tokens -> expert-sharded blocks)
resharding to the all_to_all that defines expert parallelism when the
tokens are themselves sharded.

Composes with data parallelism on a ("data", "expert") mesh: tokens
batch-shard over ``data`` while expert weights shard over ``expert``
(each data shard dispatches to the same expert shards).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

from vivim_tpu.nn import moe as moe_lib
from vivim_tpu.parallel.mesh import shard_map_compat as _shard_map


def ep_expert_apply(mesh: Mesh, axis_name: str = "expert"):
    """An ``expert_apply`` hook for ``moe_ffn`` that runs the stacked
    expert FFNs sharded over ``axis_name``: each device computes only its
    local ``E/k`` experts on their ``(E/k, C, M)`` token blocks.

    E (the leading dim of ``wi``/``wo``/``expert_in``) must divide by the
    ``axis_name`` mesh-axis size.
    """
    k = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]

    def apply(wi, wo, expert_in):
        E = wi.shape[0]
        if E % k:
            raise ValueError(
                f"n_experts {E} not divisible by {axis_name} axis size {k}")
        spec = P(axis_name)
        return _shard_map(moe_lib.expert_ffn, mesh,
                          (spec, spec, spec), spec)(wi, wo, expert_in)

    return apply


def ep_moe_ffn(params, x, mesh: Mesh, axis_name: str = "expert",
               capacity_factor: float = 1.25, top_k: int = 1):
    """Expert-parallel ``moe_ffn``: same params, same outputs, experts
    sharded over ``axis_name``.  Returns ``(y, aux_loss)``."""
    return moe_lib.moe_ffn(
        params, x, capacity_factor=capacity_factor, top_k=top_k,
        expert_apply=ep_expert_apply(mesh, axis_name))


def lm_ep_forward(cfg, params, tokens, mesh: Mesh,
                  axis_name: str = "expert", implementation=None):
    """Expert-parallel ``MoEMambaLM`` forward: same params, same logits
    and aux loss, with every MoE block's experts sharded over
    ``axis_name``.  Mixers and norms run replicated (shard them with
    TP/FSDP orthogonally if needed).

    ``params``: the ``{"params": ...}`` tree (or inner dict) from
    ``MoEMambaLM.init``.  Returns ``(logits (B, L, padded_vocab),
    aux_loss)``.
    """
    import jax.numpy as jnp

    from vivim_tpu.nn import lm as lm_lib, streaming

    p = params["params"] if "params" in params else params
    apply_norm = lm_lib.norm_fn_for(cfg)
    emb = p["embedding"]
    dtype = emb.dtype
    h = emb[tokens]
    aux_total = jnp.asarray(0.0, jnp.float32)
    expert_apply = ep_expert_apply(mesh, axis_name)
    for i in range(cfg.n_layer):
        res = h
        out, _, _ = streaming.mamba_prefill(
            p[f"mixer_{i}"], apply_norm(p[f"norm_{i}"], h).astype(dtype),
            implementation=implementation)
        h = res + out.astype(res.dtype)
        if cfg.moe_every and (i + 1) % cfg.moe_every == 0:
            res = h
            hn = apply_norm(p[f"moe_norm_{i}"], h).astype(dtype)
            y, aux = moe_lib.moe_ffn(
                p[f"moe_{i}"], hn, capacity_factor=cfg.capacity_factor,
                top_k=cfg.top_k, expert_apply=expert_apply)
            h = res + y.astype(res.dtype)
            aux_total = aux_total + aux
    h = apply_norm(p["norm_f"], h).astype(dtype)
    return h @ emb.T, aux_total
