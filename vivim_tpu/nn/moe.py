"""Mixture-of-Experts FFN + MoE-Mamba LM (expert-parallel capability).

The reference has no MoE anywhere; this is a beyond-reference capability
that completes the parallelism matrix (dp / sp / tp / zero / pp / **ep**)
for the LM stack.  The design is the GShard/Switch dense-dispatch recipe,
which is the TPU-native formulation: routing is expressed as one-hot
dispatch/combine einsums — static shapes, MXU-friendly matmuls, no
scatter/gather with data-dependent shapes (which XLA cannot tile) — and
under expert-parallel sharding the (tokens -> experts) einsum boundary is
exactly where the all_to_all lives.

Pieces:

- ``moe_ffn(params, x, ...)`` — functional Switch/GShard FFN: top-k
  token-choice routing with a static per-expert capacity
  ``C = ceil(capacity_factor * T / E)``, dropped-token passthrough (a
  token over capacity contributes zero FFN output — its residual carries
  it), gate-weighted combine, and the Switch load-balancing auxiliary
  loss ``E * Σ_e f_e · P_e`` (Fedus et al. 2021, eq. 4-6).
- ``SwitchFFN`` — flax wrapper owning the router/expert params.
- ``MoEMambaLM`` — MoE-Mamba-style interleave (Pióro et al. 2024): the
  ``MambaLM`` block stack with a prenorm MoE FFN block appended after
  every ``moe_every``-th mixer.  Returns ``(logits, aux_loss)``.

Expert parallelism lives in ``vivim_tpu/parallel/expert.py``: stacked
expert weights shard ``P("expert")`` and each device runs only its own
experts' FFNs inside a shard_map island.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from vivim_tpu.nn.mamba import MambaV3


def moe_capacity(n_tokens: int, n_experts: int,
                 capacity_factor: float) -> int:
    """Static per-expert token capacity (Switch eq. 3)."""
    return max(1, math.ceil(capacity_factor * n_tokens / n_experts))


def moe_dispatch(router_probs, capacity: int, top_k: int = 1):
    """Token-choice top-k routing with per-expert capacity.

    ``router_probs`` (T, E) softmax probabilities.  Returns
    ``(dispatch, combine, aux_loss)``:

    - ``dispatch`` (T, E, C) one-hot: token t occupies slot c of expert e
      (zero where the token was dropped for capacity, or e not chosen);
    - ``combine`` (T, E, C): dispatch weighted by the token's gate for
      that expert, renormalized over the experts that actually kept it
      (GShard top-2 gating; for top_k=1 this is the raw Switch gate);
    - ``aux_loss``: Switch load-balance loss from the top-1 assignment,
      ``E * Σ_e f_e · P_e`` — differentiable through P_e.

    Capacity slots fill in token order, continuing across the k rounds
    (round 1's assignments occupy slots before round 2's), matching the
    GShard serial-assignment semantics.
    """
    T, E = router_probs.shape
    masked = router_probs
    fill = jnp.zeros((E,), jnp.int32)  # slots used so far, per expert
    dispatch = jnp.zeros((T, E, capacity), router_probs.dtype)
    gates = jnp.zeros((T, E), router_probs.dtype)
    aux_loss = jnp.asarray(0.0, router_probs.dtype)
    for k in range(top_k):
        choice = jnp.argmax(masked, axis=-1)              # (T,)
        oh = jax.nn.one_hot(choice, E, dtype=router_probs.dtype)
        if k == 0:
            # Switch aux loss: fraction routed to e (top-1) x mean prob
            f = oh.mean(0)
            P = router_probs.mean(0)
            aux_loss = E * jnp.sum(f * P)
        # slot index of token t within its chosen expert, offset by the
        # slots earlier rounds already filled
        pos = (jnp.cumsum(oh, axis=0) - oh) + fill[None, :]
        pos_t = jnp.sum(pos * oh, axis=-1)                # (T,)
        keep = (pos_t < capacity).astype(router_probs.dtype)
        slot = jax.nn.one_hot(pos_t.astype(jnp.int32), capacity,
                              dtype=router_probs.dtype)   # (T, C)
        dispatch = dispatch + (oh * keep[:, None])[:, :, None] * slot[:, None, :]
        gates = gates + oh * keep[:, None] * router_probs
        fill = fill + jnp.sum(oh * keep[:, None], axis=0).astype(jnp.int32)
        masked = masked * (1.0 - oh)                      # next-best expert
    denom = jnp.maximum(gates.sum(-1, keepdims=True), 1e-9)
    norm = gates / denom if top_k > 1 else gates
    combine = dispatch * norm[:, :, None]
    return dispatch, combine, aux_loss


def expert_ffn(wi, wo, x):
    """Per-expert GELU MLP on stacked weights: (E, C, M) -> (E, C, M).

    ``wi`` (E, M, F), ``wo`` (E, F, M).  Kept as its own function so the
    expert-parallel island (parallel/expert.py) can run it on LOCAL
    expert shards — this is the only part of the MoE whose FLOPs and
    weights scale with E.
    """
    h = jnp.einsum("ecm,emf->ecf", x, wi.astype(x.dtype))
    h = jax.nn.gelu(h)
    return jnp.einsum("ecf,efm->ecm", h, wo.astype(x.dtype))


def moe_ffn(params, x, *, capacity_factor: float = 1.25, top_k: int = 1,
            expert_apply=None):
    """Functional MoE FFN: x (..., M) -> (y (..., M), aux_loss).

    ``params``: ``{"router_kernel": (M, E), "wi": (E, M, F),
    "wo": (E, F, M)}``.  ``expert_apply(wi, wo, expert_in)`` overrides the
    stacked-expert execution — the hook ``parallel.expert.ep_moe_ffn``
    uses to run experts sharded; default is the dense local
    ``expert_ffn``.  Router math runs in fp32 (small, and argmax/softmax
    stability matters more than its FLOPs).
    """
    expert_apply = expert_apply or expert_ffn
    M = x.shape[-1]
    lead = x.shape[:-1]
    xt = x.reshape(-1, M)
    T = xt.shape[0]
    E = params["router_kernel"].shape[1]
    logits = xt.astype(jnp.float32) @ params["router_kernel"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    C = moe_capacity(T, E, capacity_factor)
    dispatch, combine, aux = moe_dispatch(probs, C, top_k=top_k)
    dispatch = dispatch.astype(x.dtype)
    combine = combine.astype(x.dtype)
    expert_in = jnp.einsum("tec,tm->ecm", dispatch, xt)
    expert_out = expert_apply(params["wi"], params["wo"], expert_in)
    yt = jnp.einsum("tec,ecm->tm", combine, expert_out)
    return yt.reshape(*lead, M), aux.astype(jnp.float32)


class SwitchFFN(nn.Module):
    """Flax MoE FFN block: ``x -> (y, aux_loss)``; params as ``moe_ffn``."""

    n_experts: int
    d_ff: int
    capacity_factor: float = 1.25
    top_k: int = 1

    @nn.compact
    def __call__(self, x):
        M = x.shape[-1]
        params = {
            "router_kernel": self.param(
                "router_kernel", nn.initializers.normal(0.02),
                (M, self.n_experts)),
            "wi": self.param("wi", nn.initializers.normal(0.02),
                             (self.n_experts, M, self.d_ff)),
            "wo": self.param("wo", nn.initializers.normal(0.02),
                             (self.n_experts, self.d_ff, M)),
        }
        return moe_ffn(params, x, capacity_factor=self.capacity_factor,
                       top_k=self.top_k)


@dataclasses.dataclass(frozen=True)
class MoEMambaLMConfig:
    vocab_size: int
    d_model: int = 768
    n_layer: int = 24
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    pad_vocab_multiple: int = 8
    initializer_range: float = 0.02
    rms_norm: bool = False
    norm_epsilon: float = 1e-5
    # MoE interleave (MoE-Mamba: an MoE FFN block after every mixer;
    # moe_every=2 halves that, etc.  0 disables -> plain MambaLM stack)
    moe_every: int = 1
    n_experts: int = 8
    d_ff: int | None = None  # default 4*d_model
    capacity_factor: float = 1.25
    top_k: int = 1
    aux_loss_weight: float = 1e-2

    @property
    def padded_vocab(self):
        m = self.pad_vocab_multiple
        return ((self.vocab_size + m - 1) // m) * m


class MoEMambaLM(nn.Module):
    """MoE-Mamba: ``MambaLM`` with interleaved Switch-MoE FFN blocks.

    ``tokens (B, L) -> (logits (B, L, padded_vocab), aux_loss)`` where
    ``aux_loss`` is the summed Switch load-balance loss over all MoE
    blocks (add ``cfg.aux_loss_weight * aux`` to the training loss).
    """

    cfg: MoEMambaLMConfig
    scan_implementation: str | None = None

    def _norm(self, name):
        if self.cfg.rms_norm:
            return nn.RMSNorm(epsilon=self.cfg.norm_epsilon, name=name)
        return nn.LayerNorm(epsilon=self.cfg.norm_epsilon, name=name)

    @nn.compact
    def __call__(self, tokens):
        cfg = self.cfg
        emb = self.param(
            "embedding", nn.initializers.normal(cfg.initializer_range),
            (cfg.padded_vocab, cfg.d_model))
        h = emb[tokens]
        dtype = h.dtype
        aux_total = jnp.asarray(0.0, jnp.float32)
        d_ff = cfg.d_ff or 4 * cfg.d_model
        for i in range(cfg.n_layer):
            res = h
            hn = self._norm(f"norm_{i}")(h).astype(dtype)
            out = MambaV3(
                d_model=cfg.d_model, d_state=cfg.d_state,
                d_conv=cfg.d_conv, expand=cfg.expand, bimamba_type="none",
                scan_implementation=self.scan_implementation,
                name=f"mixer_{i}")(hn)
            h = res + out.astype(res.dtype)
            if cfg.moe_every and (i + 1) % cfg.moe_every == 0:
                res = h
                hn = self._norm(f"moe_norm_{i}")(h).astype(dtype)
                y, aux = SwitchFFN(
                    n_experts=cfg.n_experts, d_ff=d_ff,
                    capacity_factor=cfg.capacity_factor, top_k=cfg.top_k,
                    name=f"moe_{i}")(hn)
                h = res + y.astype(res.dtype)
                aux_total = aux_total + aux
        h = self._norm("norm_f")(h).astype(dtype)
        return h @ emb.T, aux_total
