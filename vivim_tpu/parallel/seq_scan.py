"""Sequence-sharded selective scan over a device mesh axis.

The SSM analogue of ring attention (SURVEY.md §2.5/§5): for clips too long
for one chip, the T*H*W token sequence is sharded across a ``seq`` mesh
axis and the (dim x dstate) scan state is carried across devices.  The
decomposition mirrors the kernel's own chunked structure, one level up:

1. each shard runs the local chunked Pallas scan from a zero state and
   computes its total decay ``A_prod = exp(A * sum_t delta'_t)`` (a cheap
   O(L_local) reduction — no extra kernel output needed);
2. the per-shard carries ``(A_prod, last_state)`` combine under the scan
   pair rule ``(a2,b2)∘(a1,b1) = (a1*a2, a2*b1+b2)``; an all-gather of the
   tiny (B, dim, N) carries followed by a local exclusive prefix gives each
   shard its true initial state (collective cost: one all-gather of
   n_shards * B*dim*N floats over ICI);
3. each shard re-runs the scan with ``initial_state`` set — two scan passes
   total, fully parallel across the axis.

``delta_softplus`` is assumed True (the only mode Vivim uses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vivim_tpu.kernels.selective_scan import selective_scan


def _combine(a1, b1, a2, b2):
    return a1 * a2, a2 * b1 + b2


def seq_sharded_selective_scan_local(
    u, delta, A, B, C, D=None, z=None, delta_bias=None,
    axis_name: str = "seq", implementation=None,
):
    """Body to run inside shard_map: all (B, L_local, ...) args are the
    local sequence shards; returns the local (B, L_local, dim) outputs and
    the global last state (replicated).
    """
    n_shards = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    dp = delta.astype(jnp.float32)
    if delta_bias is not None:
        bias = delta_bias.astype(jnp.float32)
        # (dim,) shared or (batch, dim) per-batch (tri-directional stacks)
        dp = dp + (bias[:, None, :] if bias.ndim == 2 else bias[None, None, :])
    dp = jax.nn.softplus(dp)
    # total decay of this shard: exp(A * sum_t delta') — (B, dim, N)
    Af = A.astype(jnp.float32)
    if Af.ndim == 2:
        Af = Af[None]
    a_prod = jnp.exp(Af * jnp.sum(dp, axis=1)[:, :, None])

    _, local_last = selective_scan(
        u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
        delta_softplus=True, return_last_state=True,
        implementation=implementation)

    # gather all shards' carries; exclusive prefix for this shard
    all_a = jax.lax.all_gather(a_prod, axis_name)      # (S, B, dim, N)
    all_b = jax.lax.all_gather(local_last, axis_name)  # (S, B, dim, N)

    def prefix_step(carry, ab):
        ca, cb = carry
        a, b = ab
        return _combine(ca, cb, a, b), (ca, cb)  # emit EXCLUSIVE prefix

    init = (jnp.ones_like(a_prod), jnp.zeros_like(local_last))
    (_, _), (pref_a, pref_b) = jax.lax.scan(prefix_step, init, (all_a, all_b))
    h_in = pref_b[idx]  # exclusive prefix state for this shard

    y, last = selective_scan(
        u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
        delta_softplus=True, return_last_state=True, initial_state=h_in,
        implementation=implementation)
    # global last state = last shard's corrected last; combine locally
    ga, gb = _combine(pref_a[n_shards - 1], pref_b[n_shards - 1],
                      all_a[n_shards - 1], all_b[n_shards - 1])
    del ga
    return y, gb


def seq_sharded_selective_scan(
    u, delta, A, B, C, D=None, z=None, delta_bias=None,
    mesh: Mesh | None = None, axis_name: str = "seq", implementation=None,
):
    """shard_map wrapper: shards the L axis of u/delta/B/C/z over
    ``axis_name`` and returns the full (gathered) outputs.

    Hybrid DP x seq: if ``mesh`` carries a second axis (e.g.
    ``Mesh(devices.reshape(dp, seq), ("data", "seq"))``), the batch
    dimension is sharded over it inside the island too, so data-parallel
    batch shards stay local instead of being all-gathered at the island
    boundary.  The 'seq' collectives are unaffected — each data row of the
    mesh carries its own scan state ring.
    """
    from vivim_tpu.parallel.mesh import shard_map_compat

    # any other mesh axis shards the batch dim (hybrid DP x seq) — but only
    # if the batch divides it (shard_map specs require even shards; an
    # indivisible batch, e.g. a drop_last=False trailing val batch or the
    # 3x tri-directional stack over an odd 'data' axis, replicates instead,
    # mirroring MambaLayer's constraint guard).  1-D seq-only meshes leave
    # it None (= replicated).
    axis_sizes = (dict(zip(mesh.axis_names, mesh.devices.shape))
                  if mesh is not None else {})
    batch_axis = next((a for a in axis_sizes
                       if a != axis_name and u.shape[0] % axis_sizes[a] == 0),
                      None)
    seq_spec = P(batch_axis, axis_name, None)
    rep = P()
    # per-batch parameter forms (tri-directional stacks) follow the batch
    # sharding; shared forms are replicated
    a_spec = P(batch_axis, None, None) if A.ndim == 3 else rep
    d_spec = (P(batch_axis, None) if (D is not None and D.ndim == 2) else rep)
    bias_spec = (P(batch_axis, None)
                 if (delta_bias is not None and delta_bias.ndim == 2) else rep)
    last_spec = P(batch_axis, None, None)
    body = functools.partial(
        seq_sharded_selective_scan_local, axis_name=axis_name,
        implementation=implementation)

    # optional args (shard_map specs cannot describe None): pass only the
    # present ones and rebuild the keyword set inside
    opt = [("D", D, d_spec), ("z", z, seq_spec),
           ("delta_bias", delta_bias, bias_spec)]
    present = [(name, val, spec) for name, val, spec in opt if val is not None]
    names = [name for name, _, _ in present]

    def wrapped(u, delta, A, B, C, *extras):
        kwargs = dict(zip(names, extras))
        return body(u, delta, A, B, C, **kwargs)

    in_specs = (seq_spec, seq_spec, a_spec, seq_spec, seq_spec,
                *(spec for _, _, spec in present))
    return shard_map_compat(
        wrapped, mesh, in_specs, (seq_spec, last_spec),
    )(u, delta, A, B, C, *(val for _, val, _ in present))
