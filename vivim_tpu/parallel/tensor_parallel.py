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
from vivim_tpu.parallel.mesh import shard_map_compat as _shard_map


def _mixer_local(x, w_x, w_z, b_x, b_z, conv_w, conv_b, x_proj, dt_proj,
                 dt_bias, A_log, D, out_proj, b_out, *, axis_name, dt_rank,
                 dstate, implementation):
    """Per-shard mixer body: everything per-channel is a d_inner/k slice."""
    dtype = x.dtype
    x_l = jnp.einsum("bld,ed->ble", x, w_x.astype(dtype)) + b_x.astype(dtype)
    z_l = jnp.einsum("bld,ed->ble", x, w_z.astype(dtype)) + b_z.astype(dtype)
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
    # row-parallel out_proj: partial products all-reduced over the TP axis;
    # the (replicated) output bias is added once, after the psum
    out = jnp.einsum("bld,od->blo", y_l, out_proj.astype(y_l.dtype))
    return jax.lax.psum(out, axis_name) + b_out.astype(y_l.dtype)


def tp_mamba_mixer(params, x, mesh: Mesh, axis_name: str = "model",
                   batch_axis: str | None = None, implementation=None):
    """Run one single-direction Mamba mixer tensor-parallel over ``mesh``.

    ``params``: the flax param dict of a ``MambaV3(bimamba_type="none")``
    (in_proj_kernel, conv1d_kernel/bias, x_proj_kernel, dt_proj_kernel/bias,
    A_log, D, out_proj_kernel, optional in_proj_bias/out_proj_bias from
    ``bias=True`` modules) — the SAME tree the unsharded module uses;
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
    dtype = in_proj.dtype
    conv_b = params.get("conv1d_bias")
    if conv_b is None:
        conv_b = jnp.zeros((d_inner,), params["conv1d_kernel"].dtype)
    in_b = params.get("in_proj_bias")
    if in_b is None:
        in_b = jnp.zeros((2 * d_inner,), dtype)
    b_x, b_z = in_b[:d_inner], in_b[d_inner:]  # column-parallel halves
    b_out = params.get("out_proj_bias")
    if b_out is None:
        b_out = jnp.zeros((params["out_proj_kernel"].shape[0],), dtype)
    rep = P()  # out bias is a (d_model,) global vector, added post-psum
    return _shard_map(
        body, mesh,
        (x_spec, col, col, chan, chan, conv_spec, chan, row, col, chan, col,
         chan, row, rep),
        x_spec,
    )(x, w_x, w_z, b_x, b_z, params["conv1d_kernel"], conv_b,
      params["x_proj_kernel"], params["dt_proj_kernel"],
      params["dt_proj_bias"], params["A_log"], params["D"],
      params["out_proj_kernel"], b_out)


def _tp_in_proj(mp, x):
    """Column-parallel in_proj from the pre-split x/z kernel slices."""
    xw = x @ mp["in_proj_x"].T.astype(x.dtype)
    z = x @ mp["in_proj_z"].T.astype(x.dtype)
    if "in_proj_bias_x" in mp:
        xw = xw + mp["in_proj_bias_x"].astype(x.dtype)
        z = z + mp["in_proj_bias_z"].astype(x.dtype)
    return xw, z


def _tp_out_bias(mp, out):
    """Replicated out_proj bias, added once after the psum."""
    if "out_proj_bias" in mp:
        out = out + mp["out_proj_bias"].astype(out.dtype)
    return out


def tp_mixer_prefill(mp, x, *, axis_name, implementation=None):
    """TP twin of ``nn.streaming.mamba_prefill``: local channel slice,
    psum'd dt/B/C and output; emitted conv/ssm states are the LOCAL shard
    (consumed only by ``tp_mixer_step`` inside the same island)."""
    xw, z = _tp_in_proj(mp, x)
    conv_w = mp["conv1d_kernel"]
    width = conv_w.shape[0]
    pad = jnp.pad(xw, ((0, 0), (max(width - x.shape[1], 0), 0), (0, 0)))
    conv_state = pad[:, -width:, :]
    xc = causal_conv1d(xw, conv_w, mp.get("conv1d_bias"), "silu")
    x_dbl = jnp.einsum("bld,rd->blr", xc, mp["x_proj_kernel"])
    x_dbl = jax.lax.psum(x_dbl, axis_name)
    dt_rank = mp["dt_proj_kernel"].shape[1]
    n = mp["A_log"].shape[1]
    delta = jnp.einsum("blr,dr->bld", x_dbl[..., :dt_rank],
                       mp["dt_proj_kernel"])
    Bv = x_dbl[..., dt_rank:dt_rank + n]
    Cv = x_dbl[..., dt_rank + n:]
    y, ssm_state = selective_scan(
        xc, delta, -jnp.exp(mp["A_log"].astype(jnp.float32)), Bv, Cv,
        D=mp["D"].astype(jnp.float32), z=z,
        delta_bias=mp["dt_proj_bias"].astype(jnp.float32),
        delta_softplus=True, return_last_state=True,
        implementation=implementation)
    out = jnp.einsum("bld,od->blo", y, mp["out_proj_kernel"].astype(y.dtype))
    return _tp_out_bias(mp, jax.lax.psum(out, axis_name)), conv_state, ssm_state


def tp_mixer_step(mp, x, conv_state, ssm_state, *, axis_name):
    """TP twin of ``nn.streaming.mamba_step`` over local channel shards."""
    from vivim_tpu.kernels.causal_conv1d import causal_conv1d_update
    from vivim_tpu.kernels.refs import selective_state_update_ref

    xw, z = _tp_in_proj(mp, x)
    xw, conv_state = causal_conv1d_update(
        xw, conv_state, mp["conv1d_kernel"], mp.get("conv1d_bias"), "silu")
    x_dbl = jax.lax.psum(xw @ mp["x_proj_kernel"].T, axis_name)
    dt_rank = mp["dt_proj_kernel"].shape[1]
    n = mp["A_log"].shape[1]
    dt = x_dbl[..., :dt_rank] @ mp["dt_proj_kernel"].T
    Bv = x_dbl[..., dt_rank:dt_rank + n]
    Cv = x_dbl[..., dt_rank + n:]
    y, ssm_state = selective_state_update_ref(
        ssm_state, xw, dt, -jnp.exp(mp["A_log"].astype(jnp.float32)),
        Bv, Cv, D=mp["D"].astype(jnp.float32), z=z,
        dt_bias=mp["dt_proj_bias"].astype(jnp.float32), dt_softplus=True)
    out = y @ mp["out_proj_kernel"].T.astype(y.dtype)
    return _tp_out_bias(mp, jax.lax.psum(out, axis_name)), conv_state, ssm_state


def _split_tp_param_tree(p, axis_name):
    """Params tree with each mixer's fused in_proj split into x/z halves,
    plus the matching shard_map spec tree (mixer leaves channel-sharded,
    everything else replicated)."""
    mixer_specs = {
        "in_proj_x": P(axis_name, None), "in_proj_z": P(axis_name, None),
        "in_proj_bias_x": P(axis_name), "in_proj_bias_z": P(axis_name),
        "conv1d_kernel": P(None, axis_name), "conv1d_bias": P(axis_name),
        "x_proj_kernel": P(None, axis_name),
        "dt_proj_kernel": P(axis_name, None), "dt_proj_bias": P(axis_name),
        "A_log": P(axis_name, None), "D": P(axis_name),
        "out_proj_kernel": P(None, axis_name),
        "out_proj_bias": P(),  # global (d_model,) vector, added post-psum
    }
    tree = {k: dict(v) if hasattr(v, "keys") else v for k, v in p.items()}
    specs = {}
    for k, v in tree.items():
        if k.startswith("mixer_"):
            ip = v.pop("in_proj_kernel")
            d_inner = v["A_log"].shape[0]
            v["in_proj_x"], v["in_proj_z"] = ip[:d_inner], ip[d_inner:]
            if "in_proj_bias" in v:
                ib = v.pop("in_proj_bias")
                v["in_proj_bias_x"] = ib[:d_inner]
                v["in_proj_bias_z"] = ib[d_inner:]
            unknown = sorted(set(v) - set(mixer_specs))
            if unknown:
                raise ValueError(
                    f"TP has no sharding rule for mixer param(s) {unknown} "
                    f"in {k} — supported: single-direction MambaV3 trees "
                    f"({sorted(mixer_specs)})")
            specs[k] = {name: mixer_specs[name] for name in v}
        else:
            specs[k] = jax.tree_util.tree_map(lambda _: P(), v)
    return tree, specs


def tp_generate(model, params, tokens, max_new_tokens, mesh: Mesh,
                axis_name: str = "model", rng=None, temperature=1.0,
                top_k=0, top_p=1.0, eos_token_id=None, implementation=None):
    """Tensor-parallel decode: ``nn.lm.generate``'s prefill + lax.scan
    token loop running inside ONE shard_map island with every mixer
    channel-sharded over ``axis_name``.

    The carried (conv_state, ssm_state) decode cache lives sharded on the
    island's devices for the whole generation — 1/k of the cache HBM per
    device, two tiny psums per layer per token.  Sampling is bitwise
    identical on every shard (replicated rng + psum'd logits), so the
    emitted tokens are replicated.  Same signature semantics as
    ``generate``; returns (B, L0 + max_new_tokens) tokens.
    """
    import functools

    from vivim_tpu.nn import lm as lm_lib

    d_inner = model.cfg.expand * model.cfg.d_model
    k = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    if d_inner % k:
        raise ValueError(f"d_inner {d_inner} not divisible by "
                         f"{axis_name} axis size {k}")
    p = params["params"] if "params" in params else params
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tree, specs = _split_tp_param_tree(p, axis_name)

    prefill = functools.partial(tp_mixer_prefill, axis_name=axis_name,
                                implementation=implementation)
    step = functools.partial(tp_mixer_step, axis_name=axis_name)

    def island(p_local, toks, key):
        return lm_lib.generate(
            model, {"params": p_local}, toks, max_new_tokens, rng=key,
            temperature=temperature, top_k=top_k, top_p=top_p,
            eos_token_id=eos_token_id, mixer_prefill=prefill,
            mixer_step=step)

    return _shard_map(island, mesh, (specs, P(), P()), P())(
        tree, tokens, rng)


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
    from vivim_tpu.nn import lm as lm_lib

    p = params["params"] if "params" in params else params
    apply_norm = lm_lib.norm_fn_for(cfg)
    emb = p["embedding"]
    dtype = emb.dtype
    h = emb[tokens]
    if getattr(cfg, "residual_in_fp32", False):
        h = h.astype(jnp.float32)
    for i in range(cfg.n_layer):
        res = h
        h = apply_norm(p[f"norm_{i}"], h).astype(dtype)
        h = tp_mamba_mixer(p[f"mixer_{i}"], h, mesh, axis_name=axis_name,
                           batch_axis=batch_axis,
                           implementation=implementation)
        h = res + h.astype(res.dtype)
    h = apply_norm(p["norm_f"], h).astype(dtype)
    return h @ emb.T
