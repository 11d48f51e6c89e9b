"""Tri-directional Mamba mixer (bimamba v3) and the Vivim MambaLayer.

Re-design of the reference Mamba module
(/root/reference/mamba/mamba_ssm/modules/mamba_simple.py):

- ``MambaV3``: the SSM mixer with three parameter sets — forward temporal,
  backward temporal (suffix ``_b``) and spatial (suffix ``_s``)
  (mamba_simple.py:125-181).  Forward pass (mamba_simple.py:204-264):
  one fused in_proj matmul produces xz; three fused inner scans run over
  (a) the token sequence, (b) the flipped sequence, (c) the
  frame-major -> position-major permuted sequence (so the scan walks
  *across frames* at a fixed spatial position); outputs are averaged and
  projected out.  ``bimamba_type`` in {"none", "v2", "v3"} covers the
  vendored package's modes; Vivim always uses "v3".
- The reference hard-codes ``nframes=5`` (mamba_simple.py:54) which forces
  seqlen % 5 == 0; here the true clip length is a call argument.
- Parameter init matches mamba_simple.py:89-121: dt_proj weight
  U(+-dt_rank^-0.5 * dt_scale), dt_proj bias = softplus^-1 of a log-uniform
  timestep in [dt_min, dt_max] floored at dt_init_floor; A_log = log(1..N)
  per channel (S4D-real); D = 1.  A_log and D are fp32 no-weight-decay
  parameters.
- ``MambaLayer``: Vivim's prenorm residual block
  (/root/reference/modeling/vivim.py:111-159):
  ``x + DropPath(Mamba(LN(x)))`` then ``x + DropPath(Mlp(LN(x)))`` over
  flattened (B, T*H*W, C) tokens.

Streaming single-token decode lives in ``vivim_tpu.nn.streaming``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from vivim_tpu.kernels.mamba_inner import mamba_inner, mamba_inner_grouped
from vivim_tpu.nn.layers import DropPath, Mlp, torch_linear_init


def _dt_bias_init(dt_min, dt_max, dt_init_floor):
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min))
            + math.log(dt_min)
        )
        dt = jnp.maximum(dt, dt_init_floor)
        # inverse of softplus
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


def _a_log_init(d_state):
    def init(key, shape, dtype=jnp.float32):
        del key
        d_inner = shape[0]
        a = jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32)[None, :],
                     (d_inner, 1))
        return jnp.log(a).astype(dtype)

    return init


def _conv_init(width):
    """torch Conv1d default for depthwise: U(+-sqrt(1/width))."""
    bound = math.sqrt(1.0 / width)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def frame_to_position_major(x, nframes: int):
    """(B, T*S, C) frame-major tokens -> (B, S*T, C) position-major.

    Equivalent to the reference's chunk/stack/flatten at
    mamba_simple.py:245-247: the scan then runs across frames at a fixed
    spatial position.
    """
    B, L, C = x.shape
    S = L // nframes
    return x.reshape(B, nframes, S, C).transpose(0, 2, 1, 3).reshape(B, L, C)


def position_to_frame_major(x, nframes: int):
    """Inverse of frame_to_position_major (mamba_simple.py:261)."""
    B, L, C = x.shape
    S = L // nframes
    return x.reshape(B, S, nframes, C).transpose(0, 2, 1, 3).reshape(B, L, C)


class MambaV3(nn.Module):
    """Selective-SSM mixer with optional bi/tri-directional scans."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | None = None  # None -> ceil(d_model / 16)
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    bimamba_type: str = "v3"
    scan_implementation: str | None = None  # None -> pallas on TPU
    # recompute the conv+projection chain in the backward (CUDA
    # checkpoint_lvl=1 behavior).  Off by default: on TPU the recompute
    # costs ~10% of a train step and the saved activations are cheap
    # relative to HBM (see kernels/mamba_inner.py module doc).
    remat_pre_scan: bool = False
    # long-clip mode: shard the token axis over this named mesh axis — the
    # scan runs as a sequence-parallel shard_map island
    # (parallel/seq_scan.py) while the flip / frame<->position permutes and
    # the conv+projection chain stay plain pjit ops (GSPMD inserts the
    # halo/reshard collectives).
    seq_axis: str | None = None
    mesh: jax.sharding.Mesh | None = None

    @property
    def d_inner(self):
        return self.expand * self.d_model

    @property
    def _dt_rank(self):
        return self.dt_rank or math.ceil(self.d_model / 16)

    def _direction_params(self, suffix: str):
        """One directional scan's parameter set (conv, projections, A, D)."""
        d_inner, n, rank = self.d_inner, self.d_state, self._dt_rank
        dt_std = rank**-0.5 * self.dt_scale
        p = {
            "conv_w": self.param(f"conv1d{suffix}_kernel",
                                 _conv_init(self.d_conv),
                                 (self.d_conv, d_inner)),
            "conv_b": (self.param(f"conv1d{suffix}_bias",
                                  _conv_init(self.d_conv), (d_inner,))
                       if self.conv_bias else None),
            "x_proj": self.param(f"x_proj{suffix}_kernel",
                                 torch_linear_init(),
                                 (rank + 2 * n, d_inner)),
            "dt_proj": self.param(
                f"dt_proj{suffix}_kernel",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -dt_std, dt_std),
                (d_inner, rank)),
            "dt_bias": self.param(
                f"dt_proj{suffix}_bias",
                _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
                (d_inner,)),
            "A_log": self.param(f"A{suffix}_log", _a_log_init(n), (d_inner, n)),
            "D": self.param(f"D{suffix}", nn.initializers.ones, (d_inner,)),
        }
        return p

    def _scan(self, xz, p):
        return mamba_inner(
            xz,
            p["conv_w"],
            p["conv_b"],
            p["x_proj"],
            p["dt_proj"],
            -jnp.exp(p["A_log"].astype(jnp.float32)),
            D=p["D"].astype(jnp.float32),
            delta_bias=p["dt_bias"].astype(jnp.float32),
            delta_softplus=True,
            implementation=self.scan_implementation,
            remat=self.remat_pre_scan,
            seq_axis=self.seq_axis,
            mesh=self.mesh,
        )

    @nn.compact
    def __call__(self, x, nframes: int = 1):
        """x: (B, L, d_model) frame-major tokens (L = nframes * H * W).

        Returns (B, L, d_model).
        """
        B, L, _ = x.shape
        d_inner = self.d_inner

        in_proj = self.param("in_proj_kernel", torch_linear_init(),
                             (2 * d_inner, self.d_model))
        if self.bias:
            in_bias = self.param("in_proj_bias", nn.initializers.zeros,
                                 (2 * d_inner,))
        xz = jnp.einsum("bld,ed->ble", x, in_proj.astype(x.dtype))
        if self.bias:
            xz = xz + in_bias[None, None, :]

        if self.bimamba_type == "v3":
            # Batched tri-directional path: the three directional sequences
            # (forward / time-flipped / spatial-permuted) and their parameter
            # sets stack along the batch axis, so the whole mixer needs ONE
            # conv+projection einsum chain and ONE Pallas scan invocation
            # (the reference runs the CUDA pipeline three times,
            # mamba_simple.py:215-260).
            if L % nframes:
                raise ValueError(
                    f"seqlen {L} not divisible by nframes {nframes}")
            p_f = self._direction_params("")
            p_b = self._direction_params("_b")
            p_s = self._direction_params("_s")
            stack = lambda key: jnp.stack(
                [p_f[key], p_b[key], p_s[key]], axis=0)
            xz_all = jnp.concatenate(
                [xz, jnp.flip(xz, axis=1),
                 frame_to_position_major(xz, nframes)], axis=0)
            out_all = mamba_inner_grouped(
                xz_all, stack("conv_w"), stack("conv_b"), stack("x_proj"),
                stack("dt_proj"), stack("A_log"), stack("D"),
                stack("dt_bias"), nb=B,
                implementation=self.scan_implementation,
                remat=self.remat_pre_scan,
                seq_axis=self.seq_axis, mesh=self.mesh)
            out_f, out_b, out_s = jnp.split(out_all, 3, axis=0)
            out = (out_f + jnp.flip(out_b, axis=1)
                   + position_to_frame_major(out_s, nframes)) / 3.0
        else:
            p_f = self._direction_params("")
            out = self._scan(xz, p_f)
            if self.bimamba_type == "v2":
                p_b = self._direction_params("_b")
                out_b = self._scan(jnp.flip(xz, axis=1), p_b)
                # the reference v2 path does NOT average (mamba_simple.py:294)
                out = out + jnp.flip(out_b, axis=1)

        out_proj = self.param("out_proj_kernel", torch_linear_init(),
                              (self.d_model, d_inner))
        y = jnp.einsum("bld,od->blo", out, out_proj.astype(out.dtype))
        if self.bias:
            out_bias = self.param("out_proj_bias", nn.initializers.zeros,
                                  (self.d_model,))
            y = y + out_bias[None, None, :]
        return y


class MambaLayer(nn.Module):
    """Vivim block: prenorm Mamba + prenorm Mix-FFN, with DropPath."""

    dim: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    drop_path: float = 0.0
    scan_implementation: str | None = None
    gelu_approximate: bool = False  # exact erf by default (torch parity)
    remat_pre_scan: bool = False
    seq_axis: str | None = None
    mesh: jax.sharding.Mesh | None = None

    @nn.compact
    def __call__(self, x, nframes: int, H: int, W: int,
                 deterministic: bool = True):
        """x: (B, L, C) tokens with L = nframes * H * W."""
        if self.seq_axis is not None and self.mesh is not None:
            axis_sizes = dict(zip(self.mesh.axis_names,
                                  self.mesh.devices.shape))
            n_shards = axis_sizes[self.seq_axis]
            if x.shape[1] % n_shards == 0:
                # keep the token axis sharded over seq between blocks; on a
                # hybrid ("data", "seq") mesh the batch dim must keep its
                # 'data' sharding too — constraining it to None (replicated)
                # fights the incoming batch sharding, forcing the SPMD
                # partitioner through its replicate-and-repartition fallback
                # (measured: wrong depthwise-conv kernel grads, an exact
                # n_seq_shards-times overcount, besides the perf hit)
                batch_axis = next(
                    (a for a in self.mesh.axis_names if a != self.seq_axis
                     and x.shape[0] % axis_sizes[a] == 0), None)
                x = jax.lax.with_sharding_constraint(
                    x, jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec(
                            batch_axis, self.seq_axis, None)))
        mamba = MambaV3(
            d_model=self.dim,
            d_state=self.d_state,
            d_conv=self.d_conv,
            expand=self.expand,
            bimamba_type="v3",
            scan_implementation=self.scan_implementation,
            remat_pre_scan=self.remat_pre_scan,
            seq_axis=self.seq_axis,
            mesh=self.mesh,
            name="mamba",
        )
        drop_path = DropPath(self.drop_path)
        # torch nn.LayerNorm default eps=1e-5 (reference vivim.py:147,153),
        # not flax's 1e-6
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + drop_path(mamba(h, nframes=nframes), deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        mlp = Mlp(self.dim, int(self.dim * self.mlp_ratio),
                  dropout_rate=self.dropout_rate,
                  gelu_approximate=self.gelu_approximate, name="mlp")
        x = x + drop_path(mlp(h, nframes, H, W, deterministic), deterministic)
        return x
