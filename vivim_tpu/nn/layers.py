"""Shared layers: DropPath, 3-D depthwise conv, Mix-FFN style Mlp.

Behavioral contracts from the reference model code
(/root/reference/modeling/vivim.py:57-106 — DWConv/Mlp; timm DropPath used
at vivim.py:125).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def torch_linear_init(scale: float = 1.0 / 3.0):
    """U(-sqrt(1/fan_in), sqrt(1/fan_in)) — PyTorch nn.Linear default."""
    return nn.initializers.variance_scaling(scale, "fan_in", "uniform")


trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0,
                                                     upper=2.0)


def fast_keep_mask(rng, keep: float, shape):
    """Keep-mask from uint8 random bits: ``bits < round(keep*256)``.

    ``jax.random.bernoulli`` draws 32 random bits per element; at the
    decode head's mask sizes (~280M draws/step at the bench config) the
    bit generation alone is ~1.8 ms/step.  uint8 bits are 4x cheaper and
    quantize the keep probability to 1/256 — immaterial for dropout, and
    unbiased because the exact quantized keep is returned for rescaling.

    Returns (mask bool, actual_keep float).
    """
    q = int(round(keep * 256.0))
    if q >= 256:  # keep so close to 1 that the uint8 grid rounds to "all"
        return jnp.ones(shape, bool), 1.0
    bits = jax.random.bits(rng, shape, dtype=jnp.uint8)
    return bits < jnp.uint8(q), q / 256.0


class FastDropout(nn.Module):
    """Elementwise dropout using ``fast_keep_mask`` (uint8 random bits).

    Same semantics as flax ``nn.Dropout`` (inverted scaling) with the keep
    probability quantized to 1/256.
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        mask, keep = fast_keep_mask(rng, 1.0 - self.rate, x.shape)
        return jnp.where(mask, x / keep, 0.0)


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample.

    Same semantics as timm's DropPath (used at vivim.py:125): with
    probability ``rate``, zero a sample's branch output; otherwise scale by
    1/(1-rate).
    """

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def unrolled_depthwise_conv(x, kernel, bias=None):
    """Depthwise conv (stride 1, SAME) as unrolled shift-multiply taps.

    ``x``: (N, *spatial, C) channels-last; ``kernel``: (*window, 1, C).

    Partition-safe replacement for
    ``lax.conv_general_dilated(feature_group_count=C)``: on a multi-axis
    mesh with a batch-sharded operand, XLA GSPMD's grouped-convolution
    kernel-grad partitioning overcounts d(kernel) by exactly the size of
    each mesh axis the conv does not use (jax 0.9.0; minimal repro in
    tests/test_seq_scan.py::test_depthwise_conv_grads_on_hybrid_mesh).
    Pad/slice/multiply/add partition correctly — and the unrolled form is
    also how a small depthwise stencil maps onto the TPU VPU (one fused
    elementwise pass; no im2col).  Taps accumulate in fp32 regardless of
    input dtype (lax.conv accumulates grouped bf16 convs in fp32 too).
    """
    window = kernel.shape[:-2]
    spatial = x.shape[1:-1]
    assert len(window) == len(spatial)
    pads = ([(0, 0)] + [((k - 1) // 2, k // 2) for k in window] + [(0, 0)])
    xp = jnp.pad(x, pads)
    out = None
    for idx in np.ndindex(*window):
        sl = ((slice(None),)
              + tuple(slice(i, i + s) for i, s in zip(idx, spatial))
              + (slice(None),))
        term = (xp[sl] * kernel[idx + (0,)]).astype(jnp.float32)
        out = term if out is None else out + term
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


class DWConv3d(nn.Module):
    """Depthwise 3x3x3 conv over (T, H, W) on token sequences.

    The reference's DWConv (vivim.py:57-68) reshapes (B, N, C) tokens to
    (B, C, T, H, W), applies nn.Conv3d(groups=C, k=3, pad=1) and flattens
    back.  Here tokens stay channels-last (TPU-native) and the conv runs
    as unrolled shift-multiply taps (see ``unrolled_depthwise_conv``).
    """

    dim: int

    @nn.compact
    def __call__(self, x, nframes: int, H: int, W: int):
        B, N, C = x.shape
        assert N == nframes * H * W and C == self.dim
        kernel = self.param(
            "kernel",
            # torch Conv3d default: kaiming-uniform, fan_in = 27 (depthwise)
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (3, 3, 3, 1, C),
        )
        bias = self.param("bias", nn.initializers.zeros, (C,))
        xv = x.reshape(B, nframes, H, W, C)
        y = unrolled_depthwise_conv(xv, kernel, bias)
        return y.reshape(B, N, C)


class Mlp(nn.Module):
    """fc1 -> 3-D depthwise conv -> GELU -> fc2 with dropout.

    Mirrors vivim.py:71-106 (Mix-FFN with a 3D depthwise conv for
    spatiotemporal locality); trunc-normal(0.02) linear init as in
    vivim.py:84-97.
    """

    dim: int
    hidden_dim: int | None = None
    out_dim: int | None = None
    dropout_rate: float = 0.0
    # torch nn.GELU (vivim.py:71) is the exact erf form; the tanh
    # approximation is ~4x faster on the TPU VPU and production configs
    # enable it (bench.py), but parity tests need the exact form.
    gelu_approximate: bool = False
    act: Callable | None = None

    @nn.compact
    def __call__(self, x, nframes: int, H: int, W: int,
                 deterministic: bool = True):
        hidden = self.hidden_dim or self.dim
        out = self.out_dim or self.dim
        x = nn.Dense(hidden, kernel_init=trunc_normal_init, name="fc1")(x)
        x = DWConv3d(hidden, name="dwconv")(x, nframes, H, W)
        if self.act is not None:
            x = self.act(x)
        else:
            x = nn.gelu(x, approximate=self.gelu_approximate)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Dense(out, kernel_init=trunc_normal_init, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x
