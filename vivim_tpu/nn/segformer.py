"""SegFormer (MiT) encoder and all-MLP decode head in Flax, channels-last.

Re-implementation of the architecture consumed by the reference via
HuggingFace ``SegformerForSemanticSegmentation``
(/root/reference/modeling/vivim.py:264-267): overlapped patch embeddings,
efficient self-attention with spatial-reduction ratios, Mix-FFN with a 3x3
depthwise conv, per-stage LayerNorm, and the decode head
(linear_c unify -> upsample -> concat reversed -> 1x1 fuse -> BN -> ReLU ->
dropout -> classifier).  Weight-compatible with HF checkpoints through
``vivim_tpu.convert.torch_to_jax`` (exact op order, erf GELU, half-pixel
bilinear resize = torch align_corners=False).

Everything is NHWC / (B, L, C) tokens — the TPU-native layout.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vivim_tpu.nn.layers import DropPath, unrolled_depthwise_conv


@dataclasses.dataclass(frozen=True)
class SegformerConfig:
    num_channels: int = 3
    dtype: str = "float32"  # activation dtype ("bfloat16" for TPU speed)
    depths: Sequence[int] = (3, 4, 18, 3)
    hidden_sizes: Sequence[int] = (64, 128, 320, 512)
    num_attention_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    strides: Sequence[int] = (4, 2, 2, 2)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    hidden_dropout: float = 0.0
    attention_dropout: float = 0.0
    drop_path_rate: float = 0.1
    classifier_dropout: float = 0.1
    decoder_hidden_size: int = 768
    num_labels: int = 150
    # exact erf GELU matches HF bit-for-bit but is several times slower on
    # the TPU VPU; the tanh approximation changes activations by ~1e-3
    gelu_approximate: bool = False
    # rematerialize each transformer layer in the backward (save only the
    # layer inputs).  Required for bs>=16 at 256px: stored Mix-FFN dwconv
    # activations alone exceed HBM (batch-scaling study, docs/DESIGN.md r3)
    remat_layers: bool = False

    @property
    def num_stages(self):
        return len(self.depths)


def mit_b3() -> SegformerConfig:
    """MiT-b3, the backbone of the reference Vivim (vivim.py:264)."""
    return SegformerConfig()


def mit_b0() -> SegformerConfig:
    return SegformerConfig(depths=(2, 2, 2, 2),
                           hidden_sizes=(32, 64, 160, 256),
                           decoder_hidden_size=256)


def mit_tiny_test() -> SegformerConfig:
    """Miniature config for fast tests."""
    return SegformerConfig(depths=(1, 1, 1, 1),
                           hidden_sizes=(8, 16, 24, 32),
                           num_attention_heads=(1, 2, 2, 4),
                           decoder_hidden_size=32)


def mit_micro_test() -> SegformerConfig:
    """2-stage micro config: the smallest graph that still exercises every
    architectural element (overlap patch embed, SR attention, Mix-FFN,
    inter-stage transition, multi-scale decode).  Built for compile-time
    budgeted checks — the multi-chip dryrun compiles several distinct
    train-step programs on a 1-CPU host (XLA:CPU compile time scales with
    op count, so stage count is the lever; __graft_entry__.py)."""
    return SegformerConfig(depths=(1, 1),
                           hidden_sizes=(8, 16),
                           num_attention_heads=(1, 2),
                           sr_ratios=(8, 4),
                           patch_sizes=(7, 3),
                           strides=(4, 2),
                           mlp_ratios=(2, 2),
                           decoder_hidden_size=16)


class OverlapPatchEmbed(nn.Module):
    """Strided overlapping conv patch embedding + LayerNorm on tokens."""

    patch_size: int
    stride: int
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> (tokens (B, H'*W', hidden), H', W')."""
        p = self.patch_size
        x = nn.Conv(self.hidden_size, (p, p), strides=(self.stride,) * 2,
                    padding=((p // 2,) * 2, (p // 2,) * 2), name="proj")(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = nn.LayerNorm(name="norm")(x)
        return x, H, W


class EfficientSelfAttention(nn.Module):
    """Multi-head attention with PvT-style sequence reduction on K/V."""

    hidden_size: int
    num_heads: int
    sr_ratio: int
    attention_dropout: float = 0.0
    hidden_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, H: int, W: int, deterministic: bool = True):
        B, L, C = x.shape
        head_dim = self.hidden_size // self.num_heads
        q = nn.Dense(self.hidden_size, name="query")(x)
        kv_in = x
        if self.sr_ratio > 1:
            sr = self.sr_ratio
            xs = x.reshape(B, H, W, C)
            xs = nn.Conv(C, (sr, sr), strides=(sr, sr), name="sr")(xs)
            kv_in = xs.reshape(B, -1, C)
            kv_in = nn.LayerNorm(name="sr_norm")(kv_in)
        k = nn.Dense(self.hidden_size, name="key")(kv_in)
        v = nn.Dense(self.hidden_size, name="value")(kv_in)

        q = q.reshape(B, L, self.num_heads, head_dim)
        k = k.reshape(B, -1, self.num_heads, head_dim)
        v = v.reshape(B, -1, self.num_heads, head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, jnp.float32)).astype(q.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            x.dtype)
        probs = nn.Dropout(self.attention_dropout,
                           deterministic=deterministic)(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, C)
        out = nn.Dense(self.hidden_size, name="proj")(ctx)
        out = nn.Dropout(self.hidden_dropout, deterministic=deterministic)(out)
        return out


class DepthwiseConv2d(nn.Module):
    """3x3 depthwise conv, parameter-compatible with flax ``nn.Conv``
    (kernel (3, 3, 1, C), bias (C,), lecun-normal init) but computed as
    unrolled shift-multiply taps — see
    ``vivim_tpu.nn.layers.unrolled_depthwise_conv`` for why grouped
    ``lax.conv`` is avoided (GSPMD kernel-grad overcount on multi-axis
    meshes)."""

    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return unrolled_depthwise_conv(x, kernel, bias)


class MixFFN(nn.Module):
    """dense1 -> 3x3 depthwise conv -> GELU -> dense2 with dropout."""

    hidden_size: int
    mlp_hidden: int
    hidden_dropout: float = 0.0
    gelu_approximate: bool = False

    @nn.compact
    def __call__(self, x, H: int, W: int, deterministic: bool = True):
        B, L, C = x.shape
        x = nn.Dense(self.mlp_hidden, name="dense1")(x)
        xs = x.reshape(B, H, W, self.mlp_hidden)
        xs = DepthwiseConv2d(self.mlp_hidden, name="dwconv")(xs)
        x = xs.reshape(B, L, self.mlp_hidden)
        x = nn.gelu(x, approximate=self.gelu_approximate)
        x = nn.Dropout(self.hidden_dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.hidden_size, name="dense2")(x)
        x = nn.Dropout(self.hidden_dropout, deterministic=deterministic)(x)
        return x


class SegformerLayer(nn.Module):
    """Prenorm attention + prenorm Mix-FFN with stochastic depth."""

    hidden_size: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int = 4
    drop_path: float = 0.0
    attention_dropout: float = 0.0
    hidden_dropout: float = 0.0
    gelu_approximate: bool = False

    @nn.compact
    def __call__(self, x, H: int, W: int, deterministic: bool = True):
        dp = DropPath(self.drop_path)
        h = nn.LayerNorm(name="norm1")(x)
        h = EfficientSelfAttention(
            self.hidden_size, self.num_heads, self.sr_ratio,
            self.attention_dropout, self.hidden_dropout, name="attn",
        )(h, H, W, deterministic)
        x = x + dp(h, deterministic)
        h = nn.LayerNorm(name="norm2")(x)
        h = MixFFN(self.hidden_size, int(self.hidden_size * self.mlp_ratio),
                   self.hidden_dropout, self.gelu_approximate,
                   name="ffn")(h, H, W, deterministic)
        x = x + dp(h, deterministic)
        return x


class SegformerStage(nn.Module):
    """One encoder stage: patch embed + transformer layers (no final norm).

    The final per-stage LayerNorm is kept separate because the reference's
    mamba_block intentionally skips it (vivim.py:211-212).
    """

    cfg: SegformerConfig
    stage: int
    drop_path_rates: Sequence[float]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, C_in) -> (tokens (B, H'*W', C), H', W')."""
        i = self.stage
        cfg = self.cfg
        tokens, H, W = OverlapPatchEmbed(
            cfg.patch_sizes[i], cfg.strides[i], cfg.hidden_sizes[i],
            name="embed")(x)
        # nn.remat static_argnums count the module instance as argnum 0
        Layer = (nn.remat(SegformerLayer, static_argnums=(2, 3, 4))
                 if cfg.remat_layers else SegformerLayer)
        for j in range(cfg.depths[i]):
            tokens = Layer(
                cfg.hidden_sizes[i],
                cfg.num_attention_heads[i],
                cfg.sr_ratios[i],
                cfg.mlp_ratios[i],
                self.drop_path_rates[j],
                cfg.attention_dropout,
                cfg.hidden_dropout,
                cfg.gelu_approximate,
                name=f"layer_{j}",
            )(tokens, H, W, deterministic)
        return tokens, H, W


def drop_path_schedule(cfg: SegformerConfig):
    """Linear stochastic-depth decay over all layers (HF encoder rule)."""
    total = sum(cfg.depths)
    rates = [cfg.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
    out, cur = [], 0
    for d in cfg.depths:
        out.append(tuple(rates[cur : cur + d]))
        cur += d
    return out


class SegformerEncoder(nn.Module):
    """Full MiT encoder: stages + per-stage LayerNorm, NHWC feature maps."""

    cfg: SegformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, 3) -> list of (B, H_i, W_i, C_i) per stage."""
        cfg = self.cfg
        dprs = drop_path_schedule(cfg)
        feats = []
        h = x
        for i in range(cfg.num_stages):
            tokens, H, W = SegformerStage(
                cfg, i, dprs[i], name=f"stage_{i}")(h, deterministic)
            tokens = nn.LayerNorm(name=f"norm_{i}")(tokens)
            h = tokens.reshape(tokens.shape[0], H, W, -1)
            feats.append(h)
        return feats


def resize_bilinear(x, size):
    """Half-pixel bilinear resize (= torch interpolate align_corners=False)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear")


class SegformerDecodeHead(nn.Module):
    """All-MLP decode head (HF SegformerDecodeHead op order).

    ``fuse_only=True`` stops after dropout (no classifier) — the reference
    Vivim re-uses the head up to that point and applies its own output conv
    plus extra regularization (vivim.py:288-327).
    """

    cfg: SegformerConfig
    fuse_only: bool = False

    @nn.compact
    def __call__(self, feats, deterministic: bool = True):
        cfg = self.cfg
        B, H0, W0, _ = feats[0].shape
        unified = []
        for i, f in enumerate(feats):
            B_, H, W, C = f.shape
            t = f.reshape(B_, H * W, C)
            t = nn.Dense(cfg.decoder_hidden_size, name=f"linear_c_{i}")(t)
            t = t.reshape(B_, H, W, cfg.decoder_hidden_size)
            t = resize_bilinear(t, (H0, W0))
            unified.append(t)
        x = jnp.concatenate(unified[::-1], axis=-1)
        x = nn.Conv(cfg.decoder_hidden_size, (1, 1), use_bias=False,
                    name="linear_fuse")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, name="batch_norm")(x)
        x = nn.relu(x)
        x = nn.Dropout(cfg.classifier_dropout,
                       deterministic=deterministic)(x)
        if self.fuse_only:
            return x
        return nn.Conv(cfg.num_labels, (1, 1), name="classifier")(x)


class SegformerForSemanticSegmentation(nn.Module):
    """Standalone SegFormer semantic segmentation model (parity surface)."""

    cfg: SegformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feats = SegformerEncoder(self.cfg, name="encoder")(x, deterministic)
        logits = SegformerDecodeHead(self.cfg, name="decode_head")(
            feats, deterministic)
        return logits
