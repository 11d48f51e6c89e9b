"""Vivim: SegFormer encoder interleaved with temporal Mamba stacks.

Re-design of /root/reference/modeling/vivim.py:

- ``VivimEncoder`` == the reference ``mamba_block`` (vivim.py:163-231):
  per stage i — SegFormer patch embed + attention layers (run per-frame on
  (B*T, H, W, C)), then ``depths[i]`` MambaLayers over the flattened
  spatiotemporal tokens (B, T*H*W, C).  The per-stage SegFormer LayerNorm is
  intentionally skipped (vivim.py:211-212), and the stochastic-depth rate is
  indexed by *stage* (dp_rates[i], vivim.py:186) — both reference quirks are
  reproduced for weight/behavior parity.
- ``Vivim.decode`` (vivim.py:288-327): the SegFormer decode head with extra
  regularization — each unified scale is dropped with 50% probability at
  rate dropout_rate/2; the head dropout is applied twice; then a channelwise
  Dropout2d(dropout_rate); then a 1x1 output conv (768 -> out_chans).
- ``Vivim.__call__`` (vivim.py:330-348): input clip (B, T, H, W, 3) ->
  logits bilinearly upsampled to (B, T, H, W, out_chans); optional edge head
  (1x1 conv on the stage-0 feature, vivim.py:275-278, 341-346).

Layouts are channels-last throughout (TPU-native); the reference is NCHW.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vivim_tpu.nn import segformer as sf
from vivim_tpu.nn.layers import FastDropout, fast_keep_mask
from vivim_tpu.nn.mamba import MambaLayer


@dataclasses.dataclass(frozen=True)
class VivimConfig:
    in_chans: int = 3
    out_chans: int = 3  # 3-class (background / solid / non-solid)
    depths: Sequence[int] = (2, 2, 2, 2)  # Mamba layers per stage
    feat_size: Sequence[int] = (64, 128, 320, 512)
    drop_path_rate: float = 0.2
    dropout_rate: float = 0.3
    with_edge: bool = False
    hidden_size: int = 768
    segformer: sf.SegformerConfig = dataclasses.field(default_factory=sf.mit_b3)
    scan_implementation: str | None = None
    # recompute the Mamba pre-scan chain in the backward (memory saver;
    # ~10% step-time cost — see kernels/mamba_inner.py)
    remat_pre_scan: bool = False
    # rematerialize each whole MambaLayer block in the backward (save only
    # block inputs); combine with segformer.remat_layers for the coarsest
    # memory profile — what makes bs>=16 at 256px fit in 16 GB HBM
    remat_blocks: bool = False
    # long-clip mode: shard Mamba tokens over this named mesh axis
    # (sequence-parallel scan; parallel/seq_scan.py)
    seq_axis: str | None = None
    mesh: jax.sharding.Mesh | None = None

    @classmethod
    def tiny_test(cls, **kw):
        seg = sf.mit_tiny_test()
        return cls(feat_size=seg.hidden_sizes, hidden_size=32, segformer=seg,
                   scan_implementation=kw.pop("scan_implementation", "ref"),
                   **kw)

    @classmethod
    def micro_test(cls, **kw):
        """2-stage micro model (sf.mit_micro_test + 1 MambaLayer/stage):
        ~3.5x fewer ops than tiny_test — for compile-time-budgeted checks
        like the multi-chip dryrun."""
        seg = sf.mit_micro_test()
        return cls(depths=(1, 1), feat_size=seg.hidden_sizes, hidden_size=16,
                   segformer=seg,
                   scan_implementation=kw.pop("scan_implementation", "ref"),
                   **kw)


class VivimEncoder(nn.Module):
    """SegFormer stages interleaved with temporal-Mamba stacks."""

    cfg: VivimConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, T, H, W, 3) -> list of per-stage (B*T, H_i, W_i, C_i)."""
        cfg = self.cfg
        seg = cfg.segformer
        B, T, H, W, C = x.shape
        h = x.reshape(B * T, H, W, C)
        seg_dprs = sf.drop_path_schedule(seg)
        total = sum(cfg.depths)
        feats = []
        for i in range(seg.num_stages):
            tokens, Hi, Wi = sf.SegformerStage(
                seg, i, seg_dprs[i], name=f"stage_{i}")(h, deterministic)
            # reference quirk: per-stage LN skipped; dp rate indexed by stage
            dim = seg.hidden_sizes[i]
            dp_rate = cfg.drop_path_rate * i / max(total - 1, 1)
            t5 = tokens.reshape(B, T * Hi * Wi, dim)
            # nn.remat static_argnums count the module instance as argnum 0
            Block = (nn.remat(MambaLayer, static_argnums=(2, 3, 4, 5))
                     if cfg.remat_blocks else MambaLayer)
            for j in range(cfg.depths[i]):
                t5 = Block(
                    dim=dim,
                    drop_path=dp_rate,
                    scan_implementation=cfg.scan_implementation,
                    gelu_approximate=seg.gelu_approximate,
                    remat_pre_scan=cfg.remat_pre_scan,
                    seq_axis=cfg.seq_axis,
                    mesh=cfg.mesh,
                    name=f"mamba_{i}_{j}",
                )(t5, T, Hi, Wi, deterministic)
            h = t5.reshape(B * T, Hi, Wi, dim)
            feats.append(h)
        return feats


def _maybe_scale_dropout(x, rng_gate, rng_mask, rate, deterministic):
    """50%-chance elementwise dropout of a whole scale (vivim.py:311-312).

    The reference draws torch.rand(1) per forward call per scale; here a
    scalar bernoulli gates a standard dropout mask, all under jit.
    """
    if deterministic or rate == 0.0:
        return x
    gate = jax.random.bernoulli(rng_gate, 0.5)
    mask, keep = fast_keep_mask(rng_mask, 1.0 - rate, x.shape)
    dropped = jnp.where(mask, x / keep, 0.0)
    return jnp.where(gate, dropped, x)


class _FuseKernel(nn.Module):
    """Bare 1x1-conv kernel for linear_fuse, shared by the train-mode
    (concat -> conv) and eval-mode (per-scale matmul -> upsample -> sum)
    paths.  Same param path/shape/init as nn.Conv(name="linear_fuse")."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (1, 1, self.in_features, self.features))


class Vivim(nn.Module):
    """Video Vision Mamba segmentation model."""

    cfg: VivimConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, T, H, W, in_chans).

        Returns logits (B, T, H, W, out_chans); with ``cfg.with_edge`` also
        an edge map (B, T, H, W, 1).
        """
        cfg = self.cfg
        seg = cfg.segformer
        B, T, H, W, _ = x.shape
        feats = VivimEncoder(cfg, name="encoder")(x, deterministic)

        # ---- decode (vivim.py:288-327) ----
        BT, H0, W0, _ = feats[0].shape
        n_stages = len(feats)
        hid = cfg.hidden_size
        fuse_kernel = _FuseKernel(n_stages * hid, hid, name="linear_fuse")()
        Wf = fuse_kernel[0, 0]  # (n_stages*hid, hid)

        projected = []
        for i, f in enumerate(feats):
            _, Hi, Wi, Ci = f.shape
            t = f.reshape(BT, Hi * Wi, Ci)
            t = nn.Dense(hid, name=f"linear_c_{i}")(t)
            projected.append((t, Hi, Wi))

        if deterministic:
            # eval fast path: the 1x1 fuse conv commutes with bilinear
            # upsampling (both linear), so fuse each scale at its native
            # resolution (hid x hid matmul instead of n_stages*hid x hid at
            # full resolution) and sum the upsampled results — exact up to
            # float reassociation, ~3x fewer decode MACs.  Concat order is
            # reversed scales (vivim.py:315): scale i occupies fuse-kernel
            # rows (n_stages-1-i)*hid:(n_stages-i)*hid.
            hmap = None
            for i, (t, Hi, Wi) in enumerate(projected):
                j = n_stages - 1 - i
                w = Wf[j * hid : (j + 1) * hid].astype(t.dtype)
                t = (t @ w).reshape(BT, Hi, Wi, hid)
                t = sf.resize_bilinear(t, (H0, W0))
                hmap = t if hmap is None else hmap + t
        else:
            # train path: reference op order (upsample -> per-scale gated
            # dropout -> concat reversed -> 1x1 fuse), vivim.py:300-316
            unified = []
            for i, (t, Hi, Wi) in enumerate(projected):
                t = t.reshape(BT, Hi, Wi, hid)
                t = sf.resize_bilinear(t, (H0, W0))
                t = _maybe_scale_dropout(
                    t,
                    self.make_rng("dropout"),
                    self.make_rng("dropout"),
                    cfg.dropout_rate / 2,
                    deterministic,
                )
                unified.append(t)
            hmap = jnp.concatenate(unified[::-1], axis=-1)
            hmap = jnp.einsum("bhwc,cd->bhwd", hmap, Wf.astype(hmap.dtype))
        hmap = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                            epsilon=1e-5, name="batch_norm")(hmap)
        hmap = nn.relu(hmap)
        # head dropout applied twice (vivim.py:319-322)
        hmap = FastDropout(seg.classifier_dropout, name="head_drop_0")(
            hmap, deterministic)
        hmap = FastDropout(seg.classifier_dropout, name="head_drop_1")(
            hmap, deterministic)
        # channelwise feature dropout (Dropout2d, vivim.py:270, 323)
        hmap = nn.Dropout(cfg.dropout_rate, broadcast_dims=(1, 2),
                          deterministic=deterministic)(hmap)
        logits = nn.Conv(cfg.out_chans, (1, 1), name="out")(hmap)

        logits = sf.resize_bilinear(logits, (H, W))
        logits = logits.reshape(B, T, H, W, cfg.out_chans)
        if not cfg.with_edge:
            return logits
        edge = nn.Conv(1, (1, 1), name="edge_head")(feats[0])
        edge = sf.resize_bilinear(edge, (H, W)).reshape(B, T, H, W, 1)
        return logits, edge
