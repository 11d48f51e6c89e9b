"""Test-only PyTorch reference twin of the Vivim model.

A fresh transliteration of the reference's *behavioral contract* — the slow
(no-CUDA) Mamba path and the Vivim assembly — used exclusively to generate
golden activations for cross-framework parity tests:

- ``selective_scan_ref_torch``: the S6 recurrence per
  /root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:86-152
  (h = exp(dt*A)*h + dt*B*u; y = C.h + D*u; out = y*silu(z)).
- ``MambaRefTorch``: the bimamba-v3 mixer per
  /root/reference/mamba/mamba_ssm/modules/mamba_simple.py:69-264 —
  three directional parameter sets (forward / ``_b`` time-flipped /
  ``_s`` spatial frame<->position permuted), each conv1d->x_proj->dt_proj->
  scan, averaged /3 then out_proj.  Parameter names match the vendored
  module so ``convert.torch_to_jax.mamba_params_from_torch`` consumes the
  state_dict unchanged.
- ``MambaLayerRefTorch`` / ``VivimRefTorch``: the MambaLayer, mamba_block
  interleaving and decode-head assembly per
  /root/reference/modeling/vivim.py:57-348, reusing the *actual* HF
  SegFormer modules (random-init from config; no network) so the SegFormer
  math is HF's own, and state_dict keys match the reference layout
  (``encoder.downsample_layers.*``, ``encoder.stages.{i}.{j}.0.*``,
  ``decoder.*``, ``out``, ``edgeocr_cls_head``).

This module intentionally knows nothing about vivim_tpu: it is the
independent ground truth.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def selective_scan_ref_torch(u, delta, A, B, C, D=None, z=None,
                             delta_bias=None, delta_softplus=False):
    """Sequential S6 scan, channel-major layout.

    u/delta/z: (b, d, l); B/C: (b, n, l); A: (d, n); D/delta_bias: (d,).
    Returns y: (b, d, l).
    """
    u = u.float()
    delta = delta.float()
    if delta_bias is not None:
        delta = delta + delta_bias.float()[None, :, None]
    if delta_softplus:
        delta = F.softplus(delta)
    b, d, l = u.shape
    n = A.shape[1]
    h = torch.zeros(b, d, n, dtype=torch.float32)
    ys = []
    dA = torch.exp(delta.unsqueeze(-1) * A[None, :, None, :])  # (b, d, l, n)
    dBu = (delta * u).unsqueeze(-1) * B.transpose(1, 2).unsqueeze(1)
    for t in range(l):
        h = dA[:, :, t] * h + dBu[:, :, t]
        ys.append(torch.einsum("bdn,bn->bd", h, C[:, :, t]))
    y = torch.stack(ys, dim=-1)  # (b, d, l)
    if D is not None:
        y = y + D.float()[None, :, None] * u
    if z is not None:
        y = y * F.silu(z.float())
    return y


class MambaRefTorch(nn.Module):
    """bimamba-v3 Mamba mixer (slow path), vendored-module-compatible names."""

    def __init__(self, d_model, d_state=16, d_conv=4, expand=2, nframes=5,
                 bias=False, conv_bias=True, dt_scale=1.0, dt_min=0.001,
                 dt_max=0.1, dt_init_floor=1e-4):
        super().__init__()
        self.d_model = d_model
        self.d_state = d_state
        self.d_conv = d_conv
        self.d_inner = expand * d_model
        self.dt_rank = math.ceil(d_model / 16)
        self.nframes = nframes
        self.in_proj = nn.Linear(d_model, 2 * self.d_inner, bias=bias)
        self.out_proj = nn.Linear(self.d_inner, d_model, bias=bias)
        for s in ("", "_b", "_s"):
            setattr(self, f"conv1d{s}", nn.Conv1d(
                self.d_inner, self.d_inner, d_conv, groups=self.d_inner,
                padding=d_conv - 1, bias=conv_bias))
            setattr(self, f"x_proj{s}", nn.Linear(
                self.d_inner, self.dt_rank + 2 * d_state, bias=False))
            dt_proj = nn.Linear(self.dt_rank, self.d_inner, bias=True)
            # reference dt init (mamba_simple.py:89-108)
            dt_std = self.dt_rank**-0.5 * dt_scale
            nn.init.uniform_(dt_proj.weight, -dt_std, dt_std)
            dt = torch.exp(torch.rand(self.d_inner)
                           * (math.log(dt_max) - math.log(dt_min))
                           + math.log(dt_min)).clamp(min=dt_init_floor)
            with torch.no_grad():
                dt_proj.bias.copy_(dt + torch.log(-torch.expm1(-dt)))
            setattr(self, f"dt_proj{s}", dt_proj)
            # S4D-real A init (mamba_simple.py:110-117)
            A = torch.arange(1, d_state + 1, dtype=torch.float32).repeat(
                self.d_inner, 1)
            setattr(self, f"A{s}_log", nn.Parameter(torch.log(A)))
            setattr(self, f"D{s}", nn.Parameter(torch.ones(self.d_inner)))

    def _direction(self, xz, suffix):
        """One directional scan on channel-major xz (b, 2*d_inner, l)."""
        l = xz.shape[-1]
        x, z = xz.chunk(2, dim=1)
        conv = getattr(self, f"conv1d{suffix}")
        x = F.silu(conv(x)[..., :l])
        x_proj = getattr(self, f"x_proj{suffix}")
        dt_proj = getattr(self, f"dt_proj{suffix}")
        x_dbl = x_proj(x.transpose(1, 2))  # (b, l, rank+2n)
        dt, B, C = torch.split(
            x_dbl, [self.dt_rank, self.d_state, self.d_state], dim=-1)
        dt = torch.einsum("blr,dr->bdl", dt, dt_proj.weight)
        A = -torch.exp(getattr(self, f"A{suffix}_log").float())
        return selective_scan_ref_torch(
            x, dt, A, B.transpose(1, 2), C.transpose(1, 2),
            D=getattr(self, f"D{suffix}"), z=z,
            delta_bias=dt_proj.bias, delta_softplus=True)

    def forward(self, hidden_states):
        """(B, L, d_model) -> (B, L, d_model); L % nframes == 0."""
        b, l, _ = hidden_states.shape
        nf = self.nframes
        xz = self.in_proj(hidden_states).transpose(1, 2)  # (b, 2d, l)
        out = self._direction(xz, "")
        out_b = self._direction(xz.flip([-1]), "_b")
        # frame-major -> position-major (mamba_simple.py:245-247)
        xz_s = torch.stack(xz.chunk(nf, dim=-1), dim=-1).flatten(-2)
        out_s = self._direction(xz_s, "_s")
        out_s = out_s.reshape(b, self.d_inner, l // nf, nf).permute(
            0, 1, 3, 2).flatten(-2)
        combined = (out + out_b.flip([-1]) + out_s) / 3.0
        return self.out_proj(combined.transpose(1, 2))


class DWConvRefTorch(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv3d(dim, dim, 3, 1, 1, bias=True, groups=dim)

    def forward(self, x, nf, H, W):
        B, N, C = x.shape
        x = x.transpose(1, 2).view(B, C, nf, H, W)
        x = self.dwconv(x)
        return x.flatten(2).transpose(1, 2)


class MlpRefTorch(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.dwconv = DWConvRefTorch(hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, nf, H, W):
        return self.fc2(self.act(self.dwconv(self.fc1(x), nf, H, W)))


class MambaLayerRefTorch(nn.Module):
    """Prenorm Mamba + prenorm Mix-FFN on (B, C, nf, H, W) (vivim.py:111-159).

    Eval-mode only (DropPath/dropout are identities)."""

    def __init__(self, dim, mlp_ratio=4, nframes=5):
        super().__init__()
        self.dim = dim
        self.norm1 = nn.LayerNorm(dim)
        self.mamba = MambaRefTorch(d_model=dim, nframes=nframes)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MlpRefTorch(dim, int(dim * mlp_ratio))

    def forward(self, x):
        B, C, nf, H, W = x.shape
        n = nf * H * W
        xf = x.reshape(B, C, n).transpose(-1, -2)
        xf = xf + self.mamba(self.norm1(xf))
        xf = xf + self.mlp(self.norm2(xf), nf, H, W)
        return xf.transpose(-1, -2).reshape(B, C, nf, H, W)


class MambaBlockRefTorch(nn.Module):
    """The reference ``mamba_block`` (vivim.py:163-231): SegFormer stages
    interleaved with MambaLayer stacks; per-stage LN skipped."""

    def __init__(self, hf_encoder, depths, dims, nframes=5):
        super().__init__()
        self.downsample_layers = hf_encoder
        self.stages = nn.ModuleList([
            nn.Sequential(*[nn.Sequential(
                MambaLayerRefTorch(dims[i], nframes=nframes))
                for _ in range(depths[i])])
            for i in range(len(dims))
        ])

    def forward(self, x):
        bz, nf = x.shape[:2]
        hs = x.reshape(bz * nf, *x.shape[-3:])
        outs = []
        enc = self.downsample_layers
        for embed, blocks, _norm, stage in zip(
                enc.patch_embeddings, enc.block, enc.layer_norm, self.stages):
            hs, height, width = embed(hs)
            for blk in blocks:
                hs = blk(hs, height, width, False)[0]
            hs = hs.reshape(bz * nf, height, width, -1).permute(
                0, 3, 1, 2).contiguous()
            hs = hs.reshape(bz, nf, *hs.shape[-3:]).transpose(1, 2)
            hs = stage(hs).transpose(1, 2)  # (bz, nf, C, H, W)
            hs = hs.reshape(bz * nf, *hs.shape[-3:])
            outs.append(hs)
        return outs


class VivimRefTorch(nn.Module):
    """Full reference Vivim assembly (vivim.py:234-348), eval-mode ground
    truth.  ``hf_model``: a transformers.SegformerForSemanticSegmentation
    built from config (random init — no network needed)."""

    def __init__(self, hf_model, out_chans=3, depths=(2, 2, 2, 2),
                 feat_size=(64, 128, 320, 512), hidden_size=768,
                 with_edge=False, nframes=5, dropout_rate=0.3):
        super().__init__()
        self.encoder = MambaBlockRefTorch(
            hf_model.segformer.encoder, depths, feat_size, nframes=nframes)
        self.decoder = hf_model.decode_head
        self.feature_dropout = nn.Dropout2d(dropout_rate)
        self.out = nn.Conv2d(hidden_size, out_chans, kernel_size=1)
        self.with_edge = with_edge
        if with_edge:
            self.edgeocr_cls_head = nn.Conv2d(feat_size[0], 1, kernel_size=1)

    def decode(self, encoder_hidden_states):
        batch_size = encoder_hidden_states[-1].shape[0]
        all_states = []
        for state, mlp in zip(encoder_hidden_states, self.decoder.linear_c):
            height, width = state.shape[2], state.shape[3]
            state = mlp(state)
            state = state.permute(0, 2, 1).reshape(batch_size, -1, height,
                                                   width)
            state = F.interpolate(
                state, size=encoder_hidden_states[0].size()[2:],
                mode="bilinear", align_corners=False)
            # the 50%-gated per-scale dropout (vivim.py:311-312) is an
            # identity in eval mode (F.dropout with training=False)
            all_states.append(state)
        hidden = self.decoder.linear_fuse(torch.cat(all_states[::-1], dim=1))
        hidden = self.decoder.batch_norm(hidden)
        hidden = self.decoder.activation(hidden)
        hidden = self.decoder.dropout(hidden)
        hidden = self.decoder.dropout(hidden)  # applied twice (vivim.py:319-322)
        hidden = self.feature_dropout(hidden)
        return self.out(hidden)

    def forward(self, x_in):
        _, _, _, h, w = x_in.shape
        outs = self.encoder(x_in)
        logits = self.decode(outs)
        up = F.interpolate(logits, size=(h, w), mode="bilinear",
                           align_corners=False)
        if self.with_edge:
            edge = self.edgeocr_cls_head(outs[0])
            edge = F.interpolate(edge, size=(h, w), mode="bilinear",
                                 align_corners=False)
            return up, edge
        return up


class MambaSimpleRefTorch(nn.Module):
    """Single-direction (``bimamba_type="none"``) Mamba mixer: the
    reference's slow path (mamba_simple.py:311-353) with the vendored
    module's parameter names, for LM golden tests."""

    def __init__(self, d_model, d_state=16, d_conv=4, expand=2):
        super().__init__()
        self.d_state = d_state
        self.d_inner = expand * d_model
        self.dt_rank = math.ceil(d_model / 16)
        self.in_proj = nn.Linear(d_model, 2 * self.d_inner, bias=False)
        self.conv1d = nn.Conv1d(self.d_inner, self.d_inner, d_conv,
                                groups=self.d_inner, padding=d_conv - 1,
                                bias=True)
        self.x_proj = nn.Linear(self.d_inner,
                                self.dt_rank + 2 * d_state, bias=False)
        self.dt_proj = nn.Linear(self.dt_rank, self.d_inner, bias=True)
        # reference dt init (mamba_simple.py:89-108)
        dt_std = self.dt_rank**-0.5
        nn.init.uniform_(self.dt_proj.weight, -dt_std, dt_std)
        dt = torch.exp(torch.rand(self.d_inner)
                       * (math.log(0.1) - math.log(0.001))
                       + math.log(0.001)).clamp(min=1e-4)
        with torch.no_grad():
            self.dt_proj.bias.copy_(dt + torch.log(-torch.expm1(-dt)))
        A = torch.arange(1, d_state + 1, dtype=torch.float32).repeat(
            self.d_inner, 1)
        self.A_log = nn.Parameter(torch.log(A))
        self.D = nn.Parameter(torch.ones(self.d_inner))
        self.out_proj = nn.Linear(self.d_inner, d_model, bias=False)

    def forward(self, hidden_states):
        l = hidden_states.shape[1]
        xz = self.in_proj(hidden_states).transpose(1, 2)  # (b, 2d, l)
        x, z = xz.chunk(2, dim=1)
        x = F.silu(self.conv1d(x)[..., :l])
        x_dbl = self.x_proj(x.transpose(1, 2))
        dt, B, C = torch.split(
            x_dbl, [self.dt_rank, self.d_state, self.d_state], dim=-1)
        dt = torch.einsum("blr,dr->bdl", dt, self.dt_proj.weight)
        y = selective_scan_ref_torch(
            x, dt, -torch.exp(self.A_log.float()), B.transpose(1, 2),
            C.transpose(1, 2), D=self.D, z=z, delta_bias=self.dt_proj.bias,
            delta_softplus=True)
        return self.out_proj(y.transpose(1, 2))


class _LMBlockRefTorch(nn.Module):
    def __init__(self, d_model, d_state, d_conv, expand, norm_epsilon,
                 rms_norm=False):
        super().__init__()
        self.norm = (_RMSNormRefTorch(d_model, eps=norm_epsilon) if rms_norm
                     else nn.LayerNorm(d_model, eps=norm_epsilon))
        self.mixer = MambaSimpleRefTorch(d_model, d_state, d_conv, expand)


class _RMSNormRefTorch(nn.Module):
    """RMSNorm twin of the reference Triton kernel's semantics
    (ops/triton/layernorm.py:35-48 ``rms_norm_ref``: x·rsqrt(mean(x²)+eps)
    ·weight, weight only — the norm real mamba LM checkpoints use)."""

    def __init__(self, d_model, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(d_model))

    def forward(self, x):
        rstd = torch.rsqrt(x.square().mean(dim=-1, keepdim=True) + self.eps)
        return x * rstd * self.weight


class _LMBackboneRefTorch(nn.Module):
    def __init__(self, vocab, d_model, n_layer, d_state, d_conv, expand,
                 norm_epsilon, rms_norm=False):
        super().__init__()
        self.embedding = nn.Embedding(vocab, d_model)
        self.layers = nn.ModuleList(
            _LMBlockRefTorch(d_model, d_state, d_conv, expand, norm_epsilon,
                             rms_norm)
            for _ in range(n_layer))
        self.norm_f = (_RMSNormRefTorch(d_model, eps=norm_epsilon) if rms_norm
                       else nn.LayerNorm(d_model, eps=norm_epsilon))


class MambaLMRefTorch(nn.Module):
    """MambaLMHeadModel twin (mixer_seq_simple.py:83-233): embedding ->
    n x [prenorm LayerNorm(eps=1e-5) + single-direction mixer + residual]
    -> final norm -> TIED lm_head.  state_dict keys match the reference
    checkpoint layout (``backbone.embedding.weight``,
    ``backbone.layers.{i}.{norm,mixer}.*``, ``backbone.norm_f.*``) so
    ``convert.torch_to_jax.mamba_lm_params_from_torch`` consumes it."""

    def __init__(self, vocab, d_model, n_layer, d_state=16, d_conv=4,
                 expand=2, norm_epsilon=1e-5, rms_norm=False):
        super().__init__()
        self.backbone = _LMBackboneRefTorch(
            vocab, d_model, n_layer, d_state, d_conv, expand, norm_epsilon,
            rms_norm)
        nn.init.normal_(self.backbone.embedding.weight, std=0.02)

    def forward(self, tokens):
        h = self.backbone.embedding(tokens)
        for layer in self.backbone.layers:
            h = h + layer.mixer(layer.norm(h))
        h = self.backbone.norm_f(h)
        return h @ self.backbone.embedding.weight.T
