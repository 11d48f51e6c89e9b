"""Convert PyTorch SegFormer / Vivim weights to vivim_tpu Flax params.

Covers the external model dependency of the reference
(nvidia/segformer-b3-finetuned-ade-512-512 loaded at
/root/reference/modeling/vivim.py:264) and — via ``vivim_params_from_torch``
— reference Lightning checkpoints (state_dict with a ``model.`` prefix,
stripped as in /root/reference/inference.py:217-225).

Tensors may be torch.Tensors or numpy arrays; torch is only imported lazily
so the core framework has no torch dependency.
"""

from __future__ import annotations

import numpy as np


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _linear(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv(sd, prefix, depthwise=False):
    w = _np(sd[f"{prefix}.weight"])  # torch (O, I/g, kh, kw)
    w = np.transpose(w, (2, 3, 1, 0))  # -> (kh, kw, I/g, O)
    out = {"kernel": w}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix):
    """LayerNorm {weight, bias} -> {scale, bias}; an RMSNorm (weight only,
    e.g. rms_norm=True mamba LM checkpoints) maps to {scale} — the flax
    ``nn.RMSNorm`` param tree."""
    out = {"scale": _np(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def segformer_encoder_params_from_torch(sd, cfg, prefix="segformer.encoder"):
    """HF SegformerEncoder state_dict -> params for nn.segformer.SegformerEncoder."""
    params = {}
    for i in range(cfg.num_stages):
        stage = {"embed": {
            "proj": _conv(sd, f"{prefix}.patch_embeddings.{i}.proj"),
            "norm": _ln(sd, f"{prefix}.patch_embeddings.{i}.layer_norm"),
        }}
        for j in range(cfg.depths[i]):
            lp = f"{prefix}.block.{i}.{j}"
            attn = {
                "query": _linear(sd, f"{lp}.attention.self.query"),
                "key": _linear(sd, f"{lp}.attention.self.key"),
                "value": _linear(sd, f"{lp}.attention.self.value"),
                "proj": _linear(sd, f"{lp}.attention.output.dense"),
            }
            if cfg.sr_ratios[i] > 1:
                attn["sr"] = _conv(sd, f"{lp}.attention.self.sr")
                attn["sr_norm"] = _ln(sd, f"{lp}.attention.self.layer_norm")
            stage[f"layer_{j}"] = {
                "norm1": _ln(sd, f"{lp}.layer_norm_1"),
                "attn": attn,
                "norm2": _ln(sd, f"{lp}.layer_norm_2"),
                "ffn": {
                    "dense1": _linear(sd, f"{lp}.mlp.dense1"),
                    "dwconv": _conv(sd, f"{lp}.mlp.dwconv.dwconv"),
                    "dense2": _linear(sd, f"{lp}.mlp.dense2"),
                },
            }
        params[f"stage_{i}"] = stage
        params[f"norm_{i}"] = _ln(sd, f"{prefix}.layer_norm.{i}")
    return params


def segformer_decode_head_params_from_torch(sd, cfg, prefix="decode_head",
                                            include_classifier=True):
    """HF SegformerDecodeHead state_dict -> (params, batch_stats)."""
    params = {}
    for i in range(cfg.num_stages):
        params[f"linear_c_{i}"] = _linear(sd, f"{prefix}.linear_c.{i}.proj")
    params["linear_fuse"] = _conv(sd, f"{prefix}.linear_fuse")
    params["batch_norm"] = {
        "scale": _np(sd[f"{prefix}.batch_norm.weight"]),
        "bias": _np(sd[f"{prefix}.batch_norm.bias"]),
    }
    batch_stats = {"batch_norm": {
        "mean": _np(sd[f"{prefix}.batch_norm.running_mean"]),
        "var": _np(sd[f"{prefix}.batch_norm.running_var"]),
    }}
    if include_classifier and f"{prefix}.classifier.weight" in sd:
        params["classifier"] = _conv(sd, f"{prefix}.classifier")
    return params, batch_stats


def segformer_params_from_torch(sd, cfg):
    """Full HF SegformerForSemanticSegmentation -> flax variables dict."""
    enc = segformer_encoder_params_from_torch(sd, cfg)
    head, stats = segformer_decode_head_params_from_torch(sd, cfg)
    return {
        "params": {"encoder": enc, "decode_head": head},
        "batch_stats": {"decode_head": stats},
    }


def vivim_init_from_hf_segformer(sd, cfg):
    """HF SegformerForSemanticSegmentation snapshot -> PARTIAL Vivim
    variables: exactly the tensors the reference takes from
    nvidia/segformer-b3-finetuned-ade-512-512 at construction
    (/root/reference/modeling/vivim.py:264-267) — the encoder stages and
    the decode head's linear_c / linear_fuse / batch_norm.  Mamba layers,
    the output conv and the edge head stay freshly initialized.

    Use with a LOCAL snapshot directory (zero-egress environments download
    nothing): ``-hf_dir`` on the training CLIs.
    """
    seg = cfg.segformer
    enc_full = segformer_encoder_params_from_torch(sd, seg)
    # Vivim skips the per-stage encoder LayerNorms (vivim.py:211-212)
    enc = {k: v for k, v in enc_full.items() if k.startswith("stage_")}
    head, stats = segformer_decode_head_params_from_torch(
        sd, seg, include_classifier=False)
    params = {"encoder": enc}
    for i in range(seg.num_stages):
        params[f"linear_c_{i}"] = head[f"linear_c_{i}"]
    params["linear_fuse"] = {"kernel": head["linear_fuse"]["kernel"]}
    params["batch_norm"] = head["batch_norm"]
    return {"params": params, "batch_stats": stats}


def load_torch_state_dict(path):
    """Load a torch state dict from a file or an HF snapshot directory
    (model.safetensors preferred, else pytorch_model.bin)."""
    import os

    if os.path.isdir(path):
        st = os.path.join(path, "model.safetensors")
        bin_ = os.path.join(path, "pytorch_model.bin")
        path = st if os.path.exists(st) else bin_
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return sd.get("state_dict", sd) if isinstance(sd, dict) else sd


# ---------------------------------------------------------------------------
# Mamba / Vivim conversion
# ---------------------------------------------------------------------------


def mamba_params_from_torch(sd, prefix):
    """Reference Mamba (bimamba v3) module weights -> MambaV3 params.

    Name map (mamba_simple.py:69-186): in_proj/out_proj Linears; per
    direction suffix s in {"", "_b", "_s"}: conv1d{s} depthwise
    (d_inner, 1, width) -> (width, d_inner); x_proj{s}; dt_proj{s}
    (weight + bias); A{s}_log; D{s}.
    """
    p = {}
    p["in_proj_kernel"] = _np(sd[f"{prefix}.in_proj.weight"])
    if f"{prefix}.in_proj.bias" in sd:
        p["in_proj_bias"] = _np(sd[f"{prefix}.in_proj.bias"])
    p["out_proj_kernel"] = _np(sd[f"{prefix}.out_proj.weight"])
    if f"{prefix}.out_proj.bias" in sd:
        p["out_proj_bias"] = _np(sd[f"{prefix}.out_proj.bias"])
    for s in ("", "_b", "_s"):
        if f"{prefix}.A{s}_log" not in sd:
            continue
        conv_w = _np(sd[f"{prefix}.conv1d{s}.weight"])  # (d, 1, w)
        p[f"conv1d{s}_kernel"] = np.transpose(conv_w[:, 0, :], (1, 0))
        if f"{prefix}.conv1d{s}.bias" in sd:
            p[f"conv1d{s}_bias"] = _np(sd[f"{prefix}.conv1d{s}.bias"])
        p[f"x_proj{s}_kernel"] = _np(sd[f"{prefix}.x_proj{s}.weight"])
        p[f"dt_proj{s}_kernel"] = _np(sd[f"{prefix}.dt_proj{s}.weight"])
        p[f"dt_proj{s}_bias"] = _np(sd[f"{prefix}.dt_proj{s}.bias"])
        p[f"A{s}_log"] = _np(sd[f"{prefix}.A{s}_log"])
        p[f"D{s}"] = _np(sd[f"{prefix}.D{s}"])
    return p


def strip_lightning_prefix(sd, prefix="model."):
    """Strip the Lightning wrapper prefix (inference.py:217-225 semantics)."""
    return {k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Full reference-Vivim checkpoint conversion
# ---------------------------------------------------------------------------


def _conv3d(sd, prefix):
    """torch Conv3d depthwise (C, 1, k, k, k) -> flax DHWIO (k, k, k, 1, C)."""
    w = _np(sd[f"{prefix}.weight"])
    out = {"kernel": np.transpose(w, (2, 3, 4, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def vivim_params_from_torch(sd, cfg):
    """Reference Vivim state_dict -> vivim_tpu.nn.vivim.Vivim variables.

    Name map from /root/reference/modeling/vivim.py:
    - ``encoder.downsample_layers.*`` = the HF SegFormer encoder
      (patch_embeddings / block / layer_norm, vivim.py:178,202-213);
    - ``encoder.stages.{i}.{j}.0.*`` = MambaLayer j of stage i
      (norm1 / mamba.* / norm2 / mlp.{fc1,dwconv.dwconv,fc2}, vivim.py:111-159,
      183-189);
    - ``decoder.linear_c.{i}.proj`` / ``decoder.linear_fuse`` /
      ``decoder.batch_norm`` = the re-used HF decode head (vivim.py:288-319);
    - ``out`` = the 1x1 output conv (vivim.py:272); ``edgeocr_cls_head`` =
      the optional edge head (vivim.py:275-278).

    ``cfg``: VivimConfig (for depths / stage counts).  Lightning ``model.``
    prefixes should be stripped first (strip_lightning_prefix).
    """
    seg = cfg.segformer
    enc = segformer_encoder_params_from_torch(
        sd, seg, prefix="encoder.downsample_layers")
    for i in range(seg.num_stages):
        for j in range(cfg.depths[i]):
            lp = f"encoder.stages.{i}.{j}.0"
            enc[f"mamba_{i}_{j}"] = {
                "norm1": _ln(sd, f"{lp}.norm1"),
                "norm2": _ln(sd, f"{lp}.norm2"),
                "mamba": mamba_params_from_torch(sd, f"{lp}.mamba"),
                "mlp": {
                    "fc1": _linear(sd, f"{lp}.mlp.fc1"),
                    "dwconv": _conv3d(sd, f"{lp}.mlp.dwconv.dwconv"),
                    "fc2": _linear(sd, f"{lp}.mlp.fc2"),
                },
            }
    # the reference's mamba_block skips the per-stage LayerNorm in forward
    # (vivim.py:211-212) but the params exist; my VivimEncoder has no stage
    # norms, so they are intentionally dropped here.
    for i in range(seg.num_stages):
        enc.pop(f"norm_{i}", None)

    params = {"encoder": enc}
    for i in range(seg.num_stages):
        params[f"linear_c_{i}"] = _linear(sd, f"decoder.linear_c.{i}.proj")
    params["linear_fuse"] = _conv(sd, "decoder.linear_fuse")
    params["batch_norm"] = {
        "scale": _np(sd["decoder.batch_norm.weight"]),
        "bias": _np(sd["decoder.batch_norm.bias"]),
    }
    params["out"] = _conv(sd, "out")
    if "edgeocr_cls_head.weight" in sd:
        params["edge_head"] = _conv(sd, "edgeocr_cls_head")
    batch_stats = {"batch_norm": {
        "mean": _np(sd["decoder.batch_norm.running_mean"]),
        "var": _np(sd["decoder.batch_norm.running_var"]),
    }}
    return {"params": params, "batch_stats": batch_stats}


def mamba_lm_params_from_torch(sd, n_layer):
    """Reference MambaLMHeadModel state_dict -> nn.lm.MambaLM params.

    Name map (mixer_seq_simple.py:83-233): ``backbone.embedding.weight``
    (tied lm_head), per layer ``backbone.layers.{i}.mixer.*`` (single
    forward-direction Mamba) and ``backbone.layers.{i}.norm.*``, final
    ``backbone.norm_f.*``.
    """
    sd = strip_lightning_prefix(sd)
    params = {"embedding": _np(sd["backbone.embedding.weight"])}
    for i in range(n_layer):
        params[f"mixer_{i}"] = mamba_params_from_torch(
            sd, f"backbone.layers.{i}.mixer")
        params[f"norm_{i}"] = _ln(sd, f"backbone.layers.{i}.norm")
    params["norm_f"] = _ln(sd, "backbone.norm_f")
    return params
