"""Reference-Vivim checkpoint conversion round-trip.

Builds a torch-style state_dict with the reference's parameter names/layouts
(inverse of the converter's transforms) from a randomly initialized flax
Vivim, converts it back, and checks the tree matches exactly and the model
applies cleanly.  (SegFormer name/layout correctness is separately validated
against real HF weights in test_segformer.py; the Mamba/MambaLayer names are
taken from mamba_simple.py:69-186 and vivim.py:111-159.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vivim_tpu.convert import torch_to_jax as cv
from vivim_tpu.nn.vivim import Vivim, VivimConfig


def _inv_linear(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.transpose(np.asarray(p["kernel"]),
                                          (3, 2, 0, 1))
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_conv3d(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.transpose(np.asarray(p["kernel"]),
                                          (4, 3, 0, 1, 2))
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_ln(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _build_reference_state_dict(variables, cfg):
    """flax Vivim variables -> reference-named torch-style state_dict."""
    sd = {}
    seg = cfg.segformer
    enc = variables["params"]["encoder"]
    pre = "encoder.downsample_layers"
    for i in range(seg.num_stages):
        st = enc[f"stage_{i}"]
        _inv_conv(sd, f"{pre}.patch_embeddings.{i}.proj", st["embed"]["proj"])
        _inv_ln(sd, f"{pre}.patch_embeddings.{i}.layer_norm",
                st["embed"]["norm"])
        for j in range(seg.depths[i]):
            lp = f"{pre}.block.{i}.{j}"
            ly = st[f"layer_{j}"]
            _inv_ln(sd, f"{lp}.layer_norm_1", ly["norm1"])
            _inv_ln(sd, f"{lp}.layer_norm_2", ly["norm2"])
            at = ly["attn"]
            _inv_linear(sd, f"{lp}.attention.self.query", at["query"])
            _inv_linear(sd, f"{lp}.attention.self.key", at["key"])
            _inv_linear(sd, f"{lp}.attention.self.value", at["value"])
            _inv_linear(sd, f"{lp}.attention.output.dense", at["proj"])
            if seg.sr_ratios[i] > 1:
                _inv_conv(sd, f"{lp}.attention.self.sr", at["sr"])
                _inv_ln(sd, f"{lp}.attention.self.layer_norm", at["sr_norm"])
            _inv_linear(sd, f"{lp}.mlp.dense1", ly["ffn"]["dense1"])
            _inv_conv(sd, f"{lp}.mlp.dwconv.dwconv", ly["ffn"]["dwconv"])
            _inv_linear(sd, f"{lp}.mlp.dense2", ly["ffn"]["dense2"])
        # stage norms exist in the reference ckpt even though unused
        sd[f"{pre}.layer_norm.{i}.weight"] = np.ones(seg.hidden_sizes[i],
                                                     np.float32)
        sd[f"{pre}.layer_norm.{i}.bias"] = np.zeros(seg.hidden_sizes[i],
                                                    np.float32)
        for j in range(cfg.depths[i]):
            ml = enc[f"mamba_{i}_{j}"]
            lp = f"encoder.stages.{i}.{j}.0"
            _inv_ln(sd, f"{lp}.norm1", ml["norm1"])
            _inv_ln(sd, f"{lp}.norm2", ml["norm2"])
            mp = ml["mamba"]
            sd[f"{lp}.mamba.in_proj.weight"] = np.asarray(
                mp["in_proj_kernel"])
            sd[f"{lp}.mamba.out_proj.weight"] = np.asarray(
                mp["out_proj_kernel"])
            for s in ("", "_b", "_s"):
                sd[f"{lp}.mamba.conv1d{s}.weight"] = np.transpose(
                    np.asarray(mp[f"conv1d{s}_kernel"]), (1, 0))[:, None, :]
                sd[f"{lp}.mamba.conv1d{s}.bias"] = np.asarray(
                    mp[f"conv1d{s}_bias"])
                sd[f"{lp}.mamba.x_proj{s}.weight"] = np.asarray(
                    mp[f"x_proj{s}_kernel"])
                sd[f"{lp}.mamba.dt_proj{s}.weight"] = np.asarray(
                    mp[f"dt_proj{s}_kernel"])
                sd[f"{lp}.mamba.dt_proj{s}.bias"] = np.asarray(
                    mp[f"dt_proj{s}_bias"])
                sd[f"{lp}.mamba.A{s}_log"] = np.asarray(mp[f"A{s}_log"])
                sd[f"{lp}.mamba.D{s}"] = np.asarray(mp[f"D{s}"])
            _inv_linear(sd, f"{lp}.mlp.fc1", ml["mlp"]["fc1"])
            _inv_conv3d(sd, f"{lp}.mlp.dwconv.dwconv", ml["mlp"]["dwconv"])
            _inv_linear(sd, f"{lp}.mlp.fc2", ml["mlp"]["fc2"])
    p = variables["params"]
    for i in range(seg.num_stages):
        _inv_linear(sd, f"decoder.linear_c.{i}.proj", p[f"linear_c_{i}"])
    _inv_conv(sd, "decoder.linear_fuse", p["linear_fuse"])
    _inv_ln(sd, "decoder.batch_norm", p["batch_norm"])
    bs = variables["batch_stats"]["batch_norm"]
    sd["decoder.batch_norm.running_mean"] = np.asarray(bs["mean"])
    sd["decoder.batch_norm.running_var"] = np.asarray(bs["var"])
    _inv_conv(sd, "out", p["out"])
    if "edge_head" in p:
        _inv_conv(sd, "edgeocr_cls_head", p["edge_head"])
    return sd


def test_vivim_conversion_roundtrip():
    cfg = VivimConfig.tiny_test(with_edge=True)
    model = Vivim(cfg)
    x = jnp.zeros((1, 5, 32, 32, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    sd = _build_reference_state_dict(variables, cfg)
    sd = {("model." + k): v for k, v in sd.items()}  # Lightning prefix
    sd = cv.strip_lightning_prefix(sd)
    converted = cv.vivim_params_from_torch(sd, cfg)

    flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(
        converted["params"])[0])
    assert len(flat_a) == len(flat_b), (
        f"param count mismatch: {len(flat_a)} vs {len(flat_b)}")
    for path, val in flat_a:
        np.testing.assert_array_equal(
            np.asarray(val), np.asarray(flat_b[path]),
            err_msg=f"mismatch at {path}")
    # converted variables drive the model
    out, edge = model.apply(converted, x)
    assert out.shape == (1, 5, 32, 32, cfg.out_chans)


def test_mamba_lm_conversion_roundtrip():
    """MambaLMHeadModel-style state_dict -> MambaLM params, exact."""
    from vivim_tpu.convert.torch_to_jax import mamba_lm_params_from_torch
    from vivim_tpu.nn.lm import MambaLM, MambaLMConfig

    cfg = MambaLMConfig(vocab_size=48, d_model=16, n_layer=2)
    model = MambaLM(cfg, scan_implementation="ref")
    toks = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)["params"]
    sd = {"backbone.embedding.weight": np.asarray(params["embedding"])}
    for i in range(2):
        mp = params[f"mixer_{i}"]
        pre = f"backbone.layers.{i}.mixer"
        sd[f"{pre}.in_proj.weight"] = np.asarray(mp["in_proj_kernel"])
        sd[f"{pre}.out_proj.weight"] = np.asarray(mp["out_proj_kernel"])
        sd[f"{pre}.conv1d.weight"] = np.transpose(
            np.asarray(mp["conv1d_kernel"]), (1, 0))[:, None, :]
        sd[f"{pre}.conv1d.bias"] = np.asarray(mp["conv1d_bias"])
        sd[f"{pre}.x_proj.weight"] = np.asarray(mp["x_proj_kernel"])
        sd[f"{pre}.dt_proj.weight"] = np.asarray(mp["dt_proj_kernel"])
        sd[f"{pre}.dt_proj.bias"] = np.asarray(mp["dt_proj_bias"])
        sd[f"{pre}.A_log"] = np.asarray(mp["A_log"])
        sd[f"{pre}.D"] = np.asarray(mp["D"])
        sd[f"backbone.layers.{i}.norm.weight"] = np.asarray(
            params[f"norm_{i}"]["scale"])
        sd[f"backbone.layers.{i}.norm.bias"] = np.asarray(
            params[f"norm_{i}"]["bias"])
    sd["backbone.norm_f.weight"] = np.asarray(params["norm_f"]["scale"])
    sd["backbone.norm_f.bias"] = np.asarray(params["norm_f"]["bias"])
    conv = mamba_lm_params_from_torch(sd, 2)
    fa = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    fb = dict(jax.tree_util.tree_flatten_with_path(conv)[0])
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))
    out = model.apply({"params": conv}, toks)
    assert out.shape == (1, 4, cfg.padded_vocab)


def test_hf_dir_segformer_graft(tmp_path):
    """-hf_dir path: a local HF segformer snapshot initializes exactly the
    reference's from_pretrained surface (encoder stages + decode-head
    linear_c/linear_fuse/batch_norm, vivim.py:264-267), leaving Mamba
    layers and the output conv freshly initialized."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax
    import jax.numpy as jnp

    from vivim_tpu.cli.common import _overlay
    from vivim_tpu.convert.torch_to_jax import (
        load_torch_state_dict,
        vivim_init_from_hf_segformer,
    )
    from vivim_tpu.nn.vivim import Vivim, VivimConfig

    cfg = VivimConfig.tiny_test()
    seg = cfg.segformer
    hf_cfg = transformers.SegformerConfig(
        num_channels=seg.num_channels, depths=list(seg.depths),
        hidden_sizes=list(seg.hidden_sizes),
        num_attention_heads=list(seg.num_attention_heads),
        sr_ratios=list(seg.sr_ratios), patch_sizes=list(seg.patch_sizes),
        strides=list(seg.strides), mlp_ratios=list(seg.mlp_ratios),
        decoder_hidden_size=seg.decoder_hidden_size, num_labels=3)
    torch.manual_seed(0)
    hf = transformers.SegformerForSemanticSegmentation(hf_cfg)
    torch.save(hf.state_dict(), tmp_path / "pytorch_model.bin")

    sd = load_torch_state_dict(str(tmp_path))
    part = vivim_init_from_hf_segformer(sd, cfg)

    model = Vivim(cfg)
    clip = jnp.zeros((1, 5, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), clip)
    params = _overlay(dict(variables["params"]), part["params"])
    bstats = _overlay(dict(variables["batch_stats"]), part["batch_stats"])

    # the grafted patch-embed kernel equals the converted HF tensor
    want = np.transpose(
        hf.state_dict()[
            "segformer.encoder.patch_embeddings.0.proj.weight"].numpy(),
        (2, 3, 1, 0))
    got = np.asarray(params["encoder"]["stage_0"]["embed"]["proj"]["kernel"])
    np.testing.assert_allclose(got, want)
    # mamba params untouched by the graft
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["mamba_0_0"]["mamba"]["A_log"]),
        np.asarray(variables["params"]["encoder"]["mamba_0_0"]["mamba"]["A_log"]))
    # grafted model still runs
    out = model.apply({"params": params, "batch_stats": bstats}, clip,
                      deterministic=True)
    assert out.shape == (1, 5, 32, 32, 3)
