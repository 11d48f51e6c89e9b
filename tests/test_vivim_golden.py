"""Cross-framework golden parity: flax MambaV3 / Vivim vs the torch twin.

The round-trip converter test (test_vivim_convert.py) builds the torch dict
FROM the flax params, so it cannot catch a *shared* semantic error.  Here
the ground truth is an independent torch implementation of the reference's
slow path (tests/torch_vivim_ref.py), exercising the tri-directional
averaging, the nframes frame<->position permute, the scan numerics and the
decode-head assembly end to end (VERDICT round-1 item 2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.torch_vivim_ref import MambaRefTorch, VivimRefTorch
from vivim_tpu.convert import torch_to_jax as cv
from vivim_tpu.nn.mamba import MambaV3
from vivim_tpu.nn.vivim import Vivim, VivimConfig


def test_mamba_v3_golden():
    """Flax MambaV3 == reference slow-path math on the same weights."""
    torch.manual_seed(0)
    d_model, nframes, spatial, batch = 16, 5, 6, 2
    L = nframes * spatial
    ref = MambaRefTorch(d_model=d_model, nframes=nframes).eval()
    sd = {f"m.{k}": v for k, v in ref.state_dict().items()}
    params = cv.mamba_params_from_torch(sd, "m")

    x = torch.randn(batch, L, d_model)
    with torch.no_grad():
        want = ref(x).numpy()

    model = MambaV3(d_model=d_model, scan_implementation="ref")
    got = model.apply({"params": params}, jnp.asarray(x.numpy()),
                      nframes=nframes)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def _tiny_hf_model(cfg):
    hf_cfg = transformers.SegformerConfig(
        num_channels=cfg.num_channels,
        depths=list(cfg.depths),
        hidden_sizes=list(cfg.hidden_sizes),
        num_attention_heads=list(cfg.num_attention_heads),
        sr_ratios=list(cfg.sr_ratios),
        patch_sizes=list(cfg.patch_sizes),
        strides=list(cfg.strides),
        mlp_ratios=list(cfg.mlp_ratios),
        decoder_hidden_size=cfg.decoder_hidden_size,
        num_labels=cfg.num_labels,
    )
    torch.manual_seed(1)
    return transformers.SegformerForSemanticSegmentation(hf_cfg)


def test_vivim_forward_golden():
    """Full eval-mode Vivim forward (+edge head) matches the torch twin."""
    cfg = VivimConfig.tiny_test(with_edge=True)
    seg = cfg.segformer
    assert not seg.gelu_approximate  # exact erf GELU for parity

    hf = _tiny_hf_model(seg)
    ref = VivimRefTorch(
        hf, out_chans=cfg.out_chans, depths=tuple(cfg.depths),
        feat_size=tuple(cfg.feat_size), hidden_size=cfg.hidden_size,
        with_edge=True, nframes=5).eval()

    variables = cv.vivim_params_from_torch(ref.state_dict(), cfg)

    torch.manual_seed(2)
    x = torch.randn(1, 5, 3, 32, 32)
    with torch.no_grad():
        want_logits, want_edge = ref(x)
    want_logits = want_logits.numpy()  # (B*T, C, H, W)
    want_edge = want_edge.numpy()

    model = Vivim(cfg)
    x_jax = jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2))  # channels-last
    got_logits, got_edge = model.apply(variables, x_jax, deterministic=True)

    B, T, H, W, C = got_logits.shape
    got_logits = np.asarray(got_logits).reshape(B * T, H, W, C).transpose(
        0, 3, 1, 2)
    got_edge = np.asarray(got_edge).reshape(B * T, H, W, 1).transpose(
        0, 3, 1, 2)
    np.testing.assert_allclose(got_logits, want_logits, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_edge, want_edge, rtol=1e-3, atol=1e-3)


def test_mamba_lm_golden():
    """Flax MambaLM == an independently-executed torch MambaLMHeadModel
    twin on the same (converted) weights: embedding, prenorm eps=1e-5
    residual blocks, single-direction mixers, tied lm_head
    (mixer_seq_simple.py:83-233).  Catches converter drift AND model-math
    drift (it caught the flax-default 1e-6 norm eps divergence)."""
    from tests.torch_vivim_ref import MambaLMRefTorch
    from vivim_tpu.nn.lm import MambaLM, MambaLMConfig

    torch.manual_seed(3)
    vocab, d_model, n_layer = 48, 32, 2
    ref = MambaLMRefTorch(vocab, d_model, n_layer).eval()
    params = cv.mamba_lm_params_from_torch(ref.state_dict(), n_layer)

    tokens = torch.randint(0, vocab, (2, 9))
    with torch.no_grad():
        want = ref(tokens).numpy()

    cfg = MambaLMConfig(vocab_size=vocab, d_model=d_model, n_layer=n_layer)
    assert cfg.padded_vocab == vocab  # keep the tied head comparable
    model = MambaLM(cfg, scan_implementation="ref")
    got = model.apply({"params": params}, jnp.asarray(tokens.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_mamba_lm_rms_norm_golden():
    """rms_norm=True MambaLM (the norm real pretrained mamba checkpoints
    use: MixerModel rms_norm option, mixer_seq_simple.py:25,37; Triton
    ``rms_norm_ref`` semantics) == the torch twin on converted weights —
    including the weight-only norm through the converter's ``_ln`` and
    residual_in_fp32 (a no-op in this all-fp32 test, exercised for trace
    validity)."""
    from tests.torch_vivim_ref import MambaLMRefTorch
    from vivim_tpu.nn.lm import MambaLM, MambaLMConfig

    torch.manual_seed(5)
    vocab, d_model, n_layer = 48, 32, 2
    ref = MambaLMRefTorch(vocab, d_model, n_layer, rms_norm=True).eval()
    # perturb the norm weights away from init-ones so the test has teeth
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "norm" in name:
                p.add_(0.1 * torch.randn_like(p))
    params = cv.mamba_lm_params_from_torch(ref.state_dict(), n_layer)
    assert "bias" not in params["norm_0"]  # weight-only RMSNorm tree

    tokens = torch.randint(0, vocab, (2, 9))
    with torch.no_grad():
        want = ref(tokens).numpy()

    cfg = MambaLMConfig(vocab_size=vocab, d_model=d_model, n_layer=n_layer,
                        rms_norm=True, residual_in_fp32=True)
    model = MambaLM(cfg, scan_implementation="ref")
    got = model.apply({"params": params}, jnp.asarray(tokens.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
