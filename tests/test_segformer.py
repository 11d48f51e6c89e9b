"""Golden-activation parity: Flax SegFormer vs HuggingFace torch SegFormer.

Constructs an HF model with random weights from config (no network), converts
the weights, and compares encoder feature maps and decode-head logits — the
strongest available fidelity test for the largest silent-divergence surface
(SURVEY.md §7 hard parts).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vivim_tpu.nn import segformer as sf
from vivim_tpu.convert import torch_to_jax as cv


def _small_cfg():
    return sf.SegformerConfig(
        depths=(1, 2, 1, 1),
        hidden_sizes=(8, 16, 24, 32),
        num_attention_heads=(1, 2, 2, 4),
        sr_ratios=(8, 4, 2, 1),
        decoder_hidden_size=32,
        num_labels=5,
        drop_path_rate=0.1,
        classifier_dropout=0.1,
    )


def _hf_model(cfg):
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
        drop_path_rate=cfg.drop_path_rate,
        classifier_dropout_prob=cfg.classifier_dropout,
    )
    torch.manual_seed(0)
    model = transformers.SegformerForSemanticSegmentation(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def hf_and_flax():
    cfg = _small_cfg()
    hf = _hf_model(cfg)
    variables = cv.segformer_params_from_torch(hf.state_dict(), cfg)
    return cfg, hf, variables


def test_encoder_feature_parity(hf_and_flax):
    cfg, hf, variables = hf_and_flax
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        hf_out = hf.segformer.encoder(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            output_hidden_states=True)
    hf_feats = [np.transpose(h.numpy(), (0, 2, 3, 1))
                for h in hf_out.hidden_states]

    enc = sf.SegformerEncoder(cfg)
    feats = enc.apply({"params": variables["params"]["encoder"]},
                      jnp.asarray(x))
    assert len(feats) == len(hf_feats) == cfg.num_stages
    for i, (got, want) in enumerate(zip(feats, hf_feats)):
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-4, atol=1e-4,
            err_msg=f"stage {i} feature mismatch")


def test_full_model_logit_parity(hf_and_flax):
    cfg, hf, variables = hf_and_flax
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        want = hf(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).logits
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    model = sf.SegformerForSemanticSegmentation(cfg)
    got = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=2e-4)


def test_train_mode_runs(hf_and_flax):
    """Stochastic paths (dropout, droppath, BN batch stats) execute."""
    import jax

    cfg, _, variables = hf_and_flax
    model = sf.SegformerForSemanticSegmentation(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    out, updates = model.apply(
        variables, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(0)},
        mutable=["batch_stats"])
    assert out.shape == (1, 8, 8, cfg.num_labels)
    assert "batch_stats" in updates
