"""Tests for the binary pretraining path: binary train/eval steps,
center-frame loss semantics, threshold-sweep validator, and the OTU_2D
dataset (reference: complements/train_binary.py, complements/OTU_dataset.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vivim_tpu.nn.vivim import Vivim, VivimConfig
from vivim_tpu.train import loop as loop_lib
from vivim_tpu.train.binary import (
    BinaryValidator,
    center_frames,
    make_binary_eval_step,
    make_binary_optimizer,
    make_binary_train_step,
)


@pytest.fixture(scope="module")
def binary_model():
    cfg = VivimConfig.tiny_test(out_chans=1)
    model = Vivim(cfg)
    rng = jax.random.PRNGKey(0)
    clip = jax.random.normal(rng, (2, 3, 32, 32, 3), jnp.float32)
    tx, _ = make_binary_optimizer(1e-3, total_steps=10)
    variables = model.init(rng, clip)
    state = loop_lib.TrainState(
        step=0, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), rng=rng)
    yy, xx = jnp.mgrid[:32, :32]
    blob = ((yy - 16) ** 2 + (xx - 16) ** 2 < 100).astype(jnp.float32)
    masks = jnp.broadcast_to(blob[None, None, :, :, None], (2, 3, 32, 32, 1))
    batch = {"clip": clip, "masks": masks}
    return model, tx, state, batch


def test_center_frames():
    x = jnp.arange(2 * 5 * 3).reshape(2, 5, 3)
    np.testing.assert_array_equal(np.asarray(center_frames(x, 5)),
                                  np.asarray(x[:, 2]))


def test_binary_train_step_learns(binary_model):
    """A few steps on a fixed blob target reduce the center-frame
    structure loss (train_binary.py:187 center-frame semantics)."""
    model, tx, state, batch = binary_model
    step = make_binary_train_step(model, tx)
    state, m0 = step(state, batch)
    first = float(m0["loss"])
    for _ in range(6):
        state, m = step(state, batch)
    assert np.isfinite(first)
    assert float(m["loss"]) < first


def test_binary_train_step_grad_accum(binary_model):
    """grad_accum=2 on the binary step: one optimizer update, finite loss
    equal to the mean of the two micro-batch losses (full parity semantics
    are covered by the multiclass twin,
    test_train_e2e.py::test_grad_accum_matches_manual_microbatch_loop)."""
    model, tx, state, batch = binary_model
    step2 = make_binary_train_step(model, tx, grad_accum=2)
    new_state, m = step2(state, batch)
    assert int(new_state.step) == int(state.step) + 1
    assert np.isfinite(float(m["loss"]))
    with pytest.raises(ValueError, match="not divisible"):
        make_binary_train_step(model, tx, grad_accum=3)(state, batch)


def test_binary_eval_step_and_validator(binary_model):
    model, tx, state, batch = binary_model
    eval_step = make_binary_eval_step(model)
    loss, preds, masks = eval_step(state, batch)
    assert preds.shape == (2, 32, 32, 1)
    assert float(jnp.min(preds)) >= 0.0 and float(jnp.max(preds)) <= 1.0
    val = BinaryValidator()
    val.update(loss, preds, masks)
    res = val.results()
    for key in ("val/loss", "val/dice", "val/iou", "val/Smeasure",
                "val/Emeasure", "val/MAE", "val/wFmeasure"):
        assert np.isfinite(res[key]), key
    # a perfect prediction maxes the threshold-sweep dice
    val2 = BinaryValidator()
    val2.update(0.0, masks, masks)
    assert val2.results()["val/dice"] == pytest.approx(1.0, abs=1e-6)
    assert val2.results()["val/MAE"] == pytest.approx(0.0, abs=1e-6)


def test_otu_dataset(tmp_path):
    from PIL import Image

    from vivim_tpu.data.otu import OTUDataset

    (tmp_path / "images").mkdir()
    (tmp_path / "annotations").mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, (80, 96, 3), np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / f"case_{i}.jpg")
        m = np.zeros((80, 96), np.uint8)
        m[20:60, 30:70] = 255
        Image.fromarray(m).save(tmp_path / "annotations" / f"case_{i}.PNG")
    ds = OTUDataset(str(tmp_path), size=32, augment="none")
    assert len(ds) == 3
    out = ds.load_clip(0)
    assert out["clip"].shape == (1, 32, 32, 3)
    assert out["masks"].shape == (1, 32, 32, 1)
    assert set(np.unique(out["masks"])) <= {0.0, 1.0}
    assert out["edges"].shape == (1, 32, 32, 1)
    # augmented load keeps shapes and binarization
    ds_aug = OTUDataset(str(tmp_path), size=32, augment="medium")
    out2 = ds_aug.load_clip(1)
    assert out2["clip"].shape == (1, 32, 32, 3)
    assert set(np.unique(out2["masks"])) <= {0.0, 1.0}
