"""End-to-end training smoke: synthetic clips -> loader -> trainer -> ckpt.

The minimum end-to-end slice (SURVEY.md §7 step 4): tiny Vivim, clip_len=3,
synthetic data, fwd+loss+grad steps, validation metrics, checkpoint save and
resume.
"""

import os

import numpy as np
import pytest

from tests.data_fixtures import make_gathered_tree
from vivim_tpu.data.dataset import ClipDataset
from vivim_tpu.data.loader import DataLoader
from vivim_tpu.nn.vivim import Vivim, VivimConfig
from vivim_tpu.train.logging import MetricLogger
from vivim_tpu.train.trainer import Trainer, TrainerConfig


def test_multiclass_edge_train_step():
    """-with_edge multiclass wiring: train step with the center-frame
    joint-edge criterion runs and produces finite loss + grads."""
    import jax
    import jax.numpy as jnp

    from vivim_tpu.train import loop as loop_lib
    from vivim_tpu.train.edge_loss import make_multiclass_edge_criterion

    cfg = VivimConfig.tiny_test(with_edge=True)
    model = Vivim(cfg)
    B, T, S = 1, 3, 32
    rng = np.random.default_rng(0)
    batch = {
        "clip": jnp.asarray(rng.standard_normal((B, T, S, S, 3)),
                            jnp.float32),
        "masks": jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 3, (B, T, S, S))), 3),
        "edges": jnp.asarray(rng.random((B, T, S, S, 1)) > 0.8,
                             jnp.float32),
    }
    state, tx = loop_lib.create_train_state(
        model, batch["clip"], jax.random.PRNGKey(0), lr=1e-3,
        weight_decay=1e-2, total_steps=10)
    step = loop_lib.make_train_step(
        model, "recall_focused", 3, tx,
        edge_loss_fn=make_multiclass_edge_criterion())
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # eval step includes the edge term too
    eval_step = loop_lib.make_eval_step(
        model, "recall_focused", 3, with_edge=True,
        edge_loss_fn=make_multiclass_edge_criterion())
    loss, conf, cm = eval_step(state, batch)
    assert np.isfinite(float(loss))
    assert conf.shape == (B * T, 3, 4)
    assert cm.shape == (3, 3)
    # device-side counters agree with a host recomputation
    assert int(np.asarray(cm).sum()) == B * T * S * S
    assert int(np.asarray(conf)[:, :, 0].sum()) == int(np.trace(cm))


def test_decay_mask_modes():
    """'tagged' skips biases/norms/A_log; 'torch' decays everything
    (reference parity: multiclass_training_folds.py:505 has no param
    groups, so decay applies to ALL params there)."""
    import jax
    import jax.numpy as jnp

    from vivim_tpu.train import loop as loop_lib

    params = {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "mamba": {"A_log": jnp.ones((4, 8)), "D": jnp.ones((4,))},
    }
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    def one_update(decay_mask):
        tx, _ = loop_lib.make_optimizer(
            lr=1.0, weight_decay=0.1, total_steps=100,
            decay_mask=decay_mask)
        updates, _ = tx.update(zero_grads, tx.init(params), params)
        return updates

    tagged = one_update("tagged")
    torch_style = one_update("torch")
    # kernel (2D) decays in both modes
    assert float(jnp.abs(tagged["dense"]["kernel"]).sum()) > 0
    assert float(jnp.abs(torch_style["dense"]["kernel"]).sum()) > 0
    # bias / D (1D) and A_log: only the torch mode decays them
    for path in (("dense", "bias"), ("mamba", "D"), ("mamba", "A_log")):
        t = tagged[path[0]][path[1]]
        r = torch_style[path[0]][path[1]]
        assert float(jnp.abs(t).sum()) == 0.0, path
        assert float(jnp.abs(r).sum()) > 0, path
    with pytest.raises(ValueError):
        loop_lib.make_optimizer(1.0, 0.1, 10, decay_mask="bogus")


def test_bf16_mu_optimizer_state():
    """mu_dtype=bf16 stores AdamW's first moment in bf16 (HBM perf lever,
    docs/DESIGN.md round-3) and still produces sane updates; nu stays f32."""
    import jax
    import jax.numpy as jnp

    from vivim_tpu.train import loop as loop_lib

    params = {"w": jnp.ones((8, 8)), "b": jnp.zeros((8,))}
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 0.1), params)
    tx, _ = loop_lib.make_optimizer(1e-3, 1e-2, 100,
                                    mu_dtype=jnp.bfloat16)
    st = tx.init(params)
    mus = [l for l in jax.tree_util.tree_leaves(st)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment leaves found"
    updates, st = tx.update(grads, st, params)
    new_params = __import__("optax").apply_updates(params, updates)
    for a, b in zip(jax.tree_util.tree_leaves(new_params),
                    jax.tree_util.tree_leaves(params)):
        assert np.isfinite(np.asarray(a)).all()
        assert not np.allclose(np.asarray(a), np.asarray(b))
    # parity vs fp32 mu after one step is tight (first step: mu scale-free)
    tx32, _ = loop_lib.make_optimizer(1e-3, 1e-2, 100)
    up32, _ = tx32.update(grads, tx32.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(updates),
                    jax.tree_util.tree_leaves(up32)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-2, atol=1e-8)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    root = make_gathered_tree(str(tmp / "data"), n_videos=2, n_frames=9,
                              size=32)
    ds = ClipDataset(root, size=32, clip_len=3, augment="light", seed=0)
    val_ds = ClipDataset(root, size=32, clip_len=3, augment="none", seed=0)
    train_dl = DataLoader(ds, batch_size=2, num_workers=0, seed=0)
    val_dl = DataLoader(val_ds, batch_size=2, num_workers=0, shuffle=False,
                        seed=0)
    cfg = VivimConfig.tiny_test()
    model = Vivim(cfg)
    tcfg = TrainerConfig(epochs=2, val_freq=1, lr=1e-3, num_classes=3,
                         log_every=1)
    logger = MetricLogger(str(tmp / "logs"))
    trainer = Trainer(model, tcfg, train_dl, val_dl, str(tmp / "ckpt"),
                      logger)
    return tmp, trainer


def test_fit_and_metrics(env):
    tmp, trainer = env
    best = trainer.fit()
    assert best is not None and 0.0 <= best <= 1.0
    assert int(trainer.state.step) == 2 * len(trainer.train_loader)
    # metrics were logged
    log = (tmp / "logs" / "metrics.jsonl").read_text().strip().splitlines()
    assert any("val/dice" in l for l in log)
    assert any("train/loss" in l for l in log)
    assert any("confusion_matrix" in l for l in log)


def test_checkpoint_resume(env):
    tmp, trainer = env
    assert trainer.ckpt.best_path() is not None
    step_before = int(trainer.state.step)
    restored = trainer.ckpt.restore(trainer.state)
    assert int(restored.step) == step_before
    # params roundtrip exactly
    import jax

    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_validation_shapes(env):
    _, trainer = env
    metrics, results, cm = trainer.validate()
    assert cm.shape == (3, 3)
    assert cm.sum() > 0
    assert "val/dice" in metrics and "val/jacc" in metrics
    assert len(results["dice"]["per_class"]) == 3


def test_bf16_train_step(env):
    """Mixed-precision step: f32 master params, bf16 compute, finite loss."""
    import jax
    import jax.numpy as jnp

    from vivim_tpu.train import loop as loop_lib
    from vivim_tpu.nn.vivim import Vivim, VivimConfig

    cfg = VivimConfig.tiny_test()
    model = Vivim(cfg)
    clip = jnp.zeros((1, 3, 32, 32, 3), jnp.float32)
    state, tx = loop_lib.create_train_state(
        model, clip, jax.random.PRNGKey(0), 1e-3, 1e-2, 10)
    step = loop_lib.make_train_step(model, "recall_focused", 3, tx,
                                    compute_dtype=jnp.bfloat16)
    labels = jax.random.randint(jax.random.PRNGKey(1), (1, 3, 32, 32), 0, 3)
    batch = {"clip": clip, "masks": jax.nn.one_hot(labels, 3)}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # master params remain f32
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype in (jnp.float32,) for l in leaves)


def test_pretrained_partial_load(env, tmp_path):
    """init_weight semantics: overlapping keys loaded, rest kept
    (multiclass_training_folds.py:519-532)."""
    import argparse

    import jax

    from vivim_tpu.cli.common import maybe_load_pretrained
    from vivim_tpu.train.checkpoints import save_params

    _, trainer = env
    path = str(tmp_path / "pre")
    save_params(path, trainer.state.params)
    args = argparse.Namespace(pretrain=path)
    state2 = maybe_load_pretrained(args, trainer.model, trainer.state)
    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(state2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # pretrain=None is a no-op
    args = argparse.Namespace(pretrain=None)
    assert maybe_load_pretrained(args, trainer.model, trainer.state) is \
        trainer.state


def test_grad_accum_matches_manual_microbatch_loop():
    """grad_accum=k: the jitted lax.scan accumulation step is numerically
    identical to an explicit k-micro-batch loop — same per-micro-batch
    dropout folds, sequentially threaded batch_stats, averaged grads, ONE
    optimizer update, and exact full-batch micro-Jaccard counts."""
    import jax
    import jax.numpy as jnp
    import optax

    from vivim_tpu.train import loop as loop_lib
    from vivim_tpu.train.losses import LOSSES

    cfg = VivimConfig.tiny_test()
    model = Vivim(cfg)
    B, T, S, k = 4, 3, 32, 2
    rng = np.random.default_rng(1)
    batch = {
        "clip": jnp.asarray(rng.standard_normal((B, T, S, S, 3)),
                            jnp.float32),
        "masks": jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 3, (B, T, S, S))), 3),
    }
    state, tx = loop_lib.create_train_state(
        model, batch["clip"][:1], jax.random.PRNGKey(3), lr=1e-3,
        weight_decay=1e-2, total_steps=10)
    step = loop_lib.make_train_step(model, "recall_focused", 3, tx,
                                    grad_accum=k)
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1  # one optimizer update, not k

    # manual twin
    loss_fn = LOSSES["recall_focused"]
    r, _ = jax.random.split(jax.random.fold_in(state.rng, state.step))
    bstats = state.batch_stats
    gsum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    lsum, counts = 0.0, jnp.zeros((3,), jnp.float32)
    for i in range(k):
        mb = {kk: v.reshape(k, B // k, *v.shape[1:])[i]
              for kk, v in batch.items()}

        def compute(params, bstats=bstats, mb=mb, i=i):
            out, updates = model.apply(
                {"params": params, "batch_stats": bstats}, mb["clip"],
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(r, i)},
                mutable=["batch_stats"])
            logits, targets = loop_lib.flatten_frames(out, mb["masks"])
            return loss_fn(logits, targets, 3), (logits, targets, updates)

        (loss, (logits, targets, updates)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        bstats = updates["batch_stats"]
        gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
        lsum = lsum + loss
        counts = counts + loop_lib.jaccard_counts(logits, targets, 3)
    grads = jax.tree_util.tree_map(lambda g: g / k, gsum)
    upd, _ = tx.update(grads, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, upd)

    np.testing.assert_allclose(float(metrics["loss"]), float(lsum / k),
                               rtol=1e-5)
    tp, fp, fn = np.asarray(counts)
    np.testing.assert_allclose(float(metrics["jaccard"]),
                               tp / max(tp + fp + fn, 1), rtol=1e-6)
    # grad_norm is the scale-sensitive check (Adam's first-step param
    # update is invariant to gradient SCALE, so a wrong 1/k averaging
    # would pass a params-only comparison)
    np.testing.assert_allclose(float(metrics["grad_norm"]),
                               float(optax.global_norm(grads)), rtol=1e-4)
    # params: f32 scan-vs-eager grad noise passes through Adam's
    # m/(sqrt(v)+eps) which NORMALIZES gradient scale — leaves whose grads
    # are pure roundoff dust (~1e-10) get wholesale-different (though tiny)
    # updates from either execution order, so compare only leaves with
    # meaningful gradients; tolerance is on the ~1e-3 update magnitude
    checked = 0
    for g, got, want in zip(jax.tree_util.tree_leaves(grads),
                            jax.tree_util.tree_leaves(new_state.params),
                            jax.tree_util.tree_leaves(want_params)):
        if float(np.max(np.abs(np.asarray(g)))) < 1e-6:
            continue
        checked += 1
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=2e-5)
    assert checked > 10  # the model's main weights all have real grads
    for got, want in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                         jax.tree_util.tree_leaves(bstats)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    with pytest.raises(ValueError, match="not divisible"):
        loop_lib.make_train_step(model, "recall_focused", 3, tx,
                                 grad_accum=3)(state, batch)


def test_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-training -> the trainer finishes the in-flight step,
    writes a resumable 'last' checkpoint, restores the previous signal
    handlers, and a fresh trainer resumes from it to completion (the
    preemptible-pool discipline; the reference has no failure handling)."""
    import os
    import signal

    root = make_gathered_tree(str(tmp_path / "data"), n_videos=2,
                              n_frames=9, size=32)
    def mk_trainer():
        ds = ClipDataset(root, size=32, clip_len=3, augment="none", seed=0)
        dl = DataLoader(ds, batch_size=2, num_workers=0, seed=0)
        cfg = VivimConfig.tiny_test()
        tcfg = TrainerConfig(epochs=3, val_freq=10, lr=1e-3, num_classes=3)
        return Trainer(Vivim(cfg), tcfg, dl,
                       DataLoader(ds, batch_size=2, num_workers=0,
                                  shuffle=False, seed=0),
                       str(tmp_path / "ckpt"),
                       MetricLogger(str(tmp_path / "logs")))

    trainer = mk_trainer()
    total = 3 * len(trainer.train_loader)
    prev_term = signal.getsignal(signal.SIGTERM)

    orig_log = trainer.logger.log
    fired = []

    def log_and_preempt(*a, **k):
        if not fired:
            fired.append(True)
            os.kill(os.getpid(), signal.SIGTERM)  # delivered to main thread
        return orig_log(*a, **k)

    trainer.logger.log = log_and_preempt
    trainer.fit()
    assert trainer.preempted
    step_at_preempt = int(trainer.state.step)
    assert 0 < step_at_preempt < total
    assert trainer.ckpt.last_path() is not None
    # handlers restored
    assert signal.getsignal(signal.SIGTERM) == prev_term

    fresh = mk_trainer()
    fresh.fit(resume_path=fresh.ckpt.last_path())
    assert not fresh.preempted
    assert int(fresh.state.step) == total
