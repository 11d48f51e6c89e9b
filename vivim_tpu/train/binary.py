"""Binary (lesion/background) pretraining steps and threshold-sweep eval.

Reference: /root/reference/complements/train_binary.py —

- Adam (no weight decay, :133) + cosine annealing to lr*0.01 (:136);
- loss on the CENTER frame only (``pred[nFrames//2::nFrames]``, :187);
  criterion = structure_loss, or JointEdgeSegLoss with ``with_edge``;
- validation (:205-335): center-frame predictions swept over 256 thresholds
  (Medical curves) plus S-measure / E-measure / MAE.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import optax

from vivim_tpu.train.loop import TrainState
from vivim_tpu.train.losses import structure_loss


def make_binary_optimizer(lr, total_steps, eta_min_ratio=0.01):
    schedule = optax.cosine_decay_schedule(lr, max(total_steps, 1),
                                           alpha=eta_min_ratio)
    return optax.adam(schedule, b1=0.9, b2=0.999), schedule


def center_frames(x, nframes):
    """(B, T, ...) -> (B, ...) center frame (train_binary.py:187)."""
    return x[:, nframes // 2]


def make_binary_train_step(model, tx, with_edge=False, edge_loss_fn=None,
                           grad_accum: int = 1, state_shardings=None):
    """``grad_accum``: micro-batch accumulation inside the jitted step —
    same semantics as the multiclass trainer's (loop.make_train_step):
    lax.scan over contiguous micro-batches, distinct dropout folds,
    sequentially threaded batch_stats, averaged grads/loss, ONE update.

    ``state_shardings``: a TrainState-shaped pytree of ``NamedSharding``
    (parallel.fsdp.fsdp_state_shardings) pinned as the step's
    ``out_shardings`` so the carried state STAYS ZeRO-sharded across steps
    (without it, GSPMD is free to re-replicate the output) — same contract
    as loop.make_train_step."""
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    jit_kwargs = {}
    if state_shardings is not None:
        jit_kwargs["out_shardings"] = (state_shardings, None)

    def compute_loss(params, batch, batch_stats, rng):
        T = batch["clip"].shape[1]
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["clip"], deterministic=False, rngs={"dropout": rng},
            mutable=["batch_stats"])
        if with_edge:
            logits5, edge5 = out
        else:
            logits5 = out
        pred = center_frames(logits5, T)       # (B, H, W, 1)
        mask = center_frames(batch["masks"], T)
        loss = structure_loss(pred, mask)
        if with_edge and edge_loss_fn is not None:
            loss = edge_loss_fn(pred, mask, center_frames(edge5, T),
                                center_frames(batch["edges"], T))
        return loss, updates

    def finish(state, new_rng, loss, grads, batch_stats):
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, upd),
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=new_rng,
        )
        return new_state, {"loss": loss}

    @functools.partial(jax.jit, **jit_kwargs)
    def step(state: TrainState, batch):
        rng, new_rng = jax.random.split(
            jax.random.fold_in(state.rng, state.step))
        (loss, updates), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(
                state.params, batch, state.batch_stats, rng)
        return finish(state, new_rng, loss, grads, updates["batch_stats"])

    @functools.partial(jax.jit, **jit_kwargs)
    def step_accum(state: TrainState, batch):
        import jax.numpy as jnp

        B = batch["clip"].shape[0]
        if B % grad_accum != 0:
            raise ValueError(
                f"batch size {B} not divisible by grad_accum={grad_accum}")
        rng, new_rng = jax.random.split(
            jax.random.fold_in(state.rng, state.step))
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(grad_accum, B // grad_accum, *x.shape[1:]),
            batch)

        def body(carry, xs):
            batch_stats, gsum, lsum = carry
            mb, i = xs
            (loss, updates), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(
                    state.params, mb, batch_stats, jax.random.fold_in(rng, i))
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            return (updates["batch_stats"], gsum, lsum + loss), None

        init = (state.batch_stats,
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
                jnp.zeros((), jnp.float32))
        (batch_stats, gsum, lsum), _ = jax.lax.scan(
            body, init, (micro, jnp.arange(grad_accum)))
        grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
        return finish(state, new_rng, lsum / grad_accum, grads, batch_stats)

    return step if grad_accum == 1 else step_accum


def make_binary_eval_step(model, with_edge=False):
    @jax.jit
    def step(state: TrainState, batch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["clip"], deterministic=True)
        logits5 = out[0] if with_edge else out
        T = batch["clip"].shape[1]
        pred = jax.nn.sigmoid(center_frames(logits5, T))  # (B, H, W, 1)
        mask = center_frames(batch["masks"], T)
        loss = structure_loss(center_frames(logits5, T), mask)
        return loss, pred, mask

    return step


class BinaryValidator:
    """Threshold-sweep validation (train_binary.py:205-335): Medical
    Sen/Spe/Dice/IoU curves + S-measure, E-measure, MAE over center-frame
    saliency predictions."""

    def __init__(self):
        from vivim_tpu.train import saliency_metrics as SM

        self.medical = SM.Medical()
        self.sm = SM.Smeasure()
        self.em = SM.Emeasure()
        self.mae = SM.MAE()
        self.wfm = SM.WeightedFmeasure()
        self.losses = []

    def update(self, loss, preds, masks):
        self.losses.append(float(loss))
        preds = np.asarray(preds)[..., 0]
        masks = np.asarray(masks)[..., 0]
        for p, g in zip(preds, masks):
            self.medical.step(p, g)
            self.sm.step(p, g)
            self.em.step(p, g)
            self.mae.step(p, g)
            self.wfm.step(p, g)

    def results(self):
        med = self.medical.get_results()
        return {
            "val/loss": float(np.mean(self.losses)) if self.losses else 0.0,
            "val/dice": med["maxDice"],
            "val/iou": med["maxIoU"],
            "val/Smeasure": self.sm.get_results()["Smeasure"],
            "val/Emeasure": self.em.get_results()["meanEm"],
            "val/MAE": self.mae.get_results()["MAE"],
            "val/wFmeasure": self.wfm.get_results()["wFmeasure"],
        }
