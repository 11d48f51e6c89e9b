"""Jitted train/eval steps and optimizer assembly.

Training semantics from the reference harness
(/root/reference/multiclass_training_folds.py):

- AdamW(lr=initlr, betas=(0.9, 0.999), weight_decay=1e-2) (:503-517) with
  global-norm gradient clipping at 1.0 and cosine annealing to
  ``eta_min = initlr * 0.01`` over the training run (CosineAnnealingLR with
  T_max=epochs steps per epoch; here a smooth per-step cosine over
  epochs*steps_per_epoch — same endpoints).
- Loss is computed over ALL clip frames: logits (B, T, H, W, C) and one-hot
  masks are flattened to (B*T, ...) and targets are argmax class indices
  (:545-573).
- Train metric: micro Jaccard over the flattened frames (:571).

TPU-first: one jitted step updates params + batch_stats + opt state; the
batch is sharded over the ``data`` mesh axis and XLA inserts the gradient
all-reduce (no Lightning/DDP machinery).  no-weight-decay parameters
(A_log, D, biases, norms) are masked out of AdamW's decay, matching the
``_no_weight_decay`` tagging in mamba_simple.py:116-122.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from vivim_tpu.train import losses as losses_lib


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def _no_decay_mask(params):
    """True where weight decay applies: 2D+ kernels only (no biases, norms,
    A_log, D — mirroring torch AdamW defaults + _no_weight_decay tags)."""

    def mask_fn(path, p):
        name = "/".join(str(k.key) for k in path if hasattr(k, "key"))
        if p.ndim < 2:
            return False
        if "A" in name.split("/")[-1] and name.endswith("_log"):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(lr: float, weight_decay: float, total_steps: int,
                   eta_min_ratio: float = 0.01, clip_norm: float = 1.0,
                   decay_mask: str = "tagged", mu_dtype=None):
    """``decay_mask``: "tagged" (default) masks biases/norms/A_log/D out of
    AdamW's decay, honoring mamba's ``_no_weight_decay`` tags; "torch"
    decays ALL trainable params — the reference's actual behavior
    (multiclass_training_folds.py:505 builds AdamW with no param groups, so
    the tags are dead code there).  "tagged" is the better-practice default;
    use "torch" for exact training-semantics parity.

    ``mu_dtype``: dtype for AdamW's first moment (e.g. jnp.bfloat16) —
    halves the mu read+write HBM traffic per step (~0.6 GB at the 60M-param
    bench config).  The second moment stays fp32 (its wide dynamic range
    under the sqrt is bf16-unsafe)."""
    if decay_mask not in ("tagged", "torch"):
        raise ValueError(f"decay_mask must be 'tagged' or 'torch', "
                         f"got {decay_mask!r}")
    mask = _no_decay_mask if decay_mask == "tagged" else None
    schedule = optax.cosine_decay_schedule(
        init_value=lr, decay_steps=max(total_steps, 1), alpha=eta_min_ratio)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, weight_decay=weight_decay,
                    mask=mask, mu_dtype=mu_dtype),
    ), schedule


def create_train_state(model, sample_batch, rng, lr, weight_decay,
                       total_steps, mesh=None, decay_mask="tagged",
                       mu_dtype=None):
    init_rng, state_rng = jax.random.split(rng)
    variables = jax.jit(model.init)(init_rng, sample_batch)
    tx, _ = make_optimizer(lr, weight_decay, total_steps,
                           decay_mask=decay_mask, mu_dtype=mu_dtype)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=state_rng,
    )
    if mesh is not None:
        from vivim_tpu.parallel.mesh import replicate
        state = replicate(state, mesh)
    return state, tx


def jaccard_counts(logits, targets, num_classes):
    """Summed (tp, fp, fn) over all classes as a (3,) f32 vector — the
    sufficient statistic for micro Jaccard (additive across sub-batches,
    which is what lets gradient accumulation report the exact full-batch
    metric)."""
    preds = jnp.argmax(logits, axis=-1)
    tp = fp = fn = 0.0
    for c in range(num_classes):
        p = preds == c
        g = targets == c
        tp = tp + jnp.sum(p & g)
        fp = fp + jnp.sum(p & ~g)
        fn = fn + jnp.sum(~p & g)
    return jnp.stack([tp, fp, fn]).astype(jnp.float32)


def micro_jaccard(logits, targets, num_classes):
    """Micro-averaged multiclass Jaccard (torchmetrics semantics)."""
    tp, fp, fn = jaccard_counts(logits, targets, num_classes)
    return tp / jnp.maximum(tp + fp + fn, 1)


def flatten_frames(logits, masks):
    """(B, T, H, W, C) logits + one-hot masks -> (B*T, H, W, C) logits and
    (B*T, H, W) int targets (training_step reshape, :549-563)."""
    B, T, H, W, C = logits.shape
    logits = logits.reshape(B * T, H, W, C)
    targets = jnp.argmax(masks, axis=-1).reshape(B * T, H, W)
    return logits, targets


def cast_floating(tree, dtype):
    """Cast float32 leaves to ``dtype`` (mixed-precision compute: master
    params stay f32; autodiff through the cast returns f32 grads)."""
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if hasattr(p, "dtype")
        and p.dtype == jnp.float32 else p, tree)


def make_train_step(model, loss_fn: Callable | str = "recall_focused",
                    num_classes: int = 3, tx=None, edge_loss_fn=None,
                    compute_dtype=None, grad_accum: int = 1,
                    donate: bool = False, state_shardings=None):
    """Returns a jitted train step: (state, batch) -> (state, metrics).

    ``batch``: dict with clip (B, T, H, W, 3), masks (B, T, H, W, C)
    [, edges (B, T, H, W, 1)].  ``edge_loss_fn``: fn(seg_logits, seg_masks,
    edge_logits, edge_masks) on the (B, T, ...) tensors — e.g.
    ``edge_loss.make_multiclass_edge_criterion()``.  ``compute_dtype``:
    e.g. jnp.bfloat16 for cast-params mixed precision (losses and the scan
    state remain fp32, and the Mamba modules keep their fp32 A_log/D/
    dt_bias islands).

    ``grad_accum``: micro-batch gradient accumulation (beyond-reference;
    the batch-scaling study in docs/DESIGN.md shows bs>=16 cannot fit HBM
    without whole-block remat — accumulation reaches the same effective
    batch at micro-batch activation memory instead of recompute FLOPs).
    The batch's leading dim must be divisible by ``grad_accum``; a
    ``lax.scan`` over contiguous micro-batches averages the gradients and
    the loss, accumulates the exact full-batch micro-Jaccard counts, and
    applies ONE optimizer update.  Each micro-batch gets a distinct
    dropout fold; batch_stats (BN running stats) thread sequentially
    through the scan — equivalent to ``grad_accum`` sequential BN updates,
    not one update at the full batch (the same semantics torch gets when
    accumulating).

    ``donate``: donate the incoming train state's buffers to the step —
    XLA aliases them into the returned state instead of double-buffering
    params + optimizer state (~0.9 GB at the 60M-param bench config, the
    margin that decides whether bs=16 fits HBM).  The caller must not
    touch the OLD state object after the call; the epoch-loop pattern
    ``state, m = step(state, batch)`` is safe by construction.

    ``state_shardings``: a TrainState-shaped pytree of ``NamedSharding``
    (``parallel.fsdp.fsdp_state_shardings``) pinned as the step's
    ``out_shardings`` for the carried state, so a ZeRO/FSDP-sharded state
    STAYS sharded across steps instead of being re-replicated by sharding
    propagation.  Inputs are inferred from the placed state; metrics are
    left unconstrained (scalars).
    """
    if isinstance(loss_fn, str):
        loss_fn = losses_lib.LOSSES[loss_fn]
    with_edge = edge_loss_fn is not None
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    import functools
    jit_kwargs = {}
    if donate:
        jit_kwargs["donate_argnums"] = 0
    if state_shardings is not None:
        jit_kwargs["out_shardings"] = (state_shardings, None)
    jit_step = (functools.partial(jax.jit, **jit_kwargs) if jit_kwargs
                else jax.jit)

    def compute_loss(params, batch, batch_stats, rng):
        clip = batch["clip"]
        if compute_dtype is not None:
            params = cast_floating(params, compute_dtype)
            clip = clip.astype(compute_dtype)
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            clip, deterministic=False,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        if with_edge:
            logits5, edge5 = out
        else:
            logits5 = out
        logits, targets = flatten_frames(logits5, batch["masks"])
        loss = loss_fn(logits, targets, num_classes)
        if with_edge:
            loss = loss + edge_loss_fn(
                logits5, batch["masks"], edge5, batch["edges"])
        return loss, (logits, targets, updates)

    def finish(state, new_rng, loss, counts, grads, batch_stats):
        if compute_dtype is not None:
            batch_stats = cast_floating(batch_stats, jnp.float32)
        new_params_updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, new_params_updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=batch_stats,
            opt_state=new_opt_state,
            rng=new_rng,
        )
        tp, fp, fn = counts
        metrics = {
            "loss": loss,
            "jaccard": tp / jnp.maximum(tp + fp + fn, 1),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    @jit_step
    def step(state: TrainState, batch):
        rng, new_rng = jax.random.split(jax.random.fold_in(
            state.rng, state.step))
        (loss, (logits, targets, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(
                state.params, batch, state.batch_stats, rng)
        return finish(state, new_rng, loss,
                      jaccard_counts(logits, targets, num_classes),
                      grads, updates["batch_stats"])

    @jit_step
    def step_accum(state: TrainState, batch):
        B = batch["clip"].shape[0]
        if B % grad_accum != 0:
            raise ValueError(
                f"batch size {B} not divisible by grad_accum={grad_accum}")
        rng, new_rng = jax.random.split(jax.random.fold_in(
            state.rng, state.step))
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(grad_accum, B // grad_accum, *x.shape[1:]),
            batch)

        def body(carry, xs):
            batch_stats, gsum, lsum, csum = carry
            mb, i = xs
            (loss, (logits, targets, updates)), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(
                    state.params, mb, batch_stats, jax.random.fold_in(rng, i))
            batch_stats = updates["batch_stats"]
            if compute_dtype is not None:
                # keep the scan carry type-stable (BN stats come back in
                # compute dtype when the inputs were cast)
                batch_stats = cast_floating(batch_stats, jnp.float32)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            return (batch_stats, gsum, lsum + loss,
                    csum + jaccard_counts(logits, targets, num_classes)), None

        init = (
            state.batch_stats if compute_dtype is None
            else cast_floating(state.batch_stats, jnp.float32),
            jax.tree_util.tree_map(jnp.zeros_like, state.params),
            jnp.zeros((), jnp.float32),
            jnp.zeros((3,), jnp.float32),
        )
        (batch_stats, gsum, lsum, csum), _ = jax.lax.scan(
            body, init, (micro, jnp.arange(grad_accum)))
        grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
        return finish(state, new_rng, lsum / grad_accum, csum, grads,
                      batch_stats)

    return step if grad_accum == 1 else step_accum


def confusion_matrix_device(preds, targets, num_classes: int):
    """Aggregated (C, C) confusion matrix (rows = GT, cols = pred) as C*C
    fused boolean reductions — jittable, no scatter."""
    rows = []
    for g in range(num_classes):
        gm = targets == g
        rows.append(jnp.stack([
            jnp.sum(gm & (preds == p), dtype=jnp.int32)
            for p in range(num_classes)]))
    return jnp.stack(rows)


def make_eval_step(model, loss_fn: Callable | str = "recall_focused",
                   num_classes: int = 3, with_edge: bool = False,
                   compute_dtype=None, edge_loss_fn=None,
                   return_preds: bool = False):
    """Jitted eval step -> (loss, confusion (B*T, C, 4) int32, cm (C, C)
    int32[, preds (B*T, H, W) int32 when ``return_preds``]).

    The metric accumulation (per-sample per-class tp/fp/tn/fn and the
    aggregated confusion matrix) runs ON DEVICE: only O(B*T*C) counters
    transfer to host, never the (B*T, H, W, C) logits — at 512px eval the
    logit transfer would dominate (the reference ships full logits to the
    CPU per batch, multiclass_training_folds.py:575-640).  ``return_preds``
    additionally returns the int label maps (for visualization; 4 bytes/px
    vs 4*C for logits).

    When ``edge_loss_fn`` is given the edge term is included in the val
    loss, mirroring the reference validation criterion
    (multiclass_training_folds.py:749-762)."""
    if isinstance(loss_fn, str):
        loss_fn = losses_lib.LOSSES[loss_fn]
    from vivim_tpu.train.metrics import per_class_confusion

    @jax.jit
    def step(state: TrainState, batch):
        params, clip = state.params, batch["clip"]
        if compute_dtype is not None:
            params = cast_floating(params, compute_dtype)
            clip = clip.astype(compute_dtype)
        out = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            clip, deterministic=True)
        logits5 = out[0] if with_edge else out
        logits, targets = flatten_frames(logits5, batch["masks"])
        loss = loss_fn(logits, targets, num_classes)
        if with_edge and edge_loss_fn is not None and "edges" in batch:
            loss = loss + edge_loss_fn(
                logits5, batch["masks"], out[1], batch["edges"])
        preds = jnp.argmax(logits, axis=-1)
        conf = per_class_confusion(preds, targets, num_classes)
        cm = confusion_matrix_device(preds, targets, num_classes)
        if return_preds:
            return loss, conf, cm, preds
        return loss, conf, cm

    return step
