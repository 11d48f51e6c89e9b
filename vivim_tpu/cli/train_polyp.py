"""Polyp video-segmentation training driver (the upstream Vivim task).

TPU-native equivalent of
/root/reference/original_training_scripts_not_used/train_pl_polyp.py:
binary Vivim over polyp clip datasets (Frame/GT layout, centered per-frame
windows), Adam + cosine, center-frame structure_loss (or JointEdgeSegLoss
with ``-with_edge``, classes=2; :94), validation with the saliency
measures (S-measure / E-measure / MAE / weighted-F; on_validation_epoch_end
:173-241) — reusing the binary training harness, which implements exactly
these semantics (train/binary.py).  The reference logs to TensorBoard;
here metrics go to JSONL (+ optional wandb), the repo's logging backbone.

Usage:
  python -m vivim_tpu.cli.train_polyp -data_path polyp_root \\
      -clip_length 5 -image_size 256 -epochs 50 [-val_path TestDir]
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from vivim_tpu.cli.args import build_train_parser
from vivim_tpu.cli.common import (
    build_model,
    maybe_load_hf_segformer,
    maybe_load_pretrained,
    setup_data_parallelism,
)
from vivim_tpu.data.loader import DataLoader
from vivim_tpu.data.polyp import PolypDataset, PolypTestDataset
from vivim_tpu.train import binary as B
from vivim_tpu.train.checkpoints import CheckpointManager
from vivim_tpu.train.logging import MetricLogger
from vivim_tpu.train.loop import TrainState


def main(argv=None):
    parser = build_train_parser(__doc__)
    parser.add_argument("-val_path", "--val_path", type=str, default=None,
                        help="test tree ({dir}/Frame layout); defaults to "
                             "the train videos without augmentation")
    args = parser.parse_args(argv)
    if not args.data_path:
        parser.error("-data_path is required (root holding Train/)")

    # through the shared builder so -exact_gelu/-remat/-seq_shards apply
    model, cfg = build_model(args, out_chans=1)

    train_ds = PolypDataset(args.data_path, args.image_size,
                            clip_len=args.clip_length,
                            augment=args.augment_intensity != "none",
                            seed=args.seed)
    if len(train_ds) == 0:
        raise SystemExit(
            f"no training clips found under {args.data_path!r} — expected "
            "{root}/Train/{video}/Frame/*.jpg with sibling GT/*.png")
    if args.val_path:
        val_ds = PolypTestDataset(args.val_path, args.image_size,
                                  clip_len=args.clip_length, seed=args.seed)
        if len(val_ds) == 0:
            raise SystemExit(
                f"no validation clips found under {args.val_path!r} — "
                "accepted layouts: {root}/Frame/{video}/, {root}/Frame/, "
                "{root}/{video}/Frame/")
    else:
        val_ds = PolypDataset(args.data_path, args.image_size,
                              clip_len=args.clip_length, augment=False,
                              seed=args.seed)
    train_dl = DataLoader(train_ds, args.train_bs,
                          num_workers=args.num_workers, seed=args.seed)
    if len(train_dl) == 0:
        raise SystemExit(
            f"{len(train_ds)} training clip(s) < train_bs={args.train_bs}: "
            "every batch would be dropped (drop_last) and no optimizer "
            "step would run — lower -train_bs or add data")
    val_dl = DataLoader(val_ds, args.val_bs, shuffle=False,
                        num_workers=args.num_workers, drop_last=False,
                        seed=args.seed)

    run_dir = os.path.join(args.save_path, args.exp_name, "polyp")
    logger = MetricLogger(run_dir, run_name=f"{args.exp_name}_polyp",
                          use_wandb=args.wandb, config=vars(args))
    total_steps = args.epochs * max(len(train_dl), 1)
    tx, schedule = B.make_binary_optimizer(args.initlr, total_steps)

    sample = jnp.zeros((args.train_bs, args.clip_length, args.image_size,
                        args.image_size, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(args.seed), sample)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       rng=jax.random.PRNGKey(args.seed + 1))
    state = maybe_load_hf_segformer(args, cfg, state)
    state = maybe_load_pretrained(args, model, state)
    # -n_devices: shard the clip batch over a 'data' mesh (GSPMD grad
    # all-reduce); -zero: additionally shard params + Adam moments
    # leaf-wise (parallel/fsdp.py) — placement after the weight grafts
    state, mesh, state_shardings, shard = setup_data_parallelism(
        args, cfg, state)
    edge_loss_fn = None
    if args.with_edge:
        from vivim_tpu.train.edge_loss import make_joint_edge_seg_loss

        edge_loss_fn = make_joint_edge_seg_loss()
    train_step = B.make_binary_train_step(model, tx, args.with_edge,
                                          edge_loss_fn,
                                          grad_accum=args.grad_accum,
                                          state_shardings=state_shardings)
    eval_step = B.make_binary_eval_step(model, args.with_edge)
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"),
                             monitor="val/dice", mode="max", top_k=1)

    metrics = {}
    for epoch in range(args.epochs):
        train_dl.set_epoch(epoch)
        losses = []
        for batch in train_dl:
            db = shard({k: v for k, v in batch.items() if k != "paths"})
            state, m = train_step(state, db)
            losses.append(float(m["loss"]))
        metrics = {"train/loss": float(np.mean(losses)) if losses else 0.0,
                   "train/lr": float(schedule(int(state.step)))}
        if (epoch + 1) % args.val_freq == 0:
            validator = B.BinaryValidator()
            for batch in val_dl:
                db = {k: v for k, v in batch.items() if k != "paths"}
                loss, preds, masks = eval_step(state, db)
                validator.update(loss, preds, masks)
            metrics.update(validator.results())
            print(f"epoch {epoch}: " + ", ".join(
                f"{k}={v:.4f}" for k, v in metrics.items()))
        logger.log(metrics, step=int(state.step))
        ckpt.save(state, int(state.step), metrics)
    ckpt.wait()
    logger.finish()
    return metrics


if __name__ == "__main__":
    main()
