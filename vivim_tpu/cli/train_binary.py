"""Binary Vivim pretraining driver.

TPU-native equivalent of /root/reference/complements/train_binary.py:
binary Vivim (out_chans=1), Adam + cosine, structure_loss (or the joint
edge loss with ``-with_edge``) on the CENTER frame only, validation via the
256-threshold sweep + S/E/MAE measures.  Data source: a gathered video tree
(frame + background mask, mask inverted so foreground=lesion,
complements/main_dataset.py:14-15) or the OTU_2D single-image corpus
(``-otu true``).

Usage:
  python -m vivim_tpu.cli.train_binary -data_path TrainData \\
      -clip_length 5 -image_size 256 -epochs 50 [-otu true]
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from vivim_tpu.cli.args import build_train_parser, str2bool
from vivim_tpu.cli.common import (
    build_model,
    maybe_load_hf_segformer,
    maybe_load_pretrained,
    setup_data_parallelism,
)
from vivim_tpu.data.dataset import ClipDataset
from vivim_tpu.data.loader import DataLoader
from vivim_tpu.train import binary as B
from vivim_tpu.train.checkpoints import CheckpointManager
from vivim_tpu.train.logging import MetricLogger
from vivim_tpu.train.loop import TrainState


def main(argv=None):
    parser = build_train_parser(__doc__)
    parser.add_argument("-otu", "--otu", type=str2bool, default=False,
                        help="data_path is an OTU_2D images/annotations dir")
    parser.add_argument("-val_path", "--val_path", type=str, default=None)
    args = parser.parse_args(argv)
    if not args.data_path:
        parser.error("-data_path is required")

    # through the shared builder so -exact_gelu/-remat/-seq_shards apply
    model, cfg = build_model(args, out_chans=1)

    if args.otu:
        from vivim_tpu.data.otu import OTUDataset

        train_ds = OTUDataset(args.data_path, args.image_size,
                              augment=args.augment_intensity, seed=args.seed)
        val_ds = OTUDataset(args.val_path or args.data_path, args.image_size,
                            augment="none", seed=args.seed)
        clip_len = 1
    else:
        cache = dict(cache_decoded=getattr(args, "cache_decoded", False),
                     cache_mb=getattr(args, "cache_mb", 4096),
                     pre_resize=getattr(args, "pre_resize", False))
        train_ds = ClipDataset(
            args.data_path, size=args.image_size, clip_len=args.clip_length,
            max_num=args.max_numerosity, augment=args.augment_intensity,
            mask_keys=("background",), invert_background=True,
            dynamic=args.dynamic, seed=args.seed, **cache)
        val_ds = ClipDataset(
            args.val_path or args.data_path, size=args.image_size,
            clip_len=args.clip_length, augment="none",
            mask_keys=("background",), invert_background=True,
            seed=args.seed, **cache)
        clip_len = args.clip_length
    if len(train_ds) == 0:
        raise SystemExit(
            f"no training samples found under {args.data_path!r}")
    train_dl = DataLoader(train_ds, args.train_bs,
                          num_workers=args.num_workers, seed=args.seed)
    if len(train_dl) == 0:
        raise SystemExit(
            f"{len(train_ds)} training sample(s) < train_bs={args.train_bs}: "
            "every batch would be dropped (drop_last) and no optimizer "
            "step would run — lower -train_bs or add data")
    val_dl = DataLoader(val_ds, args.val_bs, shuffle=False,
                        num_workers=args.num_workers, drop_last=False,
                        seed=args.seed)

    run_dir = os.path.join(args.save_path, args.exp_name, "binary")
    logger = MetricLogger(run_dir, run_name=f"{args.exp_name}_binary",
                          use_wandb=args.wandb, config=vars(args))
    total_steps = args.epochs * max(len(train_dl), 1)
    tx, schedule = B.make_binary_optimizer(args.initlr, total_steps)

    sample = jnp.zeros((args.train_bs, clip_len, args.image_size,
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

        joint = make_joint_edge_seg_loss()
        edge_loss_fn = lambda seg_l, seg_m, edge_l, edge_m: joint(
            seg_l, seg_m, edge_l, edge_m)
    train_step = B.make_binary_train_step(model, tx, args.with_edge,
                                          edge_loss_fn,
                                          grad_accum=args.grad_accum,
                                          state_shardings=state_shardings)
    eval_step = B.make_binary_eval_step(model, args.with_edge)
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"),
                             monitor="val/dice", mode="max", top_k=1)

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
