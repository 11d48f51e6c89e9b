"""Final full-data retrain driver.

TPU-native equivalent of /root/reference/final_multiclass_training.py (and
final_multi_train_dyn.py via ``-dynamic true``): trains on the FULL training
tree (no folds), validation loader = training set, checkpoint monitored on
``train/loss`` (min, top-3), validation effectively once at the end
(check_val_every_n_epoch = epochs-1, final_multiclass_training.py:781-782).

Usage:
  python -m vivim_tpu.cli.train_final -data_path Multiclass_TrainData \\
      -clip_length 5 -image_size 256 -train_bs 3 -epochs 50
"""

from __future__ import annotations

import os

from vivim_tpu.cli.args import build_train_parser
from vivim_tpu.cli.common import (
    build_loaders,
    build_model,
    maybe_load_hf_segformer,
    maybe_load_pretrained,
)
from vivim_tpu.train.logging import MetricLogger
from vivim_tpu.train.trainer import Trainer, TrainerConfig


def main(argv=None):
    parser = build_train_parser(__doc__)
    args = parser.parse_args(argv)
    if not args.data_path:
        parser.error("-data_path is required (gathered train tree)")

    model, cfg = build_model(args)
    # val loader = train set, no augmentation (final_multiclass_training.py:462)
    train_dl, val_dl = build_loaders(args, args.data_path, args.data_path,
                                     dynamic=args.dynamic)
    run_dir = os.path.join(args.save_path, args.exp_name, "final")
    logger = MetricLogger(run_dir, run_name=f"{args.exp_name}_final",
                          use_wandb=args.wandb, config=vars(args))
    tcfg = TrainerConfig(
        epochs=args.epochs,
        val_freq=max(args.epochs - 1, 1),  # validate once at the end
        lr=args.initlr, weight_decay=args.weight_decay,
        num_classes=args.num_classes, loss=args.loss,
        monitor="train/loss", monitor_mode="min", top_k=3, seed=args.seed,
        bf16=args.bf16, grad_accum=args.grad_accum,
        decay_mask=args.decay_mask,
        profile_dir=args.profile_dir, zero=args.zero)
    from vivim_tpu.cli.common import trainer_mesh
    mesh = trainer_mesh(args, cfg)
    edge_loss_fn = None
    if args.with_edge:
        from vivim_tpu.train.edge_loss import make_multiclass_edge_criterion
        edge_loss_fn = make_multiclass_edge_criterion()
    trainer = Trainer(model, tcfg, train_dl, val_dl,
                      os.path.join(run_dir, "ckpt"), logger, mesh=mesh,
                      with_edge=args.with_edge, edge_loss_fn=edge_loss_fn)
    trainer.state = maybe_load_hf_segformer(args, cfg, trainer.state)
    trainer.state = maybe_load_pretrained(args, model, trainer.state)
    best = trainer.fit(resume_path=args.resume_path)
    logger.finish()
    print(f"[final] best {tcfg.monitor}: {best}")
    return best


if __name__ == "__main__":
    main()
