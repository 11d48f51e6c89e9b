"""Inference CLI: timed sliding-clip evaluation with metrics and plots.

TPU-native equivalent of /root/reference/inference.py:

- sliding-clip test dataset over a gathered video tree (:162-195);
- checkpoint loading: orbax params dir, a trainer checkpoint dir, or a
  reference Lightning .ckpt (``model.`` prefix stripped, :211-230);
- timed jitted forward per batch with FPS / avg/min/max batch latency
  accounting (:294-324, 414-436) — device-synced via block_until_ready;
- softmax -> argmax predictions (:333-334); per-frame per-class metrics
  (:99-128, presence-gated tracker);
- aggregated confusion matrices raw / row-normalized / col-normalized with
  heatmap plots (:453-533);
- prediction visualization grids with the class palette bg=black,
  solid=red, non-solid=yellow (:25-29, 545-584);
- ``metrics.json`` dump (:640-645).

Usage:
  python -m vivim_tpu.cli.infer --ckpt runs/exp/fold_0/ckpt --data_dir test/
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

CLASS_COLORS = np.array([[0, 0, 0], [255, 0, 0], [255, 255, 0]], np.uint8)
CLASS_NAMES = ["background", "solid", "non-solid"]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Vivim TPU inference")
    p.add_argument("--ckpt", type=str, required=True,
                   help="orbax params/trainer ckpt dir or torch .ckpt")
    p.add_argument("--with_edge", type=lambda v: str(v).lower() in
                   ("1", "true"), default=False)
    p.add_argument("--num_classes", type=int, default=3)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--clip_length", type=int, default=5)
    p.add_argument("--output_dir", type=str, default="results_multiclass")
    p.add_argument("--save_vis", type=lambda v: str(v).lower() in
                   ("1", "true"), default=False)
    p.add_argument("--vis_count", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--segformer", type=str, default="b3",
                   choices=["b0", "b3", "tiny"])
    p.add_argument("--wandb", type=lambda v: str(v).lower() in
                   ("1", "true"), default=False)
    p.add_argument("--gathered", type=lambda v: str(v).lower() in
                   ("1", "true"), default=True,
                   help="data_dir is already a gathered video tree")
    p.add_argument("--wandb_project", type=str,
                   default="vivim-tpu-inference")
    p.add_argument("--wandb_name", type=str, default="vivim_inference")
    p.add_argument("-cv_group", "--cv_group", type=str,
                   default="Vivim_Inference",
                   help="(reference compatibility; unused)")
    return p.parse_args(argv)


def load_model(args):
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from vivim_tpu.cli.common import build_model

    model, cfg = build_model(args)
    x = jnp.zeros((1, args.clip_length, args.image_size, args.image_size, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    path = os.path.abspath(args.ckpt)
    if path.endswith(".ckpt") or path.endswith(".pth"):
        return model, cfg, _load_torch_ckpt(path, cfg)
    if os.path.isdir(path):
        subs = sorted(d for d in os.listdir(path)
                      if d.startswith(("best_", "last_")))
        if subs:  # trainer checkpoint dir: prefer best over last
            best = [d for d in subs if d.startswith("best_")]
            path = os.path.join(path, (best or subs)[-1])
    raw = ocp.StandardCheckpointer().restore(path)
    if isinstance(raw, dict) and "params" in raw:
        variables = {"params": raw["params"],
                     "batch_stats": raw.get("batch_stats",
                                            variables.get("batch_stats", {}))}
    else:
        variables = {"params": raw,
                     "batch_stats": variables.get("batch_stats", {})}
    return model, cfg, variables


def _load_torch_ckpt(path, cfg):
    """Reference Lightning checkpoint -> flax variables
    (inference.py:211-230 prefix handling + full Vivim name conversion)."""
    import torch

    from vivim_tpu.convert.torch_to_jax import (
        strip_lightning_prefix,
        vivim_params_from_torch,
    )

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = strip_lightning_prefix(sd)
    return vivim_params_from_torch(sd, cfg)


def prepare_test_data(args):
    from vivim_tpu.data.dataset import ClipDataset
    from vivim_tpu.data.loader import DataLoader
    from vivim_tpu.data.gather import gather_multiclass_frames

    root = args.data_dir
    if not args.gathered:
        index = gather_multiclass_frames(root, copy=False)
        root = {v: [{"frame": r["frame"], "background": r["background"],
                     "solid": r.get("solid"), "non-solid": r.get("non-solid")}
                    for r in e] for v, e in index.items()}
    ds = ClipDataset(root, size=args.image_size, clip_len=args.clip_length,
                     augment="none", with_edges=False)
    dl = DataLoader(ds, args.batch_size, shuffle=False, num_workers=2,
                    drop_last=False)
    return ds, dl


def run_inference(args, model, variables, loader):
    import jax
    import jax.numpy as jnp

    from vivim_tpu.train.loop import confusion_matrix_device
    from vivim_tpu.train.metrics import (
        MulticlassMetricsTracker,
        per_class_confusion,
    )

    @jax.jit
    def forward(clip, masks):
        """Predict + accumulate metrics ON DEVICE: only the (B*T, C, 4)
        counters, the (C, C) matrix and int label maps transfer to host
        (the reference ships full softmax maps, inference.py:294-334)."""
        out = model.apply(variables, clip, deterministic=True)
        logits = out[0] if isinstance(out, tuple) else out
        B, T, H, W, C = logits.shape
        preds = jnp.argmax(logits, axis=-1).reshape(B * T, H, W)
        targets = jnp.argmax(masks, axis=-1).reshape(B * T, H, W)
        conf = per_class_confusion(preds, targets, args.num_classes)
        cm = confusion_matrix_device(preds, targets, args.num_classes)
        return preds.reshape(B, T, H, W).astype(jnp.uint8), conf, cm

    tracker = MulticlassMetricsTracker(args.num_classes)
    cm = np.zeros((args.num_classes,) * 2, np.int64)
    batch_times = []
    total_frames = 0
    vis_saved = 0
    os.makedirs(args.output_dir, exist_ok=True)

    for batch in loader:
        clip = jnp.asarray(batch["clip"])
        masks = jnp.asarray(batch["masks"])
        t0 = time.time()
        preds_d, conf_d, cm_d = forward(clip, masks)
        # device->host fetch both syncs honestly (block_until_ready does not
        # on tunneled runtimes) and is part of the per-batch latency anyway
        conf = np.asarray(conf_d)
        cm_b = np.asarray(cm_d)
        batch_times.append(time.time() - t0)
        total_frames += clip.shape[0] * clip.shape[1]
        tracker.update_from_confusion(conf)
        cm += cm_b.astype(np.int64)
        if args.save_vis and vis_saved < args.vis_count:
            preds = np.asarray(preds_d).astype(int)  # (B, T, H, W)
            vis_saved += _save_vis(args, batch, preds, vis_saved)

    # FPS accounting (inference.py:414-436): first batch excluded as warmup
    times = batch_times[1:] or batch_times
    total_time = sum(times)
    frames_timed = total_frames - (loader.batch_size * args.clip_length
                                   if len(batch_times) > 1 else 0)
    fps = frames_timed / total_time if total_time > 0 else 0.0
    perf = {
        "fps": fps,
        "total_frames": int(total_frames),
        "total_time_sec": total_time,
        "avg_batch_time": float(np.mean(times)),
        "min_batch_time": float(np.min(times)),
        "max_batch_time": float(np.max(times)),
    }
    return tracker.get_results(), cm, perf


def _save_vis(args, batch, preds, start_idx):
    """Prediction grids: input | GT overlay | prediction overlay."""
    from PIL import Image

    from vivim_tpu.data.augment import denormalize_image

    saved = 0
    B, T = preds.shape[:2]
    for b in range(B):
        t = T // 2
        img = denormalize_image(batch["clip"][b, t])
        img = np.clip(img * 255, 0, 255).astype(np.uint8)
        gt = batch["masks"][b, t].argmax(-1).astype(int)
        pr = preds[b, t].astype(int)
        row = np.concatenate(
            [img, CLASS_COLORS[gt], CLASS_COLORS[pr]], axis=1)
        Image.fromarray(row).save(os.path.join(
            args.output_dir, f"vis_{start_idx + saved:04d}.png"))
        saved += 1
    return saved


def plot_confusion_matrices(cm, output_dir, wandb_run=None):
    """Raw / row-norm / col-norm heatmaps -> PNGs (+ wandb Images when a
    run is active, inference.py:453-533)."""
    import matplotlib.pyplot as plt

    from vivim_tpu.train.logging import confusion_heatmap

    cm = cm.astype(np.float64)
    variants = {
        "confusion_matrix": cm,
        "confusion_matrix_row_norm": cm / np.maximum(cm.sum(1, keepdims=True), 1),
        "confusion_matrix_col_norm": cm / np.maximum(cm.sum(0, keepdims=True), 1),
    }
    for name, mat in variants.items():
        fig = confusion_heatmap(mat, CLASS_NAMES)
        fig.savefig(os.path.join(output_dir, f"{name}.png"))
        if wandb_run is not None:
            import wandb

            wandb_run.log({name: wandb.Image(fig)})
        plt.close(fig)


def main(argv=None):
    args = parse_args(argv)
    wandb_run = None
    if args.wandb:
        try:
            import wandb

            wandb_run = wandb.init(project=args.wandb_project,
                                   name=args.wandb_name)
        except Exception as e:
            print(f"[infer] wandb unavailable ({e})")
    model, cfg, variables = load_model(args)
    _, loader = prepare_test_data(args)
    results, cm, perf = run_inference(args, model, variables, loader)

    os.makedirs(args.output_dir, exist_ok=True)
    plot_confusion_matrices(cm, args.output_dir, wandb_run=wandb_run)
    summary = {
        "performance": perf,
        "metrics": results,
        "confusion_matrix": cm.tolist(),
    }
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=2, default=str)
    if wandb_run is not None:
        flat = dict(perf)
        for m in ("dice", "jaccard", "precision", "recall"):
            flat[f"{m}_mean"] = results[m]["mean"]
        wandb_run.log(flat)
        # sample-prediction panels as wandb images (inference.py:534-584)
        if args.save_vis:
            import wandb

            vis_files = sorted(
                f for f in os.listdir(args.output_dir)
                if f.startswith("vis_") and f.endswith(".png"))
            for f in vis_files[:args.vis_count]:
                wandb_run.log({f"predictions/{f[:-4]}": wandb.Image(
                    os.path.join(args.output_dir, f))})
        wandb_run.finish()
    print(json.dumps(perf, indent=2))
    for m in ("dice", "jaccard", "precision", "recall"):
        print(m, results[m]["mean"], results[m]["per_class"])
    return summary


if __name__ == "__main__":
    main()
