"""Input-pipeline throughput benchmark.

Proves the host-side loader (PNG decode -> augmentation -> native C++
resize+normalize -> EDT edge bands -> collate) sustains the frame rate the
TPU train step consumes (>= 150 frames/s at the bench config: 30+ clips/s
x 5 frames — BENCH_r*.json), i.e. the step is never input-bound.

Generates a synthetic frame/mask tree when no --data_root is given (decode
cost is real PNG decode either way), then iterates the production
``DataLoader`` and reports frames/s.

Usage:
    python -m vivim_tpu.cli.bench_loader [--data_root DIR] [--image_size 256]
        [--clip_length 5] [--batch_size 3] [--num_workers 8] [--epochs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def make_synthetic_tree(root: str, n_videos: int = 6, n_frames: int = 40,
                        size: int = 512, seed: int = 0) -> None:
    """Write a gathered-layout tree: <root>/<video>/NNNN_{frame,background,
    solid,non-solid}.png (data/gather.py output layout)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for v in range(n_videos):
        vdir = os.path.join(root, f"video_{v:02d}")
        os.makedirs(vdir, exist_ok=True)
        for f in range(n_frames):
            img = rng.integers(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(img).save(
                os.path.join(vdir, f"{f:04d}_frame.png"))
            yy, xx = np.mgrid[:size, :size]
            cy, cx = rng.integers(size // 4, 3 * size // 4, 2)
            r = size // 6
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r)
            m = (blob * 255).astype(np.uint8)
            Image.fromarray(255 - m).save(
                os.path.join(vdir, f"{f:04d}_background.png"))
            Image.fromarray(m).save(
                os.path.join(vdir, f"{f:04d}_solid.png"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default=None,
                    help="gathered frame tree; synthetic when omitted")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--clip_length", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=3)
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--augment", default="medium")
    ap.add_argument("--no_edges", action="store_true")
    args = ap.parse_args(argv)

    from vivim_tpu.data.dataset import ClipDataset
    from vivim_tpu.data.loader import DataLoader

    tmp = None
    root = args.data_root
    if root is None:
        tmp = tempfile.TemporaryDirectory(prefix="vivim_loader_bench_")
        root = tmp.name
        print("generating synthetic frame tree ...", flush=True)
        make_synthetic_tree(root)

    ds = ClipDataset(root, size=args.image_size, clip_len=args.clip_length,
                     augment=args.augment, with_edges=not args.no_edges)
    loader = DataLoader(ds, args.batch_size, shuffle=True,
                        num_workers=args.num_workers)
    # warmup epoch: thread pool spin-up + native lib build
    frames = 0
    for batch in loader:
        frames += batch["clip"].shape[0] * batch["clip"].shape[1]

    t0 = time.time()
    frames = 0
    for ep in range(args.epochs):
        loader.set_epoch(ep + 1)
        for batch in loader:
            frames += batch["clip"].shape[0] * batch["clip"].shape[1]
    dt = time.time() - t0
    fps = frames / dt
    ncpu = os.cpu_count() or 1
    print(json.dumps({
        "metric": f"loader_frames_per_sec_{args.image_size}px_"
                  f"aug_{args.augment}_edges{int(not args.no_edges)}",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "frames": frames,
        "seconds": round(dt, 2),
        "num_workers": args.num_workers,
        "host_cpus": ncpu,
        # decode/augment work scales ~linearly with cores (thread pool +
        # GIL-releasing PIL/numpy/native ops); per-core rate is the
        # machine-independent number
        "frames_per_sec_per_core": round(fps / min(ncpu, max(
            args.num_workers, 1)), 1),
    }))
    if tmp is not None:
        tmp.cleanup()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
