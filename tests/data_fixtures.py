"""Synthetic dataset fixtures: tiny PNG video trees for pipeline tests."""

import os

import numpy as np
from PIL import Image


def make_gathered_tree(root, n_videos=2, n_frames=12, size=40, seed=0,
                       with_solid=True):
    """Create {root}/{video}/{idx:04d}_frame.png + masks (gathered layout)."""
    rng = np.random.default_rng(seed)
    for v in range(n_videos):
        vdir = os.path.join(root, f"video_{v}")
        os.makedirs(vdir, exist_ok=True)
        for i in range(n_frames):
            img = rng.integers(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(img).save(
                os.path.join(vdir, f"{i:04d}_frame.png"))
            # circular blob masks
            yy, xx = np.mgrid[:size, :size]
            cy, cx = rng.integers(10, size - 10, 2)
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2 < 64).astype(np.uint8)
            bg = (1 - blob) * 255
            Image.fromarray(bg.astype(np.uint8)).save(
                os.path.join(vdir, f"{i:04d}_background.png"))
            if with_solid:
                Image.fromarray((blob * 255).astype(np.uint8)).save(
                    os.path.join(vdir, f"{i:04d}_solid.png"))
                # non-solid deliberately missing for some frames
                if i % 3 != 0:
                    ns = np.zeros((size, size), np.uint8)
                    ns[cy:, :] = blob[cy:, :] * 255
                    Image.fromarray(ns).save(
                        os.path.join(vdir, f"{i:04d}_non-solid.png"))
    return root


def make_raw_tree(root, n_videos=2, n_frames=4, size=24, seed=1):
    """Create the raw layout: {root}/{video}/{n}_x/frame.png + masks."""
    rng = np.random.default_rng(seed)
    for v in range(n_videos):
        for n in range(n_frames):
            d = os.path.join(root, f"caseA_vid{v}", f"{n}_annotated")
            os.makedirs(d, exist_ok=True)
            img = rng.integers(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(img).save(os.path.join(d, "frame.png"))
            m = np.zeros((size, size), np.uint8)
            m[4:12, 4:12] = 255
            Image.fromarray(255 - m).save(os.path.join(d, "background.png"))
            if n % 2 == 0:
                Image.fromarray(m).save(os.path.join(d, "solid.png"))
    return root
