"""Shared CLI plumbing: model/dataset construction from parsed args."""

from __future__ import annotations


from vivim_tpu.data.dataset import ClipDataset
from vivim_tpu.data.loader import DataLoader
from vivim_tpu.nn import segformer as sf
from vivim_tpu.nn.vivim import Vivim, VivimConfig


def build_model(args, out_chans=None):
    """Construct the Vivim model from parsed CLI args.

    The single place where -segformer/-exact_gelu/-remat/-seq_shards
    reach the config — every training/inference CLI must come through
    here (hand-rolled VivimConfig construction silently drops those
    flags).  ``out_chans`` overrides args.num_classes for the binary
    drivers (train_binary, train_polyp)."""
    import dataclasses

    seg = {"b0": sf.mit_b0, "b3": sf.mit_b3,
           "tiny": sf.mit_tiny_test}[args.segformer]()
    if not getattr(args, "exact_gelu", True):
        seg = dataclasses.replace(seg, gelu_approximate=True)
    remat = getattr(args, "remat", "none") or "none"
    if remat == "blocks":
        seg = dataclasses.replace(seg, remat_layers=True)
    seq_axis, mesh = None, None
    seq_shards = getattr(args, "seq_shards", 1) or 1
    if seq_shards > 1:
        # long-clip sequence parallelism (-seq_shards): Mamba tokens sharded
        # over a 'seq' mesh axis, scan state carried across devices
        # (parallel/seq_scan.py).  Combined with -n_devices > 1 this builds
        # a hybrid ("data", "seq") mesh: the clip batch shards over 'data',
        # tokens over 'seq', and the scan island keeps batch shards local.
        dp = getattr(args, "n_devices", None) or 1
        if dp > 1:
            from vivim_tpu.parallel.mesh import make_hybrid_mesh
            mesh = make_hybrid_mesh(dp, seq_shards)
        else:
            from vivim_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(seq_shards, axis="seq")
        seq_axis = "seq"
    cfg = VivimConfig(
        out_chans=args.num_classes if out_chans is None else out_chans,
        with_edge=args.with_edge,
        feat_size=seg.hidden_sizes,
        hidden_size=seg.decoder_hidden_size if args.segformer != "b3" else 768,
        segformer=seg,
        remat_pre_scan=remat == "pre_scan",
        remat_blocks=remat == "blocks",
        seq_axis=seq_axis,
        mesh=mesh,
    )
    return Vivim(cfg), cfg


def trainer_mesh(args, cfg):
    """Mesh for the training harness (batch sharding + state replication).

    Reuses build_model's hybrid ("data", "seq") mesh when present so the
    DP sharding and the scan island live on ONE mesh; otherwise a 1-D
    data mesh from -n_devices, or None (single device / seq-only)."""
    if cfg.mesh is not None and "data" in cfg.mesh.axis_names:
        return cfg.mesh
    if getattr(args, "n_devices", None) and args.n_devices > 1:
        from vivim_tpu.parallel.mesh import make_mesh
        return make_mesh(args.n_devices)
    return None


def setup_data_parallelism(args, cfg, state):
    """Place a fresh (replicated) train state for the -n_devices/-zero
    flags on the bespoke-loop trainers (train_binary, train_polyp — the
    multiclass Trainer has its own copy of this logic, trainer.py).

    Returns ``(state, mesh, state_shardings, shard)``: the (re)placed
    state, the data mesh (or None), the FSDP shardings to pin as the
    step's out_shardings (or None), and a per-batch ``shard`` callable.

    ``-zero true`` without a >1 'data' mesh axis is an ERROR, not a no-op:
    a silently ignored parallelism flag reads as a working config.
    """
    mesh = trainer_mesh(args, cfg)
    dp = dict(mesh.shape).get("data", 1) if mesh is not None else 1
    if getattr(args, "zero", False) and dp <= 1:
        raise SystemExit(
            "-zero true shards params + optimizer moments over the 'data' "
            f"mesh axis, but this run has {dp} 'data' device(s) — pass "
            "-n_devices N (N > 1) or drop -zero")
    if mesh is None or dp <= 1:
        return state, mesh, None, lambda b: b
    from vivim_tpu.parallel.mesh import replicate, shard_batch

    if args.train_bs % dp != 0:
        raise SystemExit(
            f"-train_bs {args.train_bs} must be divisible by the 'data' "
            f"mesh size {dp} so every device gets equal batch shards")
    state = replicate(state, mesh)
    shardings = None
    if getattr(args, "zero", False):
        from vivim_tpu.parallel.fsdp import shard_state_fsdp

        state, shardings = shard_state_fsdp(state, mesh)
    return state, mesh, shardings, lambda b: shard_batch(b, mesh)


def build_loaders(args, train_root, val_root=None, dynamic=False):
    # -cache_mb is a PER-DATASET cap (documented in args.py): train and val
    # each own an independent decode cache, so worst-case host RAM is 2x.
    cache = dict(cache_decoded=getattr(args, "cache_decoded", False),
                 cache_mb=getattr(args, "cache_mb", 4096),
                 pre_resize=getattr(args, "pre_resize", False))
    train_ds = ClipDataset(
        train_root, size=args.image_size, clip_len=args.clip_length,
        max_num=args.max_numerosity, augment=args.augment_intensity,
        dynamic=dynamic, seed=args.seed, with_edges=args.with_edge, **cache)
    train_dl = DataLoader(train_ds, args.train_bs, shuffle=True,
                          num_workers=args.num_workers, seed=args.seed)
    if len(train_dl) == 0:
        raise SystemExit(
            f"{len(train_ds)} training clip(s) under {train_root!r} < "
            f"train_bs={args.train_bs}: every batch would be dropped "
            "(drop_last) and no optimizer step would run — lower -train_bs "
            "or add data")
    val_dl = None
    if val_root is not None:
        val_ds = ClipDataset(
            val_root, size=args.image_size, clip_len=args.clip_length,
            max_num=None,
            augment=args.augment_intensity if args.val_aug else "none",
            seed=args.seed, with_edges=args.with_edge, **cache)
        val_dl = DataLoader(val_ds, args.val_bs, shuffle=False,
                            num_workers=args.num_workers, drop_last=False,
                            seed=args.seed)
    return train_dl, val_dl


def _overlay(base, part):
    """Deep-merge ``part`` onto ``base`` (mapping trees; leaves replaced).

    Accepts any Mapping (plain dict or flax FrozenDict) on either side so a
    frozen params tree never gets a whole subtree silently replaced."""
    from collections.abc import Mapping

    out = dict(base)
    for k, v in part.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = _overlay(out[k], v)
        else:
            out[k] = v
    return out


def maybe_load_hf_segformer(args, cfg, state):
    """-hf_dir: graft a local HF segformer-b3 snapshot onto the fresh Vivim
    state — the reference's from_pretrained at construction
    (vivim.py:264-267), without network."""
    if not getattr(args, "hf_dir", None):
        return state
    import jax
    import jax.numpy as jnp

    from vivim_tpu.convert.torch_to_jax import (
        load_torch_state_dict,
        vivim_init_from_hf_segformer,
    )

    sd = load_torch_state_dict(args.hf_dir)
    part = vivim_init_from_hf_segformer(sd, cfg)
    cast = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), tree)
    params = _overlay(dict(state.params), cast(part["params"]))
    batch_stats = _overlay(dict(state.batch_stats),
                           cast(part["batch_stats"]))
    return state.replace(params=params, batch_stats=batch_stats)


def maybe_load_pretrained(args, model, state):
    """Partial-weight init from a pretrained params dir
    (init_weight semantics: overlapping keys only,
    multiclass_training_folds.py:519-532)."""
    if not args.pretrain:
        return state
    from vivim_tpu.train.checkpoints import load_params
    import jax

    loaded = load_params(args.pretrain, state.params)
    flat_cur = dict(jax.tree_util.tree_flatten_with_path(state.params)[0])
    flat_new = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    merged = {k: flat_new.get(k, v) for k, v in flat_cur.items()}
    treedef = jax.tree_util.tree_structure(state.params)
    params = jax.tree_util.tree_unflatten(treedef, [
        merged[k] for k, _ in jax.tree_util.tree_flatten_with_path(
            state.params)[0]])
    return state.replace(params=params)
