"""Tests for the round-2 performance surfaces: uint8-bit dropout,
the optional pre-scan remat, and the seq-axis divisibility fallback."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vivim_tpu.nn.layers import FastDropout, fast_keep_mask


def test_fast_keep_mask_statistics_and_actual_keep():
    rng = jax.random.PRNGKey(0)
    for keep in (0.5, 0.7, 0.85, 0.9):
        mask, actual = fast_keep_mask(rng, keep, (200, 200))
        q = int(round(keep * 256))
        assert actual == pytest.approx(q / 256.0)
        frac = float(jnp.mean(mask))
        # 40k uint8 draws: observed keep fraction near the quantized keep
        assert abs(frac - actual) < 0.02


def test_fast_keep_mask_tiny_rate_does_not_overflow():
    """keep in (~0.998, 1): round(keep*256) == 256 no longer overflows uint8
    (ADVICE r2) — degrades gracefully to keep-everything."""
    rng = jax.random.PRNGKey(0)
    mask, actual = fast_keep_mask(rng, 0.999, (16, 16))
    assert actual == 1.0 and bool(mask.all())
    x = jnp.ones((8, 8))
    y = FastDropout(0.001).apply({}, x, False,
                                 rngs={"dropout": jax.random.PRNGKey(1)})
    assert (y == x).all()


def test_fast_dropout_identity_and_unbiasedness():
    x = jnp.ones((64, 64))
    # deterministic / rate-0 are identity, no rng needed
    assert (FastDropout(0.3).apply({}, x, True) == x).all()
    assert (FastDropout(0.0).apply(
        {}, x, False, rngs={"dropout": jax.random.PRNGKey(0)}) == x).all()
    # inverted scaling: E[dropout(x)] == x (within sampling noise)
    y = FastDropout(0.3).apply(
        {}, jnp.ones((512, 512)), False,
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert float(y.mean()) == pytest.approx(1.0, abs=0.02)
    # kept elements scale by 1/actual_keep, dropped are exactly 0
    vals = set(np.unique(np.asarray(y)).round(6).tolist())
    assert len(vals) == 2 and 0.0 in vals


def test_remat_pre_scan_same_values_and_grads():
    """remat=True (CUDA checkpoint_lvl=1 behavior) is a pure memory/compute
    trade: outputs and gradients match the default exactly."""
    from vivim_tpu.kernels.mamba_inner import mamba_inner_grouped

    rng = np.random.default_rng(0)
    G, B, L, d_inner, n, rank = 3, 2, 24, 8, 4, 2
    xz = jnp.asarray(rng.standard_normal((G * B, L, 2 * d_inner)), jnp.float32)
    conv_w = jnp.asarray(rng.standard_normal((G, 4, d_inner)) * 0.3, jnp.float32)
    conv_b = jnp.asarray(rng.standard_normal((G, d_inner)) * 0.1, jnp.float32)
    x_proj = jnp.asarray(
        rng.standard_normal((G, rank + 2 * n, d_inner)) * 0.3, jnp.float32)
    dt_proj = jnp.asarray(
        rng.standard_normal((G, d_inner, rank)) * 0.3, jnp.float32)
    A_log = jnp.asarray(rng.standard_normal((G, d_inner, n)) * 0.1, jnp.float32)
    D = jnp.asarray(rng.standard_normal((G, d_inner)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((G, d_inner)) * 0.1, jnp.float32)

    def loss(xz, conv_w, remat):
        y = mamba_inner_grouped(xz, conv_w, conv_b, x_proj, dt_proj, A_log,
                                D, bias, nb=B, implementation="ref",
                                remat=remat)
        return jnp.sum(y**2)

    v0, g0 = jax.value_and_grad(loss, argnums=(0, 1))(xz, conv_w, False)
    v1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(xz, conv_w, True)
    assert float(v0) == pytest.approx(float(v1), rel=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_remat_blocks_same_values_and_grads():
    """Whole-block remat (remat_blocks + segformer.remat_layers — the
    bs>=16 memory profile) is a pure memory/compute trade: loss and
    parameter gradients match the default exactly."""
    import dataclasses

    from vivim_tpu.nn.vivim import Vivim, VivimConfig

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 2, 32, 32, 3))

    def loss_fn(cfg):
        model = Vivim(cfg)
        params = model.init(jax.random.PRNGKey(1), x)

        def loss(p):
            out, _ = model.apply(
                p, x, False, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(out**2)

        return params, jax.value_and_grad(loss)(params)

    base = VivimConfig.tiny_test()
    p0, (v0, g0) = loss_fn(base)
    cfg_r = dataclasses.replace(
        base,
        remat_blocks=True,
        segformer=dataclasses.replace(base.segformer, remat_layers=True))
    p1, (v1, g1) = loss_fn(cfg_r)
    # identical param trees (remat is transparent to the param structure)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    assert float(v0) == pytest.approx(float(v1), rel=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0["params"])
    flat1 = jax.tree_util.tree_leaves(g1["params"])
    # recomputation is mathematically identical but XLA fuses the
    # rematerialized forward differently -> float-reassociation noise
    # (measured max 3.7e-4 abs / 2.7e-3 rel at f32 on the CPU backend;
    # an order tighter on TPU)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=1e-3)


def test_seq_axis_indivisible_falls_back():
    """L % n_shards != 0 silently uses the single-device scan (deep Vivim
    stages have tiny token counts)."""
    from vivim_tpu.kernels import refs
    from vivim_tpu.kernels.selective_scan import selective_scan
    from vivim_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(8, axis="seq")
    rng = np.random.default_rng(0)
    b, L, d, n = 2, 30, 8, 4  # 30 % 8 != 0
    u = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    delta = jnp.asarray(0.3 * rng.standard_normal((b, L, d)), jnp.float32)
    A = jnp.asarray(-0.5 - rng.random((d, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    got = selective_scan(u, delta, A, B, C, delta_softplus=True,
                         seq_axis="seq", mesh=mesh, implementation="ref")
    want = refs.selective_scan_ref(u, delta, A, B, C, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_bench_loader_synthetic_tree(tmp_path):
    """The loader bench's synthetic tree matches the gathered layout the
    dataset indexes."""
    from vivim_tpu.cli.bench_loader import make_synthetic_tree
    from vivim_tpu.data.dataset import ClipDataset

    make_synthetic_tree(str(tmp_path), n_videos=2, n_frames=6, size=64)
    ds = ClipDataset(str(tmp_path), size=32, clip_len=3, augment="light",
                     with_edges=True)
    assert len(ds) == 4  # 2 windows per 6-frame video
    out = ds.load_clip(0)
    assert out["clip"].shape == (3, 32, 32, 3)
    assert out["masks"].shape == (3, 32, 32, 3)
    assert out["edges"].shape == (3, 32, 32, 1)
