"""Block-sparse SpMM kernel vs dense reference (interpret mode on CPU;
the same program compiles for TPU — scripts/spmm_bench.py runs it there)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
from gptst_tpu.kernels import spmm as spmm_mod
from gptst_tpu.kernels.spmm import BlockCSR, spmm


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # CPU tests run the kernel in interpreter mode
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        spmm_mod.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


def _graph(n, seed=0):
    return sym_adj(random_sensor_graph(n, avg_degree=6, seed=seed))


@pytest.mark.parametrize("n,tile", [(40, 16), (170, 128), (300, 128)])
def test_spmm_matches_dense(n, tile):
    adj = _graph(n)
    bcsr = BlockCSR.from_dense(adj, tile=tile)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 48))
    got = spmm(bcsr, bcsr.transpose(), x)
    want = jnp.asarray(adj) @ x
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_spmm_batched_layout():
    n = 40
    adj = _graph(n)
    bcsr = BlockCSR.from_dense(adj, tile=16)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 5, n, 8))
    got = spmm(bcsr, bcsr.transpose(), x)
    want = jnp.einsum("nm,btmc->btnc", jnp.asarray(adj), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_spmm_gradient_is_transpose():
    n = 40
    adj = _graph(n)
    bcsr = BlockCSR.from_dense(adj, tile=16)
    bcsr_t = bcsr.transpose()
    x = jax.random.normal(jax.random.PRNGKey(3), (n, 8))
    g = jax.random.normal(jax.random.PRNGKey(4), (n, 8))

    def f(x):
        return jnp.vdot(spmm(bcsr, bcsr_t, x), g)

    dx = jax.grad(f)(x)
    want = jnp.asarray(adj).T @ g
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_spmm_streaming_variant_matches_dense(monkeypatch):
    """Force the large-N streaming-gather kernel (x in HBM, per-block
    column DMAs). Regression: chunk overrun must not accumulate the
    next row tile's blocks."""
    monkeypatch.setattr(spmm_mod, "_STRIPE_VMEM_BUDGET", 1)
    n = 300
    adj = _graph(n, seed=9)
    bcsr = BlockCSR.from_dense(adj, tile=32)
    x = jax.random.normal(jax.random.PRNGKey(7), (n, 24))
    got = spmm(bcsr, bcsr.transpose(), x)
    want = jnp.asarray(adj) @ x
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_from_coo_matches_from_dense():
    n = 130
    adj = _graph(n, seed=4)
    rows, cols = np.nonzero(adj)
    a = BlockCSR.from_dense(adj, tile=32)
    b = BlockCSR.from_coo(rows, cols, adj[rows, cols], n, tile=32)
    np.testing.assert_array_equal(np.asarray(a.block_ptr),
                                  np.asarray(b.block_ptr))
    np.testing.assert_array_equal(np.asarray(a.block_cols),
                                  np.asarray(b.block_cols))
    np.testing.assert_allclose(np.asarray(a.block_vals),
                               np.asarray(b.block_vals))


def test_transpose_structure():
    adj = _graph(90, seed=3)
    bcsr = BlockCSR.from_dense(adj, tile=32)
    t = bcsr.transpose()
    x = jax.random.normal(jax.random.PRNGKey(5), (90, 16))
    got = spmm(t, bcsr, x)
    want = jnp.asarray(adj).T @ x
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_spmm_bf16_vals_close_to_f32():
    """bf16 block values (half the adjacency HBM traffic, double MXU
    rate) stay within bf16 tolerance of the f32 kernel; accumulation
    is f32 either way."""
    import jax.numpy as jnp

    from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj

    n = 96
    adj = sym_adj(random_sensor_graph(n, avg_degree=5, seed=11))
    a32, a32t = BlockCSR.pair_from_dense(adj, tile=16)
    a16, a16t = BlockCSR.pair_from_dense(adj, tile=16,
                                         vals_dtype=jnp.bfloat16)
    assert a16.block_vals.dtype == jnp.bfloat16
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(n, 8)).astype(np.float32))
    got32 = np.asarray(spmm(a32, a32t, x))
    got16 = np.asarray(spmm(a16, a16t, x))
    np.testing.assert_allclose(got16, got32, rtol=2e-2, atol=2e-2)

    # gradients flow through the bf16 path too
    g = jax.grad(lambda v: float(0) + jnp.sum(spmm(a16, a16t, v) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_spmm_wide_features_uses_larger_tile():
    """Wide activations (the model path folds B*T*C into f) pick a
    >=256 feature tile when the stripe fits, dividing adjacency
    re-reads (`_choose_feat_tile`)."""
    from gptst_tpu.kernels.spmm import _choose_feat_tile

    assert _choose_feat_tile(1024, 512) == 512
    assert _choose_feat_tile(1024, 128) == 128
    # stripe budget (6 MB single-copy — Pallas double-buffers when the
    # feature-tile index varies) forces narrower tiles as n_pad grows
    assert _choose_feat_tile(12288, 512) == 128
    assert _choose_feat_tile(16384, 512) == 512  # streaming fallback
    assert _choose_feat_tile(1 << 20, 512) == 512  # streaming fallback

    adj = sym_adj(random_sensor_graph(300, avg_degree=5, seed=3))
    sup_a, sup_t = BlockCSR.pair_from_dense(adj, tile=128)
    x = np.random.default_rng(4).normal(size=(2, 300, 256)) \
        .astype(np.float32)
    got = np.asarray(spmm(sup_a, sup_t, jnp.asarray(x)))
    want = np.einsum("nm,bmc->bnc", adj, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_spmm_panel_variant_matches_dense():
    """Panel-resident large-N path (`_spmm_kernel_panel`): x loads once
    per VMEM panel instead of per referenced block; per-panel partials
    sum to the same answer as the dense product."""
    from gptst_tpu.kernels.spmm import _round_up, _spmm_panel

    n, tile = 200, 16
    adj = sym_adj(random_sensor_graph(n, avg_degree=6, seed=9))
    bcsr, _ = BlockCSR.pair_from_dense(adj, tile=tile)
    rng = np.random.default_rng(5)
    f = 128
    x = rng.normal(size=(n, f)).astype(np.float32)
    x_pad = np.zeros((bcsr.n_pad, _round_up(f, 128)), np.float32)
    x_pad[:n, :f] = x

    # force multiple small panels (2 column tiles per panel)
    import gptst_tpu.kernels.spmm as sm
    budget = 2 * tile * 128 * 4
    old = sm._STRIPE_VMEM_BUDGET
    sm._STRIPE_VMEM_BUDGET = budget
    try:
        got = np.asarray(_spmm_panel(bcsr, jnp.asarray(x_pad), 128))
    finally:
        sm._STRIPE_VMEM_BUDGET = old
    want = adj @ x
    np.testing.assert_allclose(got[:n, :f], want, rtol=1e-4, atol=1e-4)


def test_spmm_panel_grad_and_bf16():
    """The panel path participates in the custom VJP and accepts bf16
    block values."""
    from gptst_tpu.kernels.spmm import _round_up, _spmm_panel

    n, tile = 120, 16
    adj = sym_adj(random_sensor_graph(n, avg_degree=5, seed=12))
    b16, _ = BlockCSR.pair_from_dense(adj, tile=tile,
                                      vals_dtype=jnp.bfloat16)
    rng = np.random.default_rng(6)
    x_pad = np.zeros((b16.n_pad, 128), np.float32)
    x_pad[:n, :8] = rng.normal(size=(n, 8)).astype(np.float32)

    import gptst_tpu.kernels.spmm as sm
    old = sm._STRIPE_VMEM_BUDGET
    sm._STRIPE_VMEM_BUDGET = 2 * tile * 128 * 4
    try:
        got = np.asarray(_spmm_panel(b16, jnp.asarray(x_pad), 128))
    finally:
        sm._STRIPE_VMEM_BUDGET = old
    want = adj @ x_pad[:n]
    np.testing.assert_allclose(got[:n], want, rtol=2e-2, atol=2e-2)
