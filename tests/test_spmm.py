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
