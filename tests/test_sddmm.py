"""SDDMM kernel: sampled products, sparse softmax supports, gradients
(interpret mode on CPU; the same program compiles for TPU —
scripts/spmm_bench.py records its throughput there)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
from gptst_tpu.kernels import sddmm as sddmm_mod
from gptst_tpu.kernels import spmm as spmm_mod
from gptst_tpu.kernels.sddmm import (
    SDDMMPattern, adaptive_support, mtgnn_support, sddmm, sddmm_reference,
)
from gptst_tpu.kernels.spmm import BlockCSR
from gptst_tpu.ops.graph_conv import graph_matmul


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    patched = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    monkeypatch.setattr(sddmm_mod.pl, "pallas_call", patched)
    monkeypatch.setattr(spmm_mod.pl, "pallas_call", patched)


def _pattern(n, tile, seed=0):
    adj = sym_adj(random_sensor_graph(n, avg_degree=5, seed=seed))
    bcsr = BlockCSR.from_dense(adj, tile=tile)
    return adj, SDDMMPattern.from_bcsr(bcsr)


def _dense_from_blocks(pattern, blocks):
    """Scatter (nnzb, TB, TB) block values back to a dense (N, N)."""
    tb = pattern.tile
    out = np.zeros((pattern.n_pad, pattern.n_pad), np.float32)
    rids = np.asarray(pattern.row_ids)
    cols = np.asarray(pattern.cols)
    real = int(np.asarray(pattern.ptr)[-1])
    for b in range(real):
        r, c = rids[b] * tb, cols[b] * tb
        out[r: r + tb, c: c + tb] += np.asarray(blocks[b])
    return out[: pattern.n, : pattern.n]


@pytest.mark.parametrize("n,tile,d", [(60, 16, 10), (170, 128, 10)])
def test_sddmm_matches_masked_dense(n, tile, d):
    adj, pattern = _pattern(n, tile)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    e1 = jax.random.normal(k1, (n, d))
    e2 = jax.random.normal(k2, (d, n))
    got = _dense_from_blocks(pattern, sddmm(pattern, e1, e2))
    # block mask = nonzero entries of stored blocks
    want = np.where(adj != 0, np.asarray(e1 @ e2), 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sddmm_reference_agrees():
    _, pattern = _pattern(60, 16)
    e1 = jax.random.normal(jax.random.PRNGKey(1), (60, 8))
    e2 = jax.random.normal(jax.random.PRNGKey(2), (8, 60))
    np.testing.assert_allclose(
        np.asarray(sddmm(pattern, e1, e2)),
        np.asarray(sddmm_reference(pattern, e1, e2)),
        rtol=1e-5, atol=1e-5)


def test_sddmm_gradients_match_dense():
    n, d = 60, 6
    adj, pattern = _pattern(n, 16)
    e1 = jax.random.normal(jax.random.PRNGKey(3), (n, d))
    e2 = jax.random.normal(jax.random.PRNGKey(4), (d, n))
    mask = jnp.asarray((adj != 0).astype(np.float32))

    def loss_sparse(e1, e2):
        blocks = sddmm(pattern, e1, e2)
        # sum of squares is pattern-local, no scatter needed
        return jnp.sum(blocks ** 2)

    def loss_dense(e1, e2):
        return jnp.sum((mask * (e1 @ e2)) ** 2)

    gs = jax.grad(loss_sparse, argnums=(0, 1))(e1, e2)
    gd = jax.grad(loss_dense, argnums=(0, 1))(e1, e2)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gd[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]),
                               rtol=1e-4, atol=1e-4)


def _dense_restricted_softmax(adj, scores):
    """Row softmax over pattern entries only (sparse semantics)."""
    ex = np.where(adj != 0, np.exp(scores), 0.0)
    return ex / np.maximum(ex.sum(axis=1, keepdims=True), 1e-38)


def test_adaptive_support_matches_dense_restricted_softmax():
    n, d = 60, 10
    adj, pattern = _pattern(n, 16)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(6), 3)
    e1 = jax.random.normal(k1, (n, d))
    e2 = jax.random.normal(k2, (d, n))
    x = jax.random.normal(k3, (n, 5))

    sup = adaptive_support(pattern, e1, e2)
    got = np.asarray(graph_matmul(sup, x))

    scores = np.maximum(np.asarray(e1 @ e2), 0.0)
    a_dense = _dense_restricted_softmax(adj, scores)
    want = a_dense @ np.asarray(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_adaptive_support_grads_flow_to_embeddings():
    n, d = 60, 8
    adj, pattern = _pattern(n, 16)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    e1 = jax.random.normal(k1, (n, d))
    e2 = jax.random.normal(k2, (d, n))
    x = jax.random.normal(k3, (n, 4))

    def loss_sparse(e1, e2):
        return jnp.sum(graph_matmul(adaptive_support(pattern, e1, e2), x) ** 2)

    def loss_dense(e1, e2):
        mask = jnp.asarray((adj != 0).astype(np.float32))
        ex = jnp.exp(jax.nn.relu(e1 @ e2)) * mask
        a = ex / jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-38)
        return jnp.sum((a @ x) ** 2)

    gs = jax.grad(loss_sparse, argnums=(0, 1))(e1, e2)
    gd = jax.grad(loss_dense, argnums=(0, 1))(e1, e2)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gd[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]),
                               rtol=1e-3, atol=1e-4)


def test_mtgnn_support_matches_dense():
    n, d, alpha = 60, 10, 3.0
    adj, pattern = _pattern(n, 16)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(8), 3)
    m1 = jax.random.normal(k1, (n, d))
    m2 = jax.random.normal(k2, (n, d))
    x = jax.random.normal(k3, (n, 5))

    sup = mtgnn_support(pattern, m1, m2, alpha)
    got = np.asarray(graph_matmul(sup, x))

    mask = (adj != 0).astype(np.float32)
    a = np.maximum(np.tanh(alpha * (np.asarray(m1 @ m2.T)
                                    - np.asarray(m2 @ m1.T))), 0.0) * mask
    np.testing.assert_allclose(got, a @ np.asarray(x),
                               rtol=1e-4, atol=1e-5)
