"""Graph artifact tests: vectorized builders vs naive-loop references."""

import numpy as np

from gptst_tpu.graph import (
    asym_adj, cheb_poly_stack, dense_to_edges, random_sensor_graph,
    scaled_laplacian, sym_adj, sym_norm_laplacian,
)


def naive_scaled_laplacian(W):
    """Loop re-derivation of `model/STGCN/args.py:7-26` semantics."""
    n, d = W.shape[0], np.sum(W, axis=1)
    L = -W.astype(np.float64).copy()
    L[np.diag_indices_from(L)] = d
    for i in range(n):
        for j in range(n):
            if d[i] > 0 and d[j] > 0:
                L[i, j] = L[i, j] / np.sqrt(d[i] * d[j])
    lam = np.linalg.eigvals(L).max().real
    return 2 * L / lam - np.identity(n)


def test_scaled_laplacian_matches_naive():
    a = random_sensor_graph(23, avg_degree=4, seed=3)
    ours = scaled_laplacian(a)
    ref = naive_scaled_laplacian(a)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_scaled_laplacian_with_isolated_node():
    a = random_sensor_graph(12, avg_degree=4, seed=0)
    a[5, :] = 0.0
    a[:, 5] = 0.0
    ours = scaled_laplacian(a)
    ref = naive_scaled_laplacian(a)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_cheb_poly_recurrence():
    a = random_sensor_graph(17, seed=1)
    L = scaled_laplacian(a)
    stack = cheb_poly_stack(L, 3)
    assert stack.shape == (3, 17, 17)
    np.testing.assert_allclose(stack[0], np.eye(17), atol=1e-6)
    np.testing.assert_allclose(stack[1], L, atol=1e-6)
    np.testing.assert_allclose(
        stack[2], 2 * L @ L - np.eye(17), rtol=1e-4, atol=1e-5)


def test_sym_adj_rows():
    a = random_sensor_graph(11, seed=2)
    s = sym_adj(a)
    # symmetric normalization of A+I: spectrum within [-1, 1]
    w = np.linalg.eigvalsh((s + s.T) / 2)
    assert w.max() <= 1.0 + 1e-5


def test_asym_adj_row_stochastic():
    a = random_sensor_graph(11, seed=2)
    s = asym_adj(a)
    np.testing.assert_allclose(s.sum(axis=1), 1.0, rtol=1e-6)


def test_dense_to_edges_roundtrip():
    a = random_sensor_graph(9, seed=4)
    r, c, w = dense_to_edges(a)
    re = np.zeros_like(a)
    re[r, c] = w
    np.testing.assert_array_equal(re, a)
