"""Graph partitioner: RCM ordering, shard/halo layout correctness."""

import numpy as np

from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
from gptst_tpu.graph.partition import (
    partition_graph, partition_stats, rcm_order,
)


def _bandwidth(a):
    rows, cols = np.nonzero(a)
    return int(np.abs(rows - cols).max()) if rows.size else 0


def test_rcm_is_permutation_and_reduces_bandwidth():
    adj = sym_adj(random_sensor_graph(120, avg_degree=4, seed=7))
    perm = rcm_order(adj)
    assert sorted(perm.tolist()) == list(range(120))
    a_perm = adj[perm][:, perm]
    assert _bandwidth(a_perm) < _bandwidth(adj)


def test_rcm_handles_disconnected_components():
    a = np.zeros((10, 10), np.float32)
    a[0, 1] = a[1, 0] = 1.0   # component {0,1}
    a[5, 6] = a[6, 5] = 1.0   # component {5,6}; rest isolated
    perm = rcm_order(a)
    assert sorted(perm.tolist()) == list(range(10))


def _spmm_via_partition(part, adj, x):
    """Emulate the sharded compute: local block + gathered halo."""
    xp = part.pad_features(x)
    out = np.zeros_like(xp)
    for p in range(part.parts):
        lo = p * part.n_loc
        local = xp[lo: lo + part.n_loc]
        halo = xp[part.halo_idx[p]]
        cat = np.concatenate([local, halo], axis=0)
        out[lo: lo + part.n_loc] = part.local_adj[p] @ cat
    return part.unpad_features(out)


def test_partition_reconstructs_dense_spmm():
    adj = sym_adj(random_sensor_graph(130, avg_degree=5, seed=3))
    x = np.random.default_rng(0).normal(size=(130, 7)).astype(np.float32)
    for parts in (2, 4):
        for reorder in (False, True):
            part = partition_graph(adj, parts, reorder=reorder)
            got = _spmm_via_partition(part, adj, x)
            np.testing.assert_allclose(got, adj @ x, rtol=1e-5, atol=1e-5)


def scrambled_band_graph(n, band=3, seed=0):
    """A banded (road-like) graph presented in scrambled node order —
    the case locality-recovering orderings exist for."""
    a = np.zeros((n, n), np.float32)
    for off in range(1, band + 1):
        idx = np.arange(n - off)
        a[idx, idx + off] = a[idx + off, idx] = 1.0
    p = np.random.default_rng(seed).permutation(n)
    return a[p][:, p]


def test_reorder_shrinks_halo():
    adj = scrambled_band_graph(200, band=3, seed=11)
    plain = partition_stats(partition_graph(adj, 4, reorder=False))
    rcm = partition_stats(partition_graph(adj, 4, reorder=True))
    assert rcm["halo_mean"] < plain["halo_mean"]


def test_pad_unpad_roundtrip():
    adj = sym_adj(random_sensor_graph(50, avg_degree=4, seed=1))
    part = partition_graph(adj, 4)
    x = np.random.default_rng(1).normal(size=(3, 50, 2)).astype(np.float32)
    np.testing.assert_array_equal(
        part.unpad_features(part.pad_features(x)), x)
