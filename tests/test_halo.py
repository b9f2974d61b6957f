"""Ring-collective SpMM over the 'graph' mesh axis (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
from gptst_tpu.parallel.halo import make_ring_spmm, partition_adjacency
from gptst_tpu.parallel.mesh import GRAPH_AXIS, make_mesh


def test_partition_adjacency_roundtrip():
    adj = sym_adj(random_sensor_graph(10, avg_degree=4, seed=0))
    blocks = partition_adjacency(adj, 4)  # n_loc = 3, pad to 12
    rebuilt = blocks.reshape(12, 12)
    np.testing.assert_allclose(rebuilt[:10, :10], adj)


def test_ring_spmm_matches_dense():
    mesh = make_mesh(8, graph_axis_size=4)
    adj = sym_adj(random_sensor_graph(50, avg_degree=6, seed=1))
    fn, n_pad = make_ring_spmm(mesh, adj)
    assert n_pad % 4 == 0
    x = np.random.default_rng(2).normal(size=(50, 16)).astype(np.float32)
    x_pad = np.zeros((n_pad, 16), np.float32)
    x_pad[:50] = x
    xs = jax.device_put(jnp.asarray(x_pad),
                        NamedSharding(mesh, P(GRAPH_AXIS, None)))
    out = fn(xs)
    want = adj @ x
    np.testing.assert_allclose(np.asarray(out)[:50], want,
                               rtol=1e-5, atol=1e-5)


def test_ring_spmm_full_graph_axis():
    mesh = make_mesh(8, graph_axis_size=8)
    adj = sym_adj(random_sensor_graph(64, avg_degree=6, seed=3))
    fn, n_pad = make_ring_spmm(mesh, adj)
    x = np.random.default_rng(4).normal(size=(n_pad, 8)).astype(np.float32)
    x[64:] = 0.0
    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P(GRAPH_AXIS, None)))
    out = fn(xs)
    np.testing.assert_allclose(np.asarray(out)[:64], adj @ x[:64],
                               rtol=1e-5, atol=1e-5)
