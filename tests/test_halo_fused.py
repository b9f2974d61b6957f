"""Fused ring collective-matmul kernel (RDMA) vs the XLA-scheduled
ppermute ring and the dense product, on the 8-device CPU mesh
(distributed Pallas interpret mode emulates the inter-chip copies)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
from gptst_tpu.kernels.halo_spmm import make_fused_ring_spmm
from gptst_tpu.parallel.halo import make_ring_spmm
from gptst_tpu.parallel.mesh import GRAPH_AXIS, make_mesh


def _setup(n, feat, parts, seed=0):
    adj = sym_adj(random_sensor_graph(n, avg_degree=5, seed=seed))
    mesh = make_mesh(n_devices=parts, graph_axis_size=parts)
    x = np.random.default_rng(seed + 1).normal(
        size=(n, feat)).astype(np.float32)
    return adj, mesh, x


@pytest.mark.parametrize("parts", [2, 4, 8])
def test_fused_ring_matches_dense(parts):
    n, feat = 96, 16
    adj, mesh, x = _setup(n, feat, parts)
    fn, n_pad = make_fused_ring_spmm(mesh, adj, feat, interpret=True)
    x_pad = np.zeros((n_pad, feat), np.float32)
    x_pad[:n] = x
    xs = jax.device_put(
        jnp.asarray(x_pad), NamedSharding(mesh, P(GRAPH_AXIS, None)))
    got = np.asarray(fn(xs))[:n]
    np.testing.assert_allclose(got, adj @ x, rtol=1e-5, atol=1e-5)


def test_fused_ring_matches_xla_ring():
    n, feat, parts = 120, 8, 4
    adj, mesh, x = _setup(n, feat, parts, seed=3)
    fused, n_pad = make_fused_ring_spmm(mesh, adj, feat, interpret=True)
    ring, n_pad2 = make_ring_spmm(mesh, adj)
    assert n_pad == n_pad2
    x_pad = np.zeros((n_pad, feat), np.float32)
    x_pad[:n] = x
    xs = jax.device_put(
        jnp.asarray(x_pad), NamedSharding(mesh, P(GRAPH_AXIS, None)))
    np.testing.assert_allclose(
        np.asarray(fused(xs)), np.asarray(ring(xs)), rtol=1e-5, atol=1e-5)


def test_fused_ring_output_sharding():
    n, feat, parts = 64, 8, 4
    adj, mesh, x = _setup(n, feat, parts, seed=5)
    fn, n_pad = make_fused_ring_spmm(mesh, adj, feat, interpret=True)
    x_pad = np.zeros((n_pad, feat), np.float32)
    x_pad[:n] = x
    xs = jax.device_put(
        jnp.asarray(x_pad), NamedSharding(mesh, P(GRAPH_AXIS, None)))
    out = fn(xs)
    assert out.sharding.spec == P(GRAPH_AXIS, None)
