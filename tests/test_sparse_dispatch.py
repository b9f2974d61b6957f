"""Support dispatch: the SAME model code runs dense (small N) and
block-CSR Pallas (large N) with identical numerics — forward and grad.

This is the aggregation-path guarantee: `make_support` picks the
representation, `graph_matmul` dispatches, predictors never change
(reference sparse ops: `model/TGCN/TGCN.py:116`,
`model/MSDR/gmsdr_cell.py:149-165`, GWN supports `GWN.py:77-98`).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from gptst_tpu.graph.artifacts import asym_adj, random_sensor_graph, sym_adj
from gptst_tpu.kernels import spmm as spmm_mod
from gptst_tpu.ops import graph_conv
from gptst_tpu.ops.graph_conv import (
    SparseSupport, diffusion_conv, graph_matmul, make_support,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        spmm_mod.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


def _sparse(adj, tile=16, reorder=True):
    sup = make_support(adj, dense_threshold=1, tile=tile, reorder=reorder)
    assert isinstance(sup, SparseSupport)
    return sup


def test_make_support_threshold():
    adj = sym_adj(random_sensor_graph(40, avg_degree=4, seed=0))
    assert isinstance(make_support(adj), jnp.ndarray)
    assert isinstance(
        make_support(adj, dense_threshold=10, tile=16), SparseSupport)


@pytest.mark.parametrize("reorder", [False, True])
def test_graph_matmul_sparse_equals_dense(reorder):
    adj = sym_adj(random_sensor_graph(70, avg_degree=5, seed=1))
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 70, 6))
    got = graph_matmul(_sparse(adj, reorder=reorder), x)
    want = graph_matmul(jnp.asarray(adj), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_graph_matmul_with_rcm_permutation():
    """Scrambled banded graph: RCM wins, the perm path is exercised."""
    from test_partition import scrambled_band_graph

    adj = scrambled_band_graph(80, band=3, seed=4)
    sup = make_support(adj, dense_threshold=1, tile=16)
    assert sup.perm is not None
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 80, 5))
    want = graph_matmul(jnp.asarray(adj), x)
    got = graph_matmul(sup, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_graph_matmul_sparse_grad_equals_dense():
    adj = sym_adj(random_sensor_graph(60, avg_degree=5, seed=2))
    sup = _sparse(adj)
    x = jax.random.normal(jax.random.PRNGKey(1), (60, 4))

    def f(sup_, x_):
        return jnp.sum(jnp.sin(graph_matmul(sup_, x_)))

    gs = jax.grad(f, argnums=1)(sup, x)
    gd = jax.grad(f, argnums=1)(jnp.asarray(adj), x)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                               rtol=1e-5, atol=1e-5)


def test_sparse_support_transpose():
    adj = asym_adj(random_sensor_graph(60, avg_degree=5, seed=3))
    x = jax.random.normal(jax.random.PRNGKey(2), (60, 4))
    got = graph_matmul(_sparse(adj).T, x)
    want = jnp.asarray(adj).T @ x
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_diffusion_conv_sparse_equals_dense():
    adj = random_sensor_graph(60, avg_degree=5, seed=4)
    sups_d = [jnp.asarray(asym_adj(adj)), jnp.asarray(asym_adj(adj.T))]
    sups_s = [_sparse(asym_adj(adj)), _sparse(asym_adj(adj.T))]
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 60, 4))
    w = jax.random.normal(jax.random.PRNGKey(4), (5 * 4, 7)) * 0.1
    got = diffusion_conv(x, sups_s, w, order=2)
    want = diffusion_conv(x, sups_d, w, order=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


# --- whole-model dense == sparse (TGCN, MSDR, GWN) --------------------------

def _model_pair_check(build_model, apply_dense, apply_sparse, x, rtol=1e-4):
    """Init once (dense), run both paths, compare forward and a grad."""
    params = build_model()
    yd = apply_dense(params, x)
    ys = apply_sparse(params, x)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yd),
                               rtol=rtol, atol=1e-4)

    def loss(fn):
        return lambda p: jnp.mean(fn(p, x) ** 2)

    gd = jax.grad(loss(apply_dense))(params)
    gs = jax.grad(loss(apply_sparse))(params)
    flat_d, _ = jax.flatten_util.ravel_pytree(gd)
    flat_s, _ = jax.flatten_util.ravel_pytree(gs)
    np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_d),
                               rtol=rtol, atol=1e-4)


def test_tgcn_sparse_path_matches_dense():
    from gptst_tpu.models.predictors.tgcn import TGCN, TGCNConfig

    n = 70
    adj = random_sensor_graph(n, avg_degree=5, seed=5)
    sup_d = jnp.asarray(sym_adj(adj))
    sup_s = _sparse(sym_adj(adj))
    model = TGCN(cfg=TGCNConfig(num_nodes=n, rnn_units=8),
                 dim_in=1, dim_out=1, horizon=3)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, n, 1))
    _model_pair_check(
        lambda: model.init(jax.random.PRNGKey(6), x, sup_d),
        lambda p, x_: model.apply(p, x_, sup_d),
        lambda p, x_: model.apply(p, x_, sup_s),
        x)


def test_msdr_sparse_path_matches_dense():
    from gptst_tpu.models.predictors.msdr import (
        MSDR, MSDRConfig, dual_random_walk_supports,
    )

    n = 60
    adj = random_sensor_graph(n, avg_degree=5, seed=6)
    raw = dual_random_walk_supports(adj)
    sups_d = tuple(jnp.asarray(s) for s in raw)
    sups_s = tuple(_sparse(s) for s in raw)
    cfg = MSDRConfig(num_nodes=n, rnn_units=8, num_rnn_layers=1,
                     pre_k=2, pre_v=1, adapt_rank=4)
    model = MSDR(cfg=cfg, dim_in=1, dim_out=1, horizon=4)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 4, n, 1))
    _model_pair_check(
        lambda: model.init(jax.random.PRNGKey(8), x, sups_d),
        lambda p, x_: model.apply(p, x_, sups_d),
        lambda p, x_: model.apply(p, x_, sups_s),
        x)


def test_gwn_sparse_path_matches_dense():
    from gptst_tpu.models.predictors.gwn import GWN, GWNConfig

    n = 60
    adj = random_sensor_graph(n, avg_degree=5, seed=7)
    raw = [asym_adj(adj), asym_adj(adj.T)]
    sups_d = tuple(jnp.asarray(s) for s in raw)
    sups_s = tuple(_sparse(s) for s in raw)
    cfg = GWNConfig(num_nodes=n, dropout=0.0, blocks=1, layers=1,
                    aptonly=False, addaptadj=True, nhid=4,
                    residual_channels=4, dilation_channels=4,
                    adapt_rank=4)
    model = GWN(cfg=cfg, dim_in=1, dim_out=1, horizon=3)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 4, n, 1))
    _model_pair_check(
        lambda: model.init(jax.random.PRNGKey(10), x, sups_d),
        lambda p, x_: model.apply(p, x_, sups_d),
        lambda p, x_: model.apply(p, x_, sups_s),
        x)
