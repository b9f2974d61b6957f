"""End-to-end training through the explicit node-sharded aggregation
path (VERDICT r2 #1/#2): models TRAIN with their graph supports running
the ring / boundary-halo collectives over the 8-device 'graph' mesh
axis, and the sharded trajectory equals the single-device one.

Reference hot ops this scales: `model/TGCN/TGCN.py:116` (sparse.mm in
the GRU gates), `model/MSDR/gmsdr_cell.py:149-165`. The reference
itself is single-GPU (`model/Run.py:27`) — this is SURVEY §2.5
capability with no reference counterpart.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
from gptst_tpu.graph.partition import (
    partition_graph_coo, partition_stats,
)
from gptst_tpu.models.predictors.tgcn import TGCN, TGCNConfig
from gptst_tpu.ops.graph_conv import ShardedSupport, make_sharded_support
from gptst_tpu.parallel.mesh import make_mesh


def _train_losses(model, params, support, batches, lr=1e-3, clip=5.0):
    opt = optax.chain(optax.clip_by_global_norm(clip), optax.adam(lr))
    opt_state = opt.init(params)

    def loss_fn(p, x, y):
        pred = model.apply(p, x, support)
        return jnp.abs(pred - y).mean()

    @jax.jit
    def step(p, s, x, y):
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        upd, s = opt.update(g, s, p)
        return optax.apply_updates(p, upd), s, loss

    losses = []
    for x, y in batches:
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    return losses


def _tgcn_setup(n, rng_seed=0, units=32, b=4, t=6, horizon=4, steps=8):
    model = TGCN(cfg=TGCNConfig(num_nodes=n, rnn_units=units),
                 dim_in=1, dim_out=1, horizon=horizon)
    rng = np.random.default_rng(rng_seed)
    batches = [
        (jnp.asarray(rng.normal(size=(b, t, n, 1)).astype(np.float32)),
         jnp.asarray(rng.normal(size=(b, horizon, n, 1)).astype(np.float32)))
        for _ in range(steps)
    ]
    return model, batches


def test_tgcn_sharded_trajectory_matches_single():
    """TGCN trains with node-sharded aggregation (graph axis = 8) and
    the per-step loss curve equals the single-device dense run up to
    reduction order."""
    n = 1024
    adj = sym_adj(random_sensor_graph(n, avg_degree=6, seed=0))
    mesh = make_mesh(8, graph_axis_size=8)
    sharded = make_sharded_support(adj, mesh)
    assert isinstance(sharded, ShardedSupport)
    dense = jnp.asarray(adj, jnp.float32)

    model, batches = _tgcn_setup(n)
    params = model.init(jax.random.PRNGKey(0), batches[0][0], dense)

    l_dense = _train_losses(model, params, dense, batches)
    l_shard = _train_losses(model, params, sharded, batches)
    assert all(np.isfinite(l_dense)) and all(np.isfinite(l_shard))
    np.testing.assert_allclose(l_shard, l_dense, rtol=2e-5)
    # the run actually optimized something
    assert l_dense[-1] < l_dense[0]


def _banded_coo(n, bandwidth=48, seed=0):
    """Road-locality banded graph as an edge list (no dense (N, N))."""
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    offs = rng.integers(1, bandwidth + 1, size=4 * n)
    src = rng.integers(0, n, size=4 * n)
    dst = np.clip(src + offs * rng.choice([-1, 1], size=4 * n), 0, n - 1)
    rows, cols = np.concatenate([src, np.arange(n)]), np.concatenate(
        [dst, np.arange(n)])
    vals = np.ones_like(rows, np.float32) / 8.0
    # dedupe
    key = rows * n + cols
    _, keep = np.unique(key, return_index=True)
    return rows[keep], cols[keep], vals[keep]


def test_tgcn_sharded_training_16k_halo():
    """N=16,384 (far past single-host dense) TGCN trains through the
    boundary-halo exchange; halo traffic is a small fraction of the
    ring's (bytes-moved comparison, VERDICT r2 #2)."""
    n = 16384
    rows, cols, vals = _banded_coo(n)
    mesh = make_mesh(8, graph_axis_size=8)
    part = partition_graph_coo(rows, cols, vals, n, parts=8)
    stats = partition_stats(part)
    # banded graph: boundary rows ≪ full-shard circulation
    assert stats["halo_rows_moved"] * 20 < stats["ring_rows_moved"], stats
    sup = make_sharded_support(None, mesh, part=part)
    assert sup.kind == "halo"

    # kernel-level correctness at this scale vs a host scipy reference
    import scipy.sparse as sp

    a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    x = np.random.default_rng(1).normal(size=(n, 8)).astype(np.float32)
    from gptst_tpu.ops.graph_conv import graph_matmul

    got = np.asarray(graph_matmul(sup, jnp.asarray(x)))
    np.testing.assert_allclose(got, a @ x, rtol=1e-4, atol=1e-4)

    # a short sharded training run: finite losses, params move
    model, batches = _tgcn_setup(n, units=8, b=1, t=3, horizon=2, steps=3)
    params = model.init(jax.random.PRNGKey(0), batches[0][0], sup)
    losses = _train_losses(model, params, sup, batches, lr=1e-2)
    assert all(np.isfinite(losses)), losses


def test_gptst_pretrain_sharded_step_16k():
    """One GPT-ST pretrain optimizer step at N=16,384 on the 8-dev mesh
    with nodes + node-indexed tables sharded over 'graph' (GSPMD path;
    the capability SURVEY §2.5 'graph parallelism' exists for)."""
    from gptst_tpu.config import default_config
    from gptst_tpu.models.build import build_model
    from gptst_tpu.parallel import run_one_step

    n = 16384
    cfg = default_config("PEMS08", mode="pretrain", model="STGCN")
    cfg = cfg.replace(num_nodes=n, batch_size=2, change_epoch=1,
                      log_dir=None, hidden_dim=16, embed_dim=8,
                      embed_dim_spa=4, HS=4, HT=4, HT_Tem=4)
    mesh = make_mesh(8, graph_axis_size=2)
    init_fn, forward = build_model(cfg, scaler_zeros=0.0, mesh=mesh)
    params = init_fn(jax.random.PRNGKey(0))
    x = jnp.zeros((cfg.batch_size, cfg.lag, n, cfg.input_base_dim + 2),
                  jnp.float32)
    total, flow = run_one_step(cfg, mesh, forward, params, x, x)
    assert np.isfinite(total), (total, flow)
