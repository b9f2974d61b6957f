"""SPMD tests on the 8-device virtual CPU mesh (conftest forces it).

SURVEY.md §4.3: mesh/shard_map logic is testable without hardware via
xla_force_host_platform_device_count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gptst_tpu.config import default_config
from gptst_tpu.models.build import build_model
from gptst_tpu.parallel import (
    choose_mesh_shape, make_mesh, make_spmd_train_state, param_pspec,
    run_one_step, shard_batch,
)


def test_choose_mesh_shape():
    assert choose_mesh_shape(8) == (4, 2)
    assert choose_mesh_shape(1) == (1, 1)
    assert choose_mesh_shape(8, graph_axis_size=4) == (2, 4)
    with pytest.raises(ValueError):
        choose_mesh_shape(8, graph_axis_size=3)


def test_param_pspec_selects_node_tables():
    nodes = 16
    p = param_pspec(jnp.zeros((16, 4)), nodes)
    assert p == jax.sharding.PartitionSpec("graph", None)
    assert param_pspec(jnp.zeros((8, 4)), nodes) == \
        jax.sharding.PartitionSpec()


def _tiny_pretrain(num_nodes, batch):
    cfg = default_config("PEMS08", mode="pretrain", model="STGCN")
    cfg = cfg.replace(num_nodes=num_nodes, batch_size=batch,
                      epochs=20, change_epoch=1, log_dir=None)
    init_fn, forward = build_model(cfg, scaler_zeros=0.0)
    params = init_fn(jax.random.PRNGKey(0))
    x = jax.random.normal(
        jax.random.PRNGKey(3),
        (batch, cfg.lag, num_nodes, cfg.input_base_dim + 2))
    return cfg, forward, params, x


def test_sharded_pretrain_step_runs():
    cfg, forward, params, x = _tiny_pretrain(num_nodes=16, batch=8)
    mesh = make_mesh(8)  # (4 data, 2 graph)
    total, flow = run_one_step(cfg, mesh, forward, params, x, x)
    assert np.isfinite(total) and np.isfinite(flow)


def test_sharded_step_matches_single_device():
    """The SPMD step must compute the same update as the local step."""
    cfg, forward, params, x = _tiny_pretrain(num_nodes=16, batch=8)
    optimizer = optax.adam(1e-3)
    rng = jax.random.PRNGKey(0)
    epoch = jnp.asarray(2, jnp.int32)

    from gptst_tpu.train.loss import build_loss
    from gptst_tpu.train.step import make_loss_terms, make_train_step

    loss_fn = build_loss(cfg.loss_func, 0.0, 1.0, cfg.mape_thresh, True)
    sc = jnp.asarray(0, jnp.int32)
    local_step = jax.jit(make_train_step(
        make_loss_terms(forward, loss_fn, cfg), optimizer))
    p1, _, t1, f1 = local_step(
        params, optimizer.init(params), x, x, rng, epoch, sc)

    mesh = make_mesh(8)
    sp, so, step = make_spmd_train_state(cfg, mesh, forward, params, optimizer)
    xs, = shard_batch((x,), mesh)
    p2, _, t2, f2 = step(sp, so, xs, xs, rng, epoch, sc)

    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-4)
    np.testing.assert_allclose(float(f1), float(f2), rtol=1e-4)
    a = jax.tree_util.tree_leaves(p1)[0]
    b = jax.tree_util.tree_leaves(p2)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(jax.jit(fn), *args)
    assert out.shape[0] == args[1].shape[0]
    g.dryrun_multichip(8)
