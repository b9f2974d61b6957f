"""Activation rematerialization must not change the math.

`ops/recurrent.remat_cell` wraps scanned cell bodies in
`jax.checkpoint` (VERDICT r4 weak #2: without it the T-step scans
store O(T) backward residuals — ~20 GB for TGCN at 64k/batch-8). The
recomputed forward runs the same ops, so trained trajectories must
match the store-everything path to fusion-reordering tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def _train(model, params, x, y, extra, steps=6):
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    losses = []

    @jax.jit
    def step(p, o, x, y):
        def loss_fn(q):
            pred = model.apply(q, x, *extra)
            return jnp.abs(pred - y).mean()

        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    for _ in range(steps):
        params, opt, l = step(params, opt, x, y)
        losses.append(float(l))
    return losses, params


def _assert_traj_equal(a, b):
    # recompute-under-policy changes XLA fusion order; tolerate
    # f32-ulp-scale drift only (same bar as test_indexed_path)
    np.testing.assert_allclose(a[0], b[0], rtol=1e-4, atol=1e-6)
    # Adam amplifies ulp-scale gradient drift to lr-scale step drift on
    # near-zero params; bound absolute drift well below parameter scale
    for x, y in zip(jax.tree_util.tree_leaves(a[1]),
                    jax.tree_util.tree_leaves(b[1])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("mode", ["full", "dots"])
def test_tgcn_remat_trajectory_invariance(mode):
    from gptst_tpu.models.predictors.tgcn import TGCN, TGCNConfig

    n = 12
    rng = np.random.default_rng(0)
    sup = jnp.asarray(np.eye(n, dtype=np.float32) * 0.5
                      + rng.random((n, n)).astype(np.float32) / n)
    x = jnp.asarray(rng.normal(size=(4, 12, n, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(4, 12, n, 1)).astype(np.float32))

    results = {}
    for rm in ("none", mode):
        model = TGCN(cfg=TGCNConfig(num_nodes=n, rnn_units=16, remat=rm),
                     dim_in=1, dim_out=1, horizon=12)
        params = model.init(jax.random.PRNGKey(1), x, sup)
        results[rm] = _train(model, params, x, y, (sup,))
    _assert_traj_equal(results["none"], results[mode])


def test_msdr_remat_trajectory_invariance():
    from gptst_tpu.models.predictors.msdr import (
        MSDR, MSDRConfig, dual_random_walk_supports)

    n = 10
    rng = np.random.default_rng(1)
    adj = (rng.random((n, n)) < 0.3).astype(np.float32)
    sups = tuple(jnp.asarray(s) for s in dual_random_walk_supports(adj))
    x = jnp.asarray(rng.normal(size=(3, 12, n, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(3, 12, n, 1)).astype(np.float32))

    # remat "full" activates the chunked two-level scan, whose param
    # tree nests the cells one level deeper (encoder/seg/cell{i}) —
    # transplant the flat init into the chunked layout so both arms run
    # IDENTICAL weights, then require identical outputs and gradients.
    flat = MSDR(cfg=MSDRConfig(num_nodes=n, rnn_units=12,
                               num_rnn_layers=2, remat="none"),
                dim_in=1, dim_out=1, horizon=12)
    chunk = MSDR(cfg=MSDRConfig(num_nodes=n, rnn_units=12,
                                num_rnn_layers=2, remat="full"),
                 dim_in=1, dim_out=1, horizon=12)
    pf = flat.init(jax.random.PRNGKey(2), x, sups)
    pc = jax.tree.map(lambda a: a, pf)          # copy
    pc = {"params": dict(pc["params"])}
    for scope in ("encoder", "decoder"):
        pc["params"][scope] = {"seg": pc["params"][scope]}
    # structure check: transplanted tree matches chunked init exactly
    ref_struct = jax.tree_util.tree_structure(
        chunk.init(jax.random.PRNGKey(9), x, sups))
    assert jax.tree_util.tree_structure(pc) == ref_struct

    yf = flat.apply(pf, x, sups)
    yc = chunk.apply(pc, x, sups)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yc),
                               rtol=1e-5, atol=1e-6)

    gf = jax.jit(jax.grad(
        lambda p: jnp.abs(flat.apply(p, x, sups) - y).mean()))(pf)
    gc_ = jax.jit(jax.grad(
        lambda p: jnp.abs(chunk.apply(p, x, sups) - y).mean()))(pc)
    for scope in ("encoder", "decoder"):
        for a, b in zip(
                jax.tree_util.tree_leaves(gf["params"][scope]),
                jax.tree_util.tree_leaves(gc_["params"][scope]["seg"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_ccrnn_remat_trajectory_invariance():
    from gptst_tpu.models.predictors.ccrnn import (
        CCRNN, CCRNNConfig, svd_graph_embeddings)

    n = 8
    rng = np.random.default_rng(2)
    sup = rng.random((n, n)).astype(np.float32)
    e1, e2 = svd_graph_embeddings(sup, 6)
    x = jnp.asarray(rng.normal(size=(3, 12, n, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(3, 12, n, 2)).astype(np.float32))

    grads, results = {}, {}
    for rm in ("none", "dots"):
        cfg = CCRNNConfig(num_nodes=n, hidden_size=10, n_dim=6, remat=rm)
        model = CCRNN(cfg=cfg, dim_in=2, dim_out=2, horizon=12,
                      emb1_init=e1.astype(np.float32),
                      emb2_init=e2.astype(np.float32))
        params = model.init(jax.random.PRNGKey(3), x)
        grads[rm] = jax.jit(jax.grad(
            lambda p: jnp.abs(model.apply(p, x) - y).mean()))(params)
        results[rm] = _train(model, params, x, y, ())
    # the meaningful check: identical math -> identical gradients at
    # init (ulp-tight); over Adam steps ulp seeds amplify chaotically
    # through the recurrence, so the trajectory bound is loose.
    for a, b in zip(jax.tree_util.tree_leaves(grads["none"]),
                    jax.tree_util.tree_leaves(grads["dots"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(results["none"][0], results["dots"][0],
                               rtol=1e-3, atol=1e-5)


def test_remat_shrinks_compiled_memory():
    """The point of the knob: the jitted train step's compiled peak
    (XLA cost-model temp bytes) must drop materially under remat for a
    long-scan recurrent model."""
    from gptst_tpu.models.predictors.tgcn import TGCN, TGCNConfig

    n, b, t = 256, 8, 48
    rng = np.random.default_rng(3)
    sup = jnp.asarray(rng.random((n, n)).astype(np.float32) / n)
    x = jnp.asarray(rng.normal(size=(b, t, n, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(b, t, n, 1)).astype(np.float32))

    def temp_bytes(rm):
        model = TGCN(cfg=TGCNConfig(num_nodes=n, rnn_units=64, remat=rm),
                     dim_in=1, dim_out=1, horizon=t)
        params = model.init(jax.random.PRNGKey(1), x, sup)

        def loss_fn(p):
            return jnp.abs(model.apply(p, x, sup) - y).mean()

        g = jax.jit(jax.grad(loss_fn))
        mem = g.lower(params).compile().memory_analysis()
        if mem is None:
            pytest.skip("backend exposes no memory analysis")
        return mem.temp_size_in_bytes

    full, none = temp_bytes("full"), temp_bytes("none")
    assert full < 0.55 * none, (full, none)


def test_remat_cell_rejects_unknown_mode():
    from gptst_tpu.ops.recurrent import remat_cell

    with pytest.raises(ValueError):
        remat_cell(object, "sometimes")


def test_remat_reaches_cli_surface():
    """`--remat full` must flow through the predictor-override surface
    into the built model (the reference's double-hyphen flag pattern)."""
    from gptst_tpu.config import default_config
    from gptst_tpu.models.build import make_predictor_config
    from gptst_tpu.models.predictors.tgcn import TGCNConfig

    cfg = default_config("PEMS08", mode="ori", model="TGCN",
                         predictor_overrides=(("remat", "full"),))
    pcfg = make_predictor_config(TGCNConfig, cfg, num_nodes=cfg.num_nodes)
    assert pcfg.remat == "full"
    assert dataclasses.asdict(pcfg)["num_nodes"] == 170


def test_stmgcn_remat_forward_and_tree_invariance():
    """nn.remat must compose with nn.RNN's cell protocol (STMGCN's
    LSTMs): same outputs, same param-tree paths (checkpoint compat)."""
    from gptst_tpu.models.predictors.stmgcn import STMGCN, STMGCNConfig

    n = 8
    rng = np.random.default_rng(0)
    sups = jnp.asarray(rng.random((2, 2, n, n)).astype(np.float32) / n)
    x = jnp.asarray(rng.normal(size=(2, 12, n, 2)).astype(np.float32))
    outs = {}
    for rm in ("none", "full"):
        m = STMGCN(cfg=STMGCNConfig(num_nodes=n, remat=rm,
                                    lstm_num_layers=2),
                   dim_in=2, dim_out=2)
        p = m.init(jax.random.PRNGKey(1), x, sups)
        jax.grad(lambda q: jnp.abs(m.apply(q, x, sups)).mean())(p)
        outs[rm] = (np.asarray(m.apply(p, x, sups)), p)
    np.testing.assert_allclose(outs["none"][0], outs["full"][0],
                               rtol=1e-5, atol=1e-6)
    assert (jax.tree_util.tree_structure(outs["none"][1])
            == jax.tree_util.tree_structure(outs["full"][1]))


def test_gptst_trunk_remat_equivalence():
    """GPTSTConfig.remat wraps the STHCN HyperTem/Cap sub-layers in
    jax.checkpoint (what lets the N=16,384 flagship f32 step hold
    batch 8 instead of 2): identical param tree, init values, forward
    outputs and gradients."""
    from gptst_tpu.models.gptst import GPTST, GPTSTConfig

    n = 10
    rng = np.random.default_rng(0)
    flow = rng.normal(size=(2, 12, n, 1)).astype(np.float32)
    day = np.broadcast_to(rng.normal(size=(2, 12, 1, 1)), (2, 12, n, 1))
    week = np.broadcast_to(rng.normal(size=(2, 12, 1, 1)), (2, 12, n, 1))
    src = jnp.asarray(np.concatenate([flow, day, week], -1)
                      .astype(np.float32))
    key, ep = jax.random.PRNGKey(3), jnp.asarray(5, jnp.int32)
    outs = {}
    for rm in ("none", "full"):
        cfg = GPTSTConfig(num_nodes=n, hidden_dim=16, embed_dim=8,
                          embed_dim_spa=4, HS=5, HT=6, HT_Tem=4,
                          remat=rm, epochs=100)
        m = GPTST(cfg=cfg)
        p = m.init(jax.random.PRNGKey(0), src, key, ep)
        y = m.apply(p, src, key, ep)
        g = jax.grad(lambda q: sum(jnp.abs(o).mean()
                                   for o in m.apply(q, src, key, ep)[:2]))(p)
        outs[rm] = (p, y, g)
    assert (jax.tree_util.tree_structure(outs["none"][0])
            == jax.tree_util.tree_structure(outs["full"][0]))
    for a, b in zip(jax.tree_util.tree_leaves(outs["none"][0]),
                    jax.tree_util.tree_leaves(outs["full"][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(outs["none"][1], outs["full"][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs["none"][2]),
                    jax.tree_util.tree_leaves(outs["full"][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
