"""Trajectory parity, remaining north-star families (VERDICT r2 #5):

  * TGCN — a recurrent family (scan-based graph-GRU vs the reference's
    Python time loop, `model/TGCN/TGCN.py:147-174`);
  * GWN — an adaptive-graph family (learned adjacency trained end-to-
    end, `model/GWN/GWN.py:238`);
  * eval mode — frozen GPT-ST encoder + gated Fusion + STGCN
    (`model/Model.py:106-117`), the framework's headline configuration;
  * pretrain crossing `change_epoch` — the adaptive-mask + KL regime in
    a *trained trajectory* (`model/BasicTrainer.py:84-88`). With
    mask_ratio=1.0 the budget covers every position, so the mask is
    deterministically all-ones on both sides even in the adaptive
    branch — the trajectory exercises the curriculum switch and the
    KL(mask-policy || routing)*0.1 term without stochastic divergence.

Protocol identical to tests/test_train_parity.py: transplanted init,
identical data, Adam(eps=1e-8) + grad-clip 5, per-step loss curves.
"""

import argparse
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/model")

if not hasattr(np, "mat"):
    np.mat = np.asmatrix

import jax
import jax.numpy as jnp

from parity_utils import transplant_stgcn
from test_train_parity import (
    _assert_trajectories_match, _jax_train, _torch_train,
)


@pytest.fixture(autouse=True)
def _cpu_shim(monkeypatch):
    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        if args and isinstance(args[0], (str, torch.device)) \
                and "cuda" in str(args[0]):
            return orig_to(self, "cpu")
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", to)


def _lin(linear):
    return {"kernel": linear.weight.detach().numpy().T,
            "bias": linear.bias.detach().numpy()}


STEPS = 60
LR = 3e-3


def test_tgcn_trajectory_parity():
    """Recurrent family: 60 Adam steps of the graph-GRU
    (`model/TGCN/TGCN.py:132-175`)."""
    from TGCN.TGCN import TGCN as RefTGCN

    from gptst_tpu.graph.artifacts import sym_adj
    from gptst_tpu.models.predictors.tgcn import TGCN, TGCNConfig

    n, units = 12, 16
    rng = np.random.default_rng(5)
    a = (rng.random((n, n)) < 0.3).astype(np.float32)
    a = np.maximum(a, a.T)
    np.fill_diagonal(a, 0.0)
    ns = argparse.Namespace(
        adj_mx=a, num_nodes=n, output_dim=1, rnn_units=units, lam=0.0015,
        input_window=12, output_window=12)
    torch.manual_seed(4)
    ref = RefTGCN(ns, torch.device("cpu"), dim_in=1)
    ref.train()

    model = TGCN(cfg=TGCNConfig(num_nodes=n, rnn_units=units),
                 dim_in=1, dim_out=1, horizon=12)
    support = jnp.asarray(sym_adj(a))
    x = rng.normal(size=(8, 12, n, 1)).astype(np.float32)
    y = rng.normal(size=(8, 12, n, 1)).astype(np.float32) + 2.0
    params = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.asarray(x), support))
    cell = ref.tgcn_model
    params["params"]["ScanGraphGRUCell_0"] = {
        "weights_0": cell.weights_0.detach().numpy(),
        "weights_1": cell.weights_1.detach().numpy(),
        "bias_0": cell.bias_0.detach().numpy(),
        "bias_1": cell.bias_1.detach().numpy(),
    }
    params["params"]["Dense_0"] = _lin(ref.output_model)
    params = jax.tree.map(np.array, params)

    xt, yt = torch.tensor(x), torch.tensor(y)
    l_ref = _torch_train(
        ref, lambda: (ref(xt) - yt).abs().mean(), STEPS, LR)

    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def loss_fn(p):
        return jnp.abs(model.apply(p, xj, support) - yj).mean()

    l_jax = _jax_train(params, loss_fn, STEPS, LR)
    _assert_trajectories_match(l_ref, l_jax, rtol=0.005,
                               min_improvement=0.2, tail_rtol=0.1)


def test_gwn_trajectory_parity():
    """Adaptive-graph family: the learned adjacency (nodevec1/2,
    `GWN.py:238`) trains through softmax(relu(E1 E2)) on both sides."""
    from test_parity_gwn import build_gwn_pair

    n = 12
    ref, model, params = build_gwn_pair(n, seed=2)
    rng = np.random.default_rng(9)
    x = rng.normal(size=(6, 12, n, 1)).astype(np.float32)
    y = rng.normal(size=(6, 12, n, 1)).astype(np.float32) + 2.0

    xt, yt = torch.tensor(x), torch.tensor(y)
    l_ref = _torch_train(
        ref, lambda: (ref(xt) - yt).abs().mean(), 40, 1e-3)

    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def loss_fn(p):
        return jnp.abs(model.apply({"params": p}, xj, ()) - yj).mean()

    l_jax = _jax_train(params, loss_fn, 40, 1e-3)
    # BatchStatsNorm + 16 conv layers accumulate f32 divergence faster
    # than STGCN; the head must still track tightly
    _assert_trajectories_match(l_ref, l_jax, rtol=0.01,
                               min_improvement=0.15, tail_rtol=0.15)


def _gptst_ns(n, hd, e, es, tmp=None, mode="pretrain", **kw):
    ns = argparse.Namespace(
        num_nodes=n, input_base_dim=1, input_extra_dim=2, hidden_dim=hd,
        output_dim=1, horizon=12, lag=12, embed_dim=e, embed_dim_spa=es,
        HS=5, HT=6, HT_Tem=4, num_route=2, mode=mode, model="STGCN",
        device=torch.device("cpu"), scaler_zeros=0.0, interval=288,
        week_day=7, mask_ratio=1.0, ada_mask_ratio=0.5, ada_type="all",
        change_epoch=10, epochs=100)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def _src(n, b=3, seed=21):
    rng = np.random.default_rng(seed)
    flow = rng.normal(size=(b, 12, n, 1)).astype(np.float32)
    day = np.broadcast_to(rng.normal(size=(b, 12, 1, 1)), (b, 12, n, 1))
    week = np.broadcast_to(rng.normal(size=(b, 12, 1, 1)), (b, 12, n, 1))
    return np.concatenate([flow, day, week], axis=-1).astype(np.float32)


def _transplant_gptst(params_p, ref):
    """Copy a reference GPTST_Model's encoder+decoder weights into our
    GPTST param tree (`tests/test_parity_gptst.py` helpers)."""
    from test_parity_gptst import _sthcn_params, _tf_params

    p = params_p
    p["dim_in_flow"] = _lin(ref.encoder.dim_in_flow)
    p["encoder"] = _sthcn_params(ref.encoder.STHCN_encode)
    p["decoder"] = _sthcn_params(ref.decoder.STHCN_decode)
    p["dim_flow_out"] = _lin(ref.decoder.dim_flow_out)
    rl = ref.encoder.MLP_RL
    p["mlp_rl"] = {
        "Dense_0": _lin(rl.ln1), "Dense_1": _lin(rl.ln3),
        "weights_pool_spa": rl.weights_pool_spa.detach().numpy(),
        "bias_pool_spa": rl.bias_pool_spa.detach().numpy(),
        "weights_pool_tem": rl.weights_pool_tem.detach().numpy(),
        "bias_pool_tem": rl.bias_pool_tem.detach().numpy()}
    p["teb4mask"] = _tf_params(ref.encoder.teb4mask)
    p["neb4mask"] = ref.encoder.neb4mask.detach().numpy()
    return p


def test_eval_mode_trajectory_parity(tmp_path):
    """Frozen encoder + Fusion + STGCN (`model/Model.py:106-117`): the
    head + predictor train, the encoder does not, on both sides."""
    from Model import Enhance_model
    from Pretrain_model.GPTST import GPTST_Model
    from STGCN.args import cheb_poly_approx, scaled_laplacian
    from test_parity_gptst import _init_ref

    from gptst_tpu.config import default_config
    from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
    from gptst_tpu.models.build import build_model
    from gptst_tpu.models.gptst import GPTST, GPTSTConfig

    n, hd, e, es = 10, 16, 8, 4
    a = sym_adj(random_sensor_graph(n, avg_degree=4, seed=7)) \
        .astype(np.float64)

    # --- torch side: save a seeded pretrain ckpt, load via Enhance_model
    ns = _gptst_ns(n, hd, e, es, mode="eval",
                   load_pretrain_path="pp.pth", log_dir=str(tmp_path) + "/")
    pre = _init_ref(GPTST_Model(_gptst_ns(n, hd, e, es, mode="eval")),
                    seed=6)
    torch.save(pre.state_dict(), str(tmp_path) + "/pp.pth")
    ns_pred = argparse.Namespace(Ks=3, Kt=3, blocks1=[64, 32, 128],
                                 drop_prob=0.0, outputl_ks=3, num_nodes=n)
    ns_pred.G = torch.FloatTensor(
        np.asarray(cheb_poly_approx(scaled_laplacian(a), 3, n)))
    torch.manual_seed(11)
    ref = Enhance_model(ns, ns_pred)
    ref.train()

    # --- our side: same encoder transplanted into pretrain_params,
    # head + predictor transplanted into the trainable tree
    cfg = default_config("PEMS08", mode="eval", model="STGCN")
    cfg = cfg.replace(num_nodes=n, hidden_dim=hd, embed_dim=e,
                      embed_dim_spa=es, HS=5, HT=6, HT_Tem=4,
                      mask_ratio=1.0, log_dir=None)
    gcfg = GPTSTConfig.from_framework(cfg, 0.0)
    gmodel = GPTST(cfg=gcfg)
    src = _src(n)
    pp = jax.tree.map(
        np.asarray,
        gmodel.init(jax.random.PRNGKey(0), jnp.asarray(src),
                    jax.random.PRNGKey(7), jnp.asarray(5, jnp.int32)))
    _transplant_gptst(pp["params"], ref.pretrain_model)
    pp = jax.tree.map(np.array, pp)

    init_fn, forward = build_model(cfg, scaler_zeros=0.0,
                                   pretrain_params=pp, adj=a)
    params = jax.tree.map(np.asarray, init_fn(jax.random.PRNGKey(1)))
    hp = params["head"]["params"]
    hp["Dense_0"] = _lin(ref.lin_test)
    hp["Fusion_0"] = {"Dense_0": _lin(ref.fusion.HS_fc),
                      "Dense_1": _lin(ref.fusion.HT_fc),
                      "Dense_2": _lin(ref.fusion.output_fc)}
    transplant_stgcn(params["predictor"]["params"], ref.predictor)
    params = jax.tree.map(np.array, params)

    rng = np.random.default_rng(3)
    y = rng.normal(size=src[..., :1].shape).astype(np.float32) + 2.0
    st, yt = torch.tensor(src), torch.tensor(y)

    def ref_forward():
        out, *_ = ref.forward_pretrain(st, st)
        return (out - yt).abs().mean()

    l_ref = _torch_train(ref, ref_forward, 40, 1e-3)
    # the frozen encoder must not have moved
    after = ref.pretrain_model.encoder.dim_in_flow.weight.detach().numpy()
    np.testing.assert_array_equal(
        after, pp["params"]["dim_in_flow"]["kernel"].T)

    sj, yj = jnp.asarray(src), jnp.asarray(y)

    def loss_fn(p):
        return jnp.abs(forward(p, sj, None, None, None).pred - yj).mean()

    l_jax = _jax_train(params, loss_fn, 40, 1e-3)
    _assert_trajectories_match(l_ref, l_jax, rtol=0.01,
                               min_improvement=0.1, tail_rtol=0.1)


def test_pretrain_change_epoch_crossing_parity():
    """Pretrain trajectory that CROSSES change_epoch: steps run the
    random-mask branch, then the adaptive branch + KL*0.1
    (`BasicTrainer.py:84-88`). mask_ratio=1.0 keeps the mask
    deterministically all-ones in both regimes, so the curves are
    comparable step-by-step while the mask-policy net trains through
    the KL term."""
    from Pretrain_model.GPTST import GPTST_Model
    from test_parity_gptst import _init_ref

    from gptst_tpu.models.gptst import GPTST, GPTSTConfig

    n, hd, e, es = 10, 16, 8, 4
    ns = _gptst_ns(n, hd, e, es, change_epoch=10, epochs=20)
    ref = _init_ref(GPTST_Model(ns), seed=6)

    gcfg = GPTSTConfig(num_nodes=n, input_base_dim=1, hidden_dim=hd,
                       horizon=12, embed_dim=e, embed_dim_spa=es, HS=5,
                       HT=6, HT_Tem=4, num_route=2, mask_ratio=1.0,
                       ada_mask_ratio=0.5, ada_type="all",
                       change_epoch=10, epochs=20)
    model = GPTST(cfg=gcfg)

    src = _src(n)
    key = jax.random.PRNGKey(7)
    params = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.asarray(src), key,
                   jnp.asarray(5, jnp.int32)))
    _transplant_gptst(params["params"], ref)
    params = jax.tree.map(np.array, params)

    steps = 30
    epochs = [6 + i // 3 for i in range(steps)]  # 6..15, crosses 10
    srcs = torch.tensor(src)
    kl = torch.nn.KLDivLoss(reduction="sum")

    it = iter(epochs)

    def ref_forward():
        ep = next(it)
        out, _, inv_mask, prob, eb = ref.forward_pretrain(
            srcs, srcs, epoch=ep)
        assert float(inv_mask.min()) == 1.0  # fully masked, both regimes
        label = srcs[..., :1]
        loss = ((out * inv_mask) - (label * inv_mask)).abs().mean()
        if ep > ns.change_epoch:
            loss = loss + kl(prob.log(), eb) * 0.1
        return loss

    l_ref = _torch_train(ref, ref_forward, steps, 1e-3)

    srcj = jnp.asarray(src)

    from gptst_tpu.train.loss import kl_div_sum

    jt = iter(epochs)

    def loss_fn(p):
        ep = jnp.asarray(next(jt), jnp.int32)
        out, _, inv_mask, prob, eb = model.apply(p, srcj, key, ep)
        label = srcj[..., :1]
        loss = jnp.abs(out * inv_mask - label * inv_mask).mean()
        return jnp.where(
            ep > gcfg.change_epoch,
            loss + kl_div_sum(jnp.log(jnp.maximum(prob, 1e-38)), eb) * 0.1,
            loss)

    # non-jitted stepping (the epoch sequence is Python state); reuse
    # the optimizer wiring from _jax_train via a local loop
    import optax

    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(1e-3, eps=1e-8, eps_root=0.0))
    state = tx.init(params)
    l_jax = []
    for _ in range(steps):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        l_jax.append(float(loss))
    l_jax = np.asarray(l_jax)

    head = 10
    np.testing.assert_allclose(l_jax[:head], l_ref[:head], rtol=0.02)
    np.testing.assert_allclose(l_jax, l_ref, rtol=0.1)
    # the KL regime actually engaged (the sum-reduced KL*0.1 lifts the
    # total at the crossing — compare improvement within each regime)
    cross = next(i for i, ep in enumerate(epochs) if ep > ns.change_epoch)
    assert l_ref[cross] > l_ref[cross - 1]  # KL switched on
    assert l_ref[-1] < l_ref[cross]         # and still optimizes
    assert l_jax[-1] < l_jax[cross]
    assert l_ref[cross - 1] < l_ref[0]      # pre-crossing regime learned


def test_eval_mode_astgcn_trajectory_parity(tmp_path):
    """Eval mode with a SECOND predictor family through the mux
    (`model/Model.py:55-93`): frozen GPT-ST encoder + Fusion + ASTGCN
    (attention + attended Cheb conv), the BASELINE.json configs[3]
    family (VERDICT r3 weak #4a). Protocol identical to the STGCN
    eval-mode test; the reference side runs the Run.py xavier sweep
    (conf/ASTGCN sets xavier=True) before the transplant, which makes
    the trajectory init-faithful on both sides."""
    from Model import Enhance_model
    from Pretrain_model.GPTST import GPTST_Model
    from test_parity_gptst import _init_ref

    from gptst_tpu.config import default_config
    from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
    from gptst_tpu.models.build import build_model
    from gptst_tpu.models.gptst import GPTST, GPTSTConfig
    from parity_utils import transplant_astgcn

    n, hd, e, es, f = 10, 16, 8, 4, 8
    a = sym_adj(random_sensor_graph(n, avg_degree=4, seed=7)) \
        .astype(np.float64)

    ns = _gptst_ns(n, hd, e, es, mode="eval", model="ASTGCN",
                   load_pretrain_path="pp.pth", log_dir=str(tmp_path) + "/")
    pre = _init_ref(GPTST_Model(_gptst_ns(n, hd, e, es, mode="eval")),
                    seed=6)
    torch.save(pre.state_dict(), str(tmp_path) + "/pp.pth")
    ns_pred = argparse.Namespace(
        nb_block=2, K=3, nb_chev_filter=f, nb_time_filter=f,
        time_strides=1, A=a.copy(), len_input=12, num_for_predict=12,
        num_nodes=n)
    torch.manual_seed(11)
    ref = Enhance_model(ns, ns_pred)
    # Run.py xavier sweep (`Run.py:80-86`): trainable params only —
    # the frozen encoder has requires_grad=False by construction
    for p in ref.parameters():
        if p.requires_grad:
            if p.dim() > 1:
                torch.nn.init.xavier_uniform_(p)
            else:
                torch.nn.init.uniform_(p)
    ref.train()

    cfg = default_config("PEMS08", mode="eval", model="ASTGCN")
    cfg = cfg.replace(num_nodes=n, hidden_dim=hd, embed_dim=e,
                      embed_dim_spa=es, HS=5, HT=6, HT_Tem=4,
                      mask_ratio=1.0, log_dir=None,
                      predictor_overrides=(
                          ("nb_block", "2"), ("K", "3"),
                          ("nb_chev_filter", str(f)),
                          ("nb_time_filter", str(f)),
                          ("time_strides", "1")))
    gcfg = GPTSTConfig.from_framework(cfg, 0.0)
    gmodel = GPTST(cfg=gcfg)
    src = _src(n)
    pp = jax.tree.map(
        np.asarray,
        gmodel.init(jax.random.PRNGKey(0), jnp.asarray(src),
                    jax.random.PRNGKey(7), jnp.asarray(5, jnp.int32)))
    _transplant_gptst(pp["params"], ref.pretrain_model)
    pp = jax.tree.map(np.array, pp)

    init_fn, forward = build_model(cfg, scaler_zeros=0.0,
                                   pretrain_params=pp, adj=a)
    params = jax.tree.map(np.asarray, init_fn(jax.random.PRNGKey(1)))
    hp = params["head"]["params"]
    hp["Dense_0"] = _lin(ref.lin_test)
    hp["Fusion_0"] = {"Dense_0": _lin(ref.fusion.HS_fc),
                      "Dense_1": _lin(ref.fusion.HT_fc),
                      "Dense_2": _lin(ref.fusion.output_fc)}
    transplant_astgcn(params["predictor"]["params"], ref.predictor)
    params = jax.tree.map(np.array, params)

    rng = np.random.default_rng(3)
    y = rng.normal(size=src[..., :1].shape).astype(np.float32) + 2.0
    st, yt = torch.tensor(src), torch.tensor(y)

    def ref_forward():
        out, *_ = ref.forward_pretrain(st, st)
        return (out - yt).abs().mean()

    l_ref = _torch_train(ref, ref_forward, 40, 1e-3)

    sj, yj = jnp.asarray(src), jnp.asarray(y)

    def loss_fn(p):
        return jnp.abs(forward(p, sj, None, None, None).pred - yj).mean()

    l_jax = _jax_train(params, loss_fn, 40, 1e-3)
    _assert_trajectories_match(l_ref, l_jax, rtol=0.01,
                               min_improvement=0.1, tail_rtol=0.1)


def test_ccrnn_scheduled_sampling_trajectory_parity():
    """CCRNN on 2-channel NYC-shaped demand data, trained ACROSS the
    scheduled-sampling decay (`model/CCRNN_demand/CCRNN.py:125-126,
    194-195`) — BASELINE.json configs[4], the last untested north-star
    family (VERDICT r3 weak #4b). The reference draws its
    teacher-forcing coins from Python's global `random`; the test
    pre-computes OUR per-step jax uniforms and feeds the identical
    sequence to the torch side, so both frameworks make the same
    forcing decisions and the trained trajectories must coincide.
    cl_decay_steps=5 drives the threshold from 0.80 to ~0.002 over the
    40 steps — the decay regime is genuinely crossed."""
    import random as pyrandom

    from CCRNN_demand.CCRNN import EvoNN2

    from gptst_tpu.models.predictors.ccrnn import CCRNN, CCRNNConfig
    from parity_utils import transplant_ccrnn

    n, nd, hid, khop, cl = 6, 4, 8, 3, 5
    steps, lr = 40, 1e-3
    rng0 = np.random.default_rng(31)
    support = (rng0.uniform(0.0, 1.0, size=(n, n)).astype(np.float32)
               * (rng0.random((n, n)) < 0.5) + np.eye(n, np.eye(n).shape[0],
                                                      dtype=np.float32) * 0.5)
    ns = argparse.Namespace(
        num_predict=12, hidden_size=hid, num_nodes=n, n_dim=nd,
        n_supports=1, k_hop=khop, n_rnn_layers=1, n_gconv_layers=1,
        cl_decay_steps=cl, support=torch.tensor(support))
    ref = EvoNN2(ns, torch.device("cpu"), dim_in=2, dim_out=2)
    ref.train()

    cfg = CCRNNConfig(num_nodes=n, hidden_size=hid, n_dim=nd,
                      k_hop=khop, n_rnn_layers=1, n_gconv_layers=1,
                      cl_decay_steps=cl)
    model = CCRNN(cfg=cfg, dim_in=2, dim_out=2, horizon=12,
                  emb1_init=ref.nodevec1.detach().numpy(),
                  emb2_init=ref.nodevec2.detach().numpy())
    x = rng0.normal(size=(3, 12, n, 2)).astype(np.float32)
    y = rng0.normal(size=(3, 12, n, 2)).astype(np.float32) + 1.5
    params = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.asarray(x)))
    transplant_ccrnn(params["params"], ref, khop)
    params = jax.tree.map(np.array, params)

    # per-step rngs for our side; the SAME uniforms drive torch's coins
    step_rngs = [jax.random.fold_in(jax.random.PRNGKey(5), i)
                 for i in range(steps)]
    uniforms = np.concatenate([
        np.asarray(jax.random.uniform(r, (12,))) for r in step_rngs])
    seq = iter(uniforms.tolist())
    orig_random = pyrandom.random
    pyrandom.random = lambda: next(seq)
    try:
        xt, yt = torch.tensor(x), torch.tensor(y)
        opt = torch.optim.Adam(ref.parameters(), lr=lr, eps=1e-8,
                               weight_decay=0, amsgrad=False)
        l_ref = []
        for i in range(steps):
            opt.zero_grad()
            out = ref(xt, yt, i + 1)  # batch_seen starts at 1
            loss = (out.reshape(yt.shape) - yt).abs().mean()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), 5)
            opt.step()
            l_ref.append(float(loss.detach()))
    finally:
        pyrandom.random = orig_random
    l_ref = np.asarray(l_ref)

    import optax
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(lr, eps=1e-8, eps_root=0.0))
    state = tx.init(params)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    @jax.jit
    def step(p, s, r, i):
        def loss_fn(q):
            pred = model.apply(q, xj, yj, r, i)
            return jnp.abs(pred - yj).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    l_jax = []
    for i in range(steps):
        params, state, loss = step(params, state, step_rngs[i],
                                   jnp.asarray(i + 1, jnp.int32))
        l_jax.append(float(loss))
    l_jax = np.asarray(l_jax)

    _assert_trajectories_match(l_ref, l_jax, rtol=0.01,
                               min_improvement=0.1, tail_rtol=0.1)
