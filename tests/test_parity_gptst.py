"""GPT-ST component parity vs the reference pretrain network
(SURVEY.md §7.3 hard part #1): time features, temporal hypergraph conv,
capsule cluster encoder (routing + detach placement), and the
mask-policy MLP, all with transplanted weights.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/model")

import jax
import jax.numpy as jnp

B, T, N, D = 3, 12, 10, 64
E, ES, HS, HT, HT_TEM = 16, 4, 10, 16, 8


@pytest.fixture(autouse=True)
def _cpu_shim(monkeypatch):
    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        if args and isinstance(args[0], (str, torch.device)) \
                and "cuda" in str(args[0]):
            return orig_to(self, "cpu")
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", to)


def _init_ref(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for p in module.parameters():
        p.data = torch.randn(p.shape, generator=g) * 0.1
    return module


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def _lin(ref_lin):
    return {"kernel": ref_lin.weight.detach().numpy().T,
            "bias": ref_lin.bias.detach().numpy()}


def test_squash_parity():
    from Pretrain_model.GPTST import squash as ref_squash

    from gptst_tpu.ops.capsule import squash

    x = np.random.default_rng(0).normal(size=(B, T, N, D)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(squash(jnp.asarray(x))),
        ref_squash(_t(x)).numpy(), rtol=1e-5, atol=1e-6)


def test_time_feature_parity():
    from Pretrain_model.GPTST import time_feature as RefTF

    from gptst_tpu.models.gptst import TimeFeature

    ref = _init_ref(RefTF(E))
    eb = np.random.default_rng(1).normal(size=(B, T, 2)).astype(np.float32)
    want = ref(_t(eb)).detach().numpy()

    params = {"params": {
        "Dense_0": _lin(ref.ln_day), "Dense_1": _lin(ref.ln_week),
        "Dense_2": _lin(ref.ln1), "Dense_3": _lin(ref.ln2),
        "Dense_4": _lin(ref.ln),
    }}
    got = TimeFeature(E).apply(params, jnp.asarray(eb))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_hyper_tem_parity():
    from Pretrain_model.GPTST import hyperTem as RefHT

    from gptst_tpu.models.gptst import HyperTem

    ref = _init_ref(RefHT(T, N, D, D, E, HT_TEM), seed=2)
    rng = np.random.default_rng(2)
    eb = rng.normal(size=(B, T, N, D)).astype(np.float32)
    node_emb = rng.normal(size=(N, E)).astype(np.float32)
    time_eb = rng.normal(size=(B, T, E)).astype(np.float32)
    want = ref(_t(eb), _t(node_emb), _t(time_eb)).detach().numpy()

    params = {"params": {
        "adj": ref.adj.detach().numpy(),
        "weights_pool": ref.weights_pool.detach().numpy(),
        "bias_pool": ref.bias_pool.detach().numpy(),
    }}
    got = HyperTem(timesteps=T, dim_in=D, dim_out=D, embed_dim=E,
                   ht_tem=HT_TEM).apply(
        params, jnp.asarray(eb), jnp.asarray(node_emb), jnp.asarray(time_eb))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_cap_parity():
    from Pretrain_model.GPTST import cap as RefCap

    from gptst_tpu.models.gptst import Cap

    ref = _init_ref(RefCap(D, N, T, E, ES, HS, HT, num_route=2), seed=3)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, T, N, D)).astype(np.float32)
    node_emb = rng.normal(size=(N, E)).astype(np.float32)
    time_eb_spg = rng.normal(size=(B, ES)).astype(np.float32)
    teb = rng.normal(size=(B, T, ES)).astype(np.float32)
    want, c_ref, dyn_ref = ref(_t(x), _t(node_emb), _t(time_eb_spg), _t(teb))

    params = {"params": {
        "Dense_0": _lin(ref.ln_p),
        "t_adj": ref.t_adj.detach().numpy(),
        "adj": ref.adj.detach().numpy(),
        "weights_spa": ref.weights_spa.detach().numpy(),
        "bias_spa": ref.bias_spa.detach().numpy(),
    }}
    got, c, dyn = Cap(dim=D, num_nodes=N, timesteps=T, embed_dim=E,
                      embed_dim_spa=ES, hs=HS, ht=HT, num_route=2).apply(
        params, jnp.asarray(x), jnp.asarray(node_emb),
        jnp.asarray(time_eb_spg), jnp.asarray(teb))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c),
                               c_ref.squeeze(-1).detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dyn), dyn_ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mlp_rl_parity():
    from Pretrain_model.GPTST import MLP_RL as RefRL

    from gptst_tpu.models.gptst import MLPRL

    ref = _init_ref(RefRL(1, HS, D, E, torch.device("cpu")), seed=4)
    rng = np.random.default_rng(4)
    eb = rng.normal(size=(B, T, N, 1)).astype(np.float32)
    time_eb = rng.normal(size=(B, T, E)).astype(np.float32)
    node_eb = rng.normal(size=(N, E)).astype(np.float32)
    want = ref(_t(eb), _t(time_eb), _t(node_eb)).detach().numpy()

    params = {"params": {
        "Dense_0": _lin(ref.ln1), "Dense_1": _lin(ref.ln3),
        "weights_pool_spa": ref.weights_pool_spa.detach().numpy(),
        "bias_pool_spa": ref.bias_pool_spa.detach().numpy(),
        "weights_pool_tem": ref.weights_pool_tem.detach().numpy(),
        "bias_pool_tem": ref.bias_pool_tem.detach().numpy(),
    }}
    got = MLPRL(dim_in=1, dim_out=HS, hidden_dim=D, embed_dim=E).apply(
        params, jnp.asarray(eb), jnp.asarray(time_eb), jnp.asarray(node_eb))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def _tf_params(tf):
    """reference time_feature/time_feature_spg -> our TimeFeature tree."""
    return {"Dense_0": _lin(tf.ln_day), "Dense_1": _lin(tf.ln_week),
            "Dense_2": _lin(tf.ln1), "Dense_3": _lin(tf.ln2),
            "Dense_4": _lin(tf.ln)}


def _hypertem_params(ht):
    return {"adj": ht.adj.detach().numpy(),
            "weights_pool": ht.weights_pool.detach().numpy(),
            "bias_pool": ht.bias_pool.detach().numpy()}


def _cap_params(cp):
    return {"Dense_0": _lin(cp.ln_p),
            "t_adj": cp.t_adj.detach().numpy(),
            "adj": cp.adj.detach().numpy(),
            "weights_spa": cp.weights_spa.detach().numpy(),
            "bias_spa": cp.bias_spa.detach().numpy()}


def _sthcn_params(st):
    return {
        "node_embeddings": st.node_embeddings.detach().numpy(),
        "node_embeddings_spg": st.node_embeddings_spg.detach().numpy(),
        "TimeFeature_0": _tf_params(st.time_feature1),
        "TimeFeature_1": _tf_params(st.time_feature1_),
        "TimeFeatureSPG_0": _tf_params(st.time_feature2),
        "HyperTem_0": _hypertem_params(st.hyperTem1),
        "HyperTem_1": _hypertem_params(st.hyperTem2),
        "HyperTem_2": _hypertem_params(st.hyperTem3),
        "HyperTem_3": _hypertem_params(st.hyperTem4),
        "Cap_0": _cap_params(st.cap1),
        "Cap_1": _cap_params(st.cap2),
    }


def test_gptst_encoder_forward_parity():
    """Full GPT-ST eval-mode encoder (`forward_fune`,
    `GPTST.py:485-487` -> `Hypergraph_encoder:419-427` -> the whole
    STHCN trunk) vs our `GPTST.encode`, weights transplanted. This is
    the frozen-encoder path every eval-mode downstream run uses."""
    import argparse

    from Pretrain_model.GPTST import GPTST_Model

    from gptst_tpu.models.gptst import GPTST, GPTSTConfig

    n, hd, e, es = 10, 16, 8, 4
    ns = argparse.Namespace(
        num_nodes=n, input_base_dim=1, input_extra_dim=2, hidden_dim=hd,
        output_dim=1, horizon=12, lag=12, embed_dim=e, embed_dim_spa=es,
        HS=5, HT=6, HT_Tem=4, num_route=2, mode="eval", model="STGCN",
        device=torch.device("cpu"), scaler_zeros=0.0, interval=288,
        week_day=7, mask_ratio=0.25, ada_mask_ratio=0.5, ada_type="all",
        change_epoch=10, epochs=100)
    ref = _init_ref(GPTST_Model(ns), seed=5)

    cfg = GPTSTConfig(num_nodes=n, input_base_dim=1, hidden_dim=hd,
                      horizon=12, embed_dim=e, embed_dim_spa=es, HS=5,
                      HT=6, HT_Tem=4, num_route=2, epochs=100)
    model = GPTST(cfg=cfg)
    rng = np.random.default_rng(20)
    flow = rng.normal(size=(3, 12, n, 1)).astype(np.float32)
    day = np.broadcast_to(rng.normal(size=(3, 12, 1, 1)), (3, 12, n, 1))
    week = np.broadcast_to(rng.normal(size=(3, 12, 1, 1)), (3, 12, n, 1))
    src = np.concatenate([flow, day, week], axis=-1).astype(np.float32)

    params = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.asarray(src)))["params"]
    params["dim_in_flow"] = _lin(ref.encoder.dim_in_flow)
    params["encoder"] = _sthcn_params(ref.encoder.STHCN_encode)

    with torch.no_grad():
        want = ref.forward_fune(_t(src), None)[0].numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(src)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_gptst_pretrain_forward_parity():
    """Full pretrain forward (`forward_pretrain`, `GPTST.py:480-483`):
    encoder + decoder trunks, output head, mask-policy probability and
    the HS_cat routing target, with mask_ratio=0 so the (random) mask
    is deterministically all-ones on both sides. Covers everything in
    the pretrain graph except mask sampling itself (tested
    distributionally in test_gptst.py)."""
    import argparse

    from Pretrain_model.GPTST import GPTST_Model

    from gptst_tpu.models.gptst import GPTST, GPTSTConfig
    from test_parity_gptst import (_cap_params, _hypertem_params,
                                   _sthcn_params, _tf_params)

    n, hd, e, es = 10, 16, 8, 4
    ns = argparse.Namespace(
        num_nodes=n, input_base_dim=1, input_extra_dim=2, hidden_dim=hd,
        output_dim=1, horizon=12, lag=12, embed_dim=e, embed_dim_spa=es,
        HS=5, HT=6, HT_Tem=4, num_route=2, mode="pretrain", model="STGCN",
        device=torch.device("cpu"), scaler_zeros=0.0, interval=288,
        week_day=7, mask_ratio=0.0, ada_mask_ratio=0.5, ada_type="all",
        change_epoch=10, epochs=100)
    ref = _init_ref(GPTST_Model(ns), seed=6)

    cfg = GPTSTConfig(num_nodes=n, input_base_dim=1, hidden_dim=hd,
                      horizon=12, embed_dim=e, embed_dim_spa=es, HS=5,
                      HT=6, HT_Tem=4, num_route=2, mask_ratio=0.0,
                      change_epoch=10, epochs=100)
    model = GPTST(cfg=cfg)
    rng = np.random.default_rng(21)
    flow = rng.normal(size=(3, 12, n, 1)).astype(np.float32)
    day = np.broadcast_to(rng.normal(size=(3, 12, 1, 1)), (3, 12, n, 1))
    week = np.broadcast_to(rng.normal(size=(3, 12, 1, 1)), (3, 12, n, 1))
    src = np.concatenate([flow, day, week], axis=-1).astype(np.float32)
    key = jax.random.PRNGKey(7)
    epoch = jnp.asarray(5, jnp.int32)   # <= change_epoch: random branch

    params = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.asarray(src), key,
                   epoch))["params"]
    params["dim_in_flow"] = _lin(ref.encoder.dim_in_flow)
    params["encoder"] = _sthcn_params(ref.encoder.STHCN_encode)
    params["decoder"] = _sthcn_params(ref.decoder.STHCN_decode)
    params["dim_flow_out"] = _lin(ref.decoder.dim_flow_out)
    rl = ref.encoder.MLP_RL
    params["mlp_rl"] = {
        "Dense_0": _lin(rl.ln1), "Dense_1": _lin(rl.ln3),
        "weights_pool_spa": rl.weights_pool_spa.detach().numpy(),
        "bias_pool_spa": rl.bias_pool_spa.detach().numpy(),
        "weights_pool_tem": rl.weights_pool_tem.detach().numpy(),
        "bias_pool_tem": rl.bias_pool_tem.detach().numpy()}
    params["teb4mask"] = _tf_params(ref.encoder.teb4mask)
    params["neb4mask"] = ref.encoder.neb4mask.detach().numpy()

    with torch.no_grad():
        w_out, w_dec, w_mask, w_prob, w_hs = ref.forward_pretrain(
            _t(src), _t(src), epoch=5)
    g_out, g_dec, g_mask, g_prob, g_hs = model.apply(
        {"params": params}, jnp.asarray(src), key, epoch)

    np.testing.assert_allclose(np.asarray(g_mask), w_mask.numpy(),
                               rtol=0, atol=0)   # both all-zeros (1-mask)
    np.testing.assert_allclose(np.asarray(g_prob), w_prob.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_hs), w_hs.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_out), w_out.numpy(),
                               rtol=2e-3, atol=2e-3)
