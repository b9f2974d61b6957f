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
