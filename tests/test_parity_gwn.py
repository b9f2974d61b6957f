"""GWN end-to-end forward parity vs the reference with transplanted
weights (dropout disabled; both sides use batch statistics in their
normalization so the comparison is exact)."""

import argparse
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/model")

import jax
import jax.numpy as jnp


def build_gwn_pair(n=16, seed=0):
    """(ref torch GWNET, our GWN model, transplanted flax params) with
    dropout disabled and identical weights (`model/GWN/GWN.py`)."""
    from GWN.GWN import GWNET

    from gptst_tpu.models.predictors.gwn import GWN, GWNConfig

    ns = argparse.Namespace(
        adj_mx=None, num_nodes=n, dropout=0.0, blocks=4, layers=2,
        gcn_bool=True, addaptadj=True, adjtype="doubletransition",
        randomadj=True, aptonly=True, kernel_size=2, nhid=32,
        residual_channels=32, dilation_channels=32,
        input_window=12, output_window=12)
    torch.manual_seed(seed)
    ref = GWNET(ns, torch.device("cpu"), dim_in=1, dim_out=1)
    ref.train()  # batch-stats normalization, dropout=0 so deterministic

    # the reference declares gate/skip/residual convs as Conv1d with 2D
    # kernels — accepted by torch 1.9, rejected by modern torch; swap in
    # weight-identical Conv2d modules
    def conv1d_to_2d(c, dilation):
        k = tuple(c.weight.shape[2:])
        m = torch.nn.Conv2d(c.weight.shape[1], c.weight.shape[0], k,
                            dilation=dilation)
        m.weight.data = c.weight.data.clone()
        m.bias.data = c.bias.data.clone()
        return m

    for i in range(8):
        d = 2 ** (i % 2)
        ref.gate_convs[i] = conv1d_to_2d(ref.gate_convs[i], d)
        ref.skip_convs[i] = conv1d_to_2d(ref.skip_convs[i], 1)
        ref.residual_convs[i] = conv1d_to_2d(ref.residual_convs[i], 1)

    pcfg = GWNConfig(num_nodes=n, dropout=0.0)
    model = GWN(cfg=pcfg, dim_in=1, dim_out=1, horizon=12)
    x0 = np.zeros((2, 12, n, 1), np.float32)
    params = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.asarray(x0), ()))["params"]

    def lin(conv):  # torch Conv2d 1x1 -> Dense
        return {"kernel": conv.weight.detach().numpy()[:, :, 0, 0].T,
                "bias": conv.bias.detach().numpy()}

    def tconv(conv):  # torch Conv2d (1, k) on (B,C,N,T) -> our (k,1,in,out)
        w = conv.weight.detach().numpy()          # (out, in, 1, k)
        return {"Conv_0": {
            "kernel": w.transpose(3, 2, 1, 0),
            "bias": conv.bias.detach().numpy()}}

    params["nodevec1"] = ref.nodevec1.detach().numpy()
    params["nodevec2"] = ref.nodevec2.detach().numpy()
    params["start_conv"] = lin(ref.start_conv)
    for i in range(8):
        b, l = divmod(i, 2)
        params[f"DilatedCausal_{2 * i}"] = tconv(ref.filter_convs[i])
        params[f"DilatedCausal_{2 * i + 1}"] = tconv(ref.gate_convs[i])
        params[f"Dense_{i}"] = lin(ref.skip_convs[i])
        g = lin(ref.gconv[i].mlp.mlp)
        params[f"gconv_w_{b}_{l}"] = g["kernel"]
        params[f"gconv_b_{b}_{l}"] = g["bias"]
        params[f"BatchStatsNorm_{i}"] = {
            "scale": ref.bn[i].weight.detach().numpy(),
            "bias": ref.bn[i].bias.detach().numpy()}
    params["end_conv_1"] = lin(ref.end_conv_1)
    params["end_conv_2"] = lin(ref.end_conv_2)
    # detach().numpy() arrays are views of the torch tensors — copy, or
    # the torch optimizer would mutate our params in place
    params = jax.tree.map(np.array, params)
    return ref, model, params


def test_gwn_forward_parity():
    n = 16
    ref, model, params = build_gwn_pair(n)
    x = np.random.default_rng(0).normal(size=(4, 12, n, 1)) \
        .astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), ()))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_gwn_svd_aptinit_branch():
    """randomadj=False seeds the adaptive-adjacency embeddings from the
    rank-10 SVD of supports[0] (`model/GWN/GWN.py:159-175`) — a branch
    dead in every shipped conf but part of the reference surface
    (VERDICT r3 missing #2). SVD factors are sign-ambiguous per
    singular vector, so parity is checked on the product E1 @ E2 (the
    only way the forward consumes them, `GWN.py:238`)."""
    from GWN.GWN import GWNET

    from gptst_tpu.config import default_config
    from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
    from gptst_tpu.models.build import build_predictor

    n = 16
    adj = sym_adj(random_sensor_graph(n, avg_degree=4, seed=9)) \
        .astype(np.float64)

    ns = argparse.Namespace(
        adj_mx=adj.copy(), num_nodes=n, dropout=0.0, blocks=4, layers=2,
        gcn_bool=True, addaptadj=True, adjtype="doubletransition",
        randomadj=False, aptonly=True, kernel_size=2, nhid=32,
        residual_channels=32, dilation_channels=32,
        input_window=12, output_window=12)
    torch.manual_seed(0)
    ref = GWNET(ns, torch.device("cpu"), dim_in=1, dim_out=1)
    want = (ref.nodevec1.detach().numpy()
            @ ref.nodevec2.detach().numpy())

    cfg = default_config("PEMS08", mode="ori", model="GWN", num_nodes=n)
    cfg = cfg.replace(predictor_overrides=(("randomadj", "False"),
                                           ("dropout", "0.0")))
    init_fn, _ = build_predictor(cfg, adj=adj)
    p = init_fn(jax.random.PRNGKey(0))["params"]
    got = np.asarray(p["nodevec1"]) @ np.asarray(p["nodevec2"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
