"""Op-level numerics tests against torch re-derivations of the
reference math (semantics re-executed inline, not reference code)."""

import numpy as np
import pytest
import torch

from gptst_tpu.ops import (
    adaptive_adj, cheb_conv, diffusion_conv, dynamic_routing, graph_matmul,
    mixprop, node_param_linear, squash, time_param_linear,
)


def torch_squash(x, dim=-1):
    sq = (x ** 2).sum(dim=dim, keepdim=True)
    return sq / (1 + sq) * x / (sq.sqrt() + 1e-8)


def test_squash_matches_torch():
    x = np.random.default_rng(0).normal(size=(3, 4, 5)).astype(np.float32)
    ours = np.asarray(squash(x))
    ref = torch_squash(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_cheb_conv_matches_reference_einsum():
    rng = np.random.default_rng(1)
    B, T, N, Ci, Co, K = 2, 4, 7, 3, 5, 3
    x = rng.normal(size=(B, T, N, Ci)).astype(np.float32)
    lk = rng.normal(size=(K, N, N)).astype(np.float32)
    theta = rng.normal(size=(Ci, Co, K)).astype(np.float32)
    # reference (stgcn.py:76-77) works on (B, C, T, N)
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    x_c = torch.einsum("knm,bitm->bitkn", torch.tensor(lk), xt)
    x_gc = torch.einsum("iok,bitkn->botn", torch.tensor(theta), x_c)
    ref = x_gc.permute(0, 2, 3, 1).numpy()
    ours = np.asarray(cheb_conv(x, lk, theta))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dynamic_routing_matches_torch_reference():
    """Re-execute GPTST.py:100-120 routing semantics in torch and compare."""
    rng = np.random.default_rng(2)
    B, T, N, D, H = 2, 3, 11, 6, 4
    pcaps = torch_squash(torch.tensor(
        rng.normal(size=(B, T, N, D)).astype(np.float32)))
    dadj = torch.tensor(rng.normal(size=(B, T, H, N)).astype(np.float32))

    # torch re-derivation
    test1 = torch.einsum("bthn,btnd->bthd", dadj.softmax(-2), pcaps)
    u_hat = torch.matmul(
        torch_squash(test1).unsqueeze(-1).permute(0, 1, 3, 2, 4),
        pcaps.unsqueeze(-1).permute(0, 1, 3, 2, 4).transpose(-1, -2),
    ).permute(0, 1, 3, 4, 2)
    k = pcaps.detach()
    u = u_hat.detach()
    b = torch.zeros(B, T, H, N, 1)
    for _ in range(2):
        c = b.softmax(dim=2)
        s = (c * u).sum(-2)
        v = torch_squash(s)
        uv = torch.matmul(v, k.transpose(-1, -2)).unsqueeze(-1)
        b = b + uv
    ref = (b + dadj.unsqueeze(-1)).softmax(dim=2).squeeze(-1).numpy()

    ours = np.asarray(dynamic_routing(pcaps.numpy(), dadj.numpy(), num_route=2))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_param_pool_node_matches_torch():
    rng = np.random.default_rng(3)
    B, T, N, Di, Do, E = 2, 3, 5, 4, 6, 8
    x = rng.normal(size=(B, T, N, Di)).astype(np.float32)
    emb = rng.normal(size=(N, E)).astype(np.float32)
    wp = rng.normal(size=(E, Di, Do)).astype(np.float32)
    bp = rng.normal(size=(E, Do)).astype(np.float32)
    w = torch.einsum("nd,dio->nio", torch.tensor(emb), torch.tensor(wp))
    ref = (torch.einsum("btni,nio->btno", torch.tensor(x), w)
           + torch.tensor(emb) @ torch.tensor(bp)).numpy()
    ours = np.asarray(node_param_linear(x, emb, wp, bp))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_param_pool_time_matches_torch():
    rng = np.random.default_rng(4)
    B, T, N, Di, Do, E = 2, 3, 5, 4, 6, 8
    x = rng.normal(size=(B, T, N, Di)).astype(np.float32)
    teb = rng.normal(size=(B, T, E)).astype(np.float32)
    wp = rng.normal(size=(E, Di, Do)).astype(np.float32)
    bp = rng.normal(size=(E, Do)).astype(np.float32)
    w = torch.einsum("btd,dio->btio", torch.tensor(teb), torch.tensor(wp))
    ref = (torch.einsum("btni,btio->btno", torch.tensor(x), w)
           + (torch.tensor(teb) @ torch.tensor(bp)).unsqueeze(-2)).numpy()
    ours = np.asarray(time_param_linear(x, teb, wp, bp))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_diffusion_conv_shapes_and_order():
    rng = np.random.default_rng(5)
    B, N, Ci, Co = 2, 6, 3, 4
    x = rng.normal(size=(B, N, Ci)).astype(np.float32)
    a1 = rng.random((N, N)).astype(np.float32)
    a2 = rng.random((N, N)).astype(np.float32)
    w = rng.normal(size=((1 + 2 * 2) * Ci, Co)).astype(np.float32)
    out = diffusion_conv(x, [a1, a2], w, order=2)
    assert out.shape == (B, N, Co)
    # manual expansion
    feats = [x, a1 @ x, a1 @ (a1 @ x), a2 @ x, a2 @ (a2 @ x)]
    ref = np.concatenate(feats, axis=-1) @ w
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_mixprop_alpha_one_is_identity_concat():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 5, 3)).astype(np.float32)
    adj = rng.random((5, 5)).astype(np.float32)
    w = np.eye(9, 4, dtype=np.float32)
    out = mixprop(x, adj, w, gdep=2, alpha=1.0)
    # alpha=1 → every hop equals x
    ref = np.concatenate([x, x, x], axis=-1) @ w
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_adaptive_adj_rows_sum_to_one():
    rng = np.random.default_rng(7)
    e1 = rng.normal(size=(9, 4)).astype(np.float32)
    e2 = rng.normal(size=(4, 9)).astype(np.float32)
    a = np.asarray(adaptive_adj(e1, e2))
    np.testing.assert_allclose(a.sum(axis=1), 1.0, rtol=1e-5)


def test_graph_matmul_batched():
    rng = np.random.default_rng(8)
    s = rng.normal(size=(5, 5)).astype(np.float32)
    x = rng.normal(size=(2, 3, 5, 4)).astype(np.float32)
    out = np.asarray(graph_matmul(s, x))
    ref = np.einsum("nm,btmc->btnc", s, x)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
