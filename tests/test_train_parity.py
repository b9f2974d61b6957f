"""Trajectory parity: train the torch reference and this framework on
IDENTICAL synthetic data with transplanted init and compare loss
curves step by step (VERDICT r1 item 2; protocol
`model/BasicTrainer.py:67-123`, `model/Run.py:91-143`).

Both sides: Adam(lr, eps=1e-8, no bias-correction deviations),
grad-clip 5, plain MAE loss, full-batch steps. GPT-ST pretrain runs
mask_ratio=1.0 so the (otherwise stochastic) mask is deterministically
all-masked on both sides — the loss reconstructs every point from
calendar embeddings, a real training signal with a reproducible
trajectory.
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
import optax

from parity_utils import transplant_stgcn


@pytest.fixture(autouse=True)
def _cpu_shim(monkeypatch):
    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        if args and isinstance(args[0], (str, torch.device)) \
                and "cuda" in str(args[0]):
            return orig_to(self, "cpu")
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", to)


def _torch_train(model, forward, steps, lr):
    opt = torch.optim.Adam(model.parameters(), lr=lr, eps=1e-8,
                           weight_decay=0, amsgrad=False)
    losses = []
    for _ in range(steps):
        opt.zero_grad()
        loss = forward()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5)
        opt.step()
        losses.append(float(loss.detach()))
    return np.asarray(losses)


def _jax_train(params, loss_fn, steps, lr):
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(lr, eps=1e-8, eps_root=0.0))
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(steps):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    return np.asarray(losses)


def _assert_trajectories_match(l_ref, l_jax, rtol, min_improvement,
                               tail_rtol=None):
    """Early steps must match tightly; the tail tolerance is looser —
    f32 rounding differences compound chaotically over many updates."""
    head = min(10, len(l_ref))
    np.testing.assert_allclose(l_jax[:head], l_ref[:head], rtol=rtol)
    np.testing.assert_allclose(l_jax, l_ref, rtol=tail_rtol or 5 * rtol)
    assert l_ref[-1] < l_ref[0] * (1 - min_improvement)
    assert l_jax[-1] < l_jax[0] * (1 - min_improvement)


STEPS = 60
LR = 3e-3


def test_stgcn_trajectory_parity():
    from STGCN.args import cheb_poly_approx, scaled_laplacian
    from STGCN.stgcn import STGCN as RefSTGCN

    from gptst_tpu.config import default_config
    from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
    from gptst_tpu.models.build import build_predictor

    n = 16
    a = sym_adj(random_sensor_graph(n, avg_degree=4, seed=7)) \
        .astype(np.float64)
    cfg = default_config("PEMS08", mode="ori", model="STGCN", num_nodes=n)
    init_fn, apply_fn = build_predictor(cfg, adj=a)
    params = jax.tree.map(np.asarray, init_fn(jax.random.PRNGKey(0)))

    ns = argparse.Namespace(Ks=3, Kt=3, blocks1=[64, 32, 128],
                            drop_prob=0.0, outputl_ks=3, num_nodes=n)
    ns.G = torch.FloatTensor(
        np.asarray(cheb_poly_approx(scaled_laplacian(a), 3, n)))
    ref = RefSTGCN(ns, torch.device("cpu"), dim_in=1, dim_out=1)
    ref.train()
    transplant_stgcn(params["params"], ref)
    # the transplanted arrays are views of the torch tensors — copy, or
    # the torch optimizer would mutate our params in place
    params = jax.tree.map(np.array, params)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 12, n, 1)).astype(np.float32)
    y = rng.normal(size=(8, 12, n, 1)).astype(np.float32) + 2.0

    xt, yt = torch.tensor(x), torch.tensor(y)
    l_ref = _torch_train(
        ref, lambda: (ref(xt) - yt).abs().mean(), STEPS, LR)

    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def loss_fn(p):
        return jnp.abs(apply_fn(p, xj) - yj).mean()

    l_jax = _jax_train(params, loss_fn, STEPS, LR)
    _assert_trajectories_match(l_ref, l_jax, rtol=0.005,
                               min_improvement=0.2, tail_rtol=0.1)


def test_gptst_pretrain_trajectory_parity():
    from Pretrain_model.GPTST import GPTST_Model

    from gptst_tpu.models.gptst import GPTST, GPTSTConfig
    from test_parity_gptst import (
        _cap_params, _hypertem_params, _init_ref, _lin, _sthcn_params,
        _tf_params,
    )

    del _cap_params, _hypertem_params  # used transitively by _sthcn_params

    n, hd, e, es = 10, 16, 8, 4
    ns = argparse.Namespace(
        num_nodes=n, input_base_dim=1, input_extra_dim=2, hidden_dim=hd,
        output_dim=1, horizon=12, lag=12, embed_dim=e, embed_dim_spa=es,
        HS=5, HT=6, HT_Tem=4, num_route=2, mode="pretrain", model="STGCN",
        device=torch.device("cpu"), scaler_zeros=0.0, interval=288,
        week_day=7, mask_ratio=1.0, ada_mask_ratio=0.5, ada_type="all",
        change_epoch=10, epochs=100)
    ref = _init_ref(GPTST_Model(ns), seed=6)

    cfg = GPTSTConfig(num_nodes=n, input_base_dim=1, hidden_dim=hd,
                      horizon=12, embed_dim=e, embed_dim_spa=es, HS=5,
                      HT=6, HT_Tem=4, num_route=2, mask_ratio=1.0,
                      change_epoch=10, epochs=100)
    model = GPTST(cfg=cfg)

    rng = np.random.default_rng(21)
    flow = rng.normal(size=(3, 12, n, 1)).astype(np.float32)
    day = np.broadcast_to(rng.normal(size=(3, 12, 1, 1)), (3, 12, n, 1))
    week = np.broadcast_to(rng.normal(size=(3, 12, 1, 1)), (3, 12, n, 1))
    src = np.concatenate([flow, day, week], axis=-1).astype(np.float32)
    key = jax.random.PRNGKey(7)
    epoch_j = jnp.asarray(5, jnp.int32)   # <= change_epoch: random branch

    params = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.asarray(src), key, epoch_j))
    p = params["params"]
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
    # detach().numpy() arrays are views of the torch tensors — copy, or
    # the torch optimizer would mutate our params in place
    params = jax.tree.map(np.array, params)

    srcs = torch.tensor(src)

    def ref_forward():
        out, _, inv_mask, _, _ = ref.forward_pretrain(srcs, srcs, epoch=5)
        label = srcs[..., :1]
        return ((out * inv_mask) - (label * inv_mask)).abs().mean()

    l_ref = _torch_train(ref, ref_forward, 15, 1e-3)

    srcj = jnp.asarray(src)

    def loss_fn(params):
        out, _, inv_mask, _, _ = model.apply(params, srcj, key, epoch_j)
        label = srcj[..., :1]
        return jnp.abs(out * inv_mask - label * inv_mask).mean()

    l_jax = _jax_train(params, loss_fn, 15, 1e-3)
    # sanity: mask_ratio=1.0 really masks everything on both sides
    out = model.apply(params, srcj, key, epoch_j)
    assert float(jnp.min(out[2])) == 1.0  # inv_mask all ones
    _assert_trajectories_match(l_ref, l_jax, rtol=0.02,
                               min_improvement=0.01)
