"""Predictor-zoo contract tests, parameterized over model families.

Every predictor must: (1) map (B,T,N,dim_in)->(B,T_out,N,dim_out) in
ori mode, (2) accept dim_in=64 eval-mode embeddings (`Model.py:46-49`),
(3) produce finite grads, (4) reduce training loss over 2 epochs on
tiny synthetic data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptst_tpu.config import default_config
from gptst_tpu.data import build_dataset
from gptst_tpu.models.build import build_predictor, predictor_forward
from gptst_tpu.train import Trainer

MODELS = ["STGCN", "TGCN", "GWN", "MTGNN", "ASTGCN", "STSGCN", "DMVSTNET",
          "MSDR", "CCRNN", "STMGCN", "STGODE", "STFGNN", "ST_WA"]


def _cfg(model, **kw):
    base = dict(
        mode="ori", model=model, num_nodes=16, batch_size=8, epochs=2,
        lr_decay=False, early_stop=False, log_step=1000)
    base.update(kw)
    return default_config("PEMS08", **base)


@pytest.mark.parametrize("model", MODELS)
def test_forward_shapes_ori(model):
    cfg = _cfg(model)
    init_fn, apply_fn = build_predictor(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    out = apply_fn(params, jnp.zeros((4, 12, 16, 1)))
    assert out.shape == (4, 12, 16, 1)


@pytest.mark.parametrize("model", MODELS)
def test_forward_shapes_eval_width(model):
    cfg = _cfg(model, mode="eval")
    init_fn, apply_fn = build_predictor(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    out = apply_fn(params, jnp.zeros((2, 12, 16, 64)))
    assert out.shape == (2, 12, 16, 1)


@pytest.mark.parametrize("model", MODELS)
def test_grads_finite(model):
    cfg = _cfg(model)
    init_fn, apply_fn = build_predictor(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 12, 16, 1))
    y = jax.random.normal(jax.random.PRNGKey(2), (4, 12, 16, 1))

    def loss(p):
        return jnp.mean(jnp.abs(apply_fn(p, x, jax.random.PRNGKey(3)) - y))

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves, "no grads"
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.parametrize("model", MODELS)
def test_two_epoch_training_improves(model):
    cfg = _cfg(model)
    ds = build_dataset(cfg, num_steps=400, seed=0)
    init_fn, apply_fn = build_predictor(cfg)
    params = init_fn(jax.random.PRNGKey(cfg.seed))
    fwd = predictor_forward(cfg, apply_fn)
    tr = Trainer(forward=fwd, params=params, cfg=cfg, dataset=ds)
    result = tr.train()
    hist = result["history"]
    assert hist[1] < hist[0], f"{model} loss did not decrease: {hist}"
    assert np.isfinite(result["report"]["average"][0])


def test_gwn_multichannel_output():
    """NYC-style 2-channel output exercises GWN's receptive-field quirk
    (final time length == dim_out, `GWN.py:152`)."""
    cfg = default_config("NYC_TAXI", mode="ori", model="GWN",
                        num_nodes=16, batch_size=4)
    init_fn, apply_fn = build_predictor(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    out = apply_fn(params, jnp.zeros((2, 12, 16, 2)))
    assert out.shape == (2, 12, 16, 2)
