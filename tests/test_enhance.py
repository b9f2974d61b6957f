"""Eval-mode (enhancement) tests: pretrain → freeze → fuse → predictor,
verifying the frozen encoder truly receives no gradient updates."""

import jax
import jax.numpy as jnp
import numpy as np

from gptst_tpu.config import default_config
from gptst_tpu.data import build_dataset
from gptst_tpu.models.build import build_model
from gptst_tpu.train import Trainer


def _cfg(mode, **kw):
    base = dict(
        model="STGCN", num_nodes=12, hidden_dim=16, embed_dim=8,
        embed_dim_spa=4, HS=4, HT=6, HT_Tem=4, batch_size=8, epochs=2,
        change_epoch=1, lr_decay=False, early_stop=False, log_step=1000,
        up_epoch=())
    base.update(kw)
    return default_config("PEMS08", mode=mode, **base)


def _shrink(ds, n=12):
    for attr in ("x_train", "y_train", "x_val", "y_val", "x_test", "y_test"):
        setattr(ds, attr, getattr(ds, attr)[:, :, :n])
    return ds


def test_enhance_end_to_end(tmp_path):
    # 1) quick pretrain
    pcfg = _cfg("pretrain", epochs=1)
    ds = _shrink(build_dataset(pcfg, num_steps=300, seed=0))
    init_fn, fwd = build_model(pcfg, scaler_zeros=ds.scaler_zeros)
    pretrain_params = init_fn(jax.random.PRNGKey(0))
    tr = Trainer(forward=fwd, params=pretrain_params, cfg=pcfg, dataset=ds)
    tr.train()
    pretrain_params = tr.params

    # 2) eval mode: frozen encoder + fusion + STGCN
    ecfg = _cfg("eval")
    init_fn2, fwd2 = build_model(
        ecfg, scaler_zeros=ds.scaler_zeros, pretrain_params=pretrain_params)
    params = init_fn2(jax.random.PRNGKey(1))
    assert set(params.keys()) == {"head", "predictor"}
    # frozen params are NOT in the trainable tree
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert not any("encoder" in str(p) for p, _ in flat)

    tr2 = Trainer(forward=fwd2, params=params, cfg=ecfg, dataset=ds)
    res = tr2.train()
    assert res["history"][1] < res["history"][0]
    assert np.isfinite(res["report"]["average"][0])


def test_enhance_gradient_does_not_touch_encoder():
    pcfg = _cfg("pretrain")
    ds = _shrink(build_dataset(pcfg, num_steps=300, seed=0))
    init_fn, _ = build_model(pcfg, scaler_zeros=ds.scaler_zeros)
    pre = init_fn(jax.random.PRNGKey(0))

    ecfg = _cfg("eval")
    init_fn2, fwd2 = build_model(
        ecfg, scaler_zeros=ds.scaler_zeros, pretrain_params=pre)
    params = init_fn2(jax.random.PRNGKey(1))

    x = jnp.asarray(ds.x_train[:4])
    y = jnp.asarray(ds.y_train[:4])

    def loss(p):
        out = fwd2(p, x, y, None, None)
        return jnp.mean((out.pred - y[..., :1]) ** 2)

    g = jax.grad(loss)(params)
    # gradients flow to head and predictor
    gnorm_head = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g["head"]))
    gnorm_pred = sum(float(jnp.abs(v).sum())
                     for v in jax.tree.leaves(g["predictor"]))
    assert gnorm_head > 0
    assert gnorm_pred > 0
