"""bf16 mixed-precision drift bound (VERDICT r2 weak #4).

The framework's fast mode (`compute_dtype='bfloat16'`,
`train/step.py:make_loss_terms`) runs the forward on bf16 casts of
params+inputs with f32 master params and f32 loss. These tests train
the SAME model through the product train step in both precisions and
bound the trajectory divergence — the evidence behind making bf16 the
recommended throughput mode (bench.py reports both).

Documented default: `compute_dtype='float32'` stays the config default
for bit-parity with the torch reference; bf16 is the opt-in fast mode
with the drift bound certified here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gptst_tpu.config import default_config
from gptst_tpu.models.build import build_model
from gptst_tpu.train.loss import build_loss
from gptst_tpu.train.step import make_loss_terms, make_train_step

STEPS = 30


def _train(cfg, steps=STEPS, seed=0):
    init_fn, forward = build_model(cfg, scaler_zeros=0.0)
    params = init_fn(jax.random.PRNGKey(seed))
    optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(1e-3, eps=1e-8))
    opt_state = optimizer.init(params)
    loss_fn = build_loss(cfg.loss_func, 0.0, 1.0, cfg.mape_thresh,
                         cfg.mode == "pretrain")
    step = jax.jit(make_train_step(
        make_loss_terms(forward, loss_fn, cfg), optimizer))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(
        size=(8, cfg.lag, cfg.num_nodes, cfg.input_base_dim + 2)
    ).astype(np.float32))
    y = jnp.asarray(rng.normal(
        size=(8, cfg.horizon, cfg.num_nodes, cfg.input_base_dim + 2)
    ).astype(np.float32) + 2.0)
    ep = jnp.asarray(5, jnp.int32)
    losses = []
    for i in range(steps):
        params, opt_state, total, flow = step(
            params, opt_state, x, y, jax.random.PRNGKey(100 + i), ep,
            jnp.asarray(i, jnp.int32))
        losses.append(float(flow))
    return np.asarray(losses)


def _assert_drift_bounded(l32, l16, head_tol, full_tol):
    assert np.isfinite(l16).all()
    head = min(5, len(l32))
    np.testing.assert_allclose(l16[:head], l32[:head], rtol=head_tol)
    # whole-curve divergence stays bounded and both optimize
    rel = np.abs(l16 - l32) / np.abs(l32)
    assert rel.max() < full_tol, (rel.max(), rel)
    assert l16[-1] < l16[0]
    assert l32[-1] < l32[0]


def test_stgcn_ori_bf16_drift():
    cfg = default_config("PEMS08", mode="ori", model="STGCN")
    cfg = cfg.replace(num_nodes=16, log_dir=None)
    l32 = _train(cfg.replace(compute_dtype="float32"))
    l16 = _train(cfg.replace(compute_dtype="bfloat16"))
    _assert_drift_bounded(l32, l16, head_tol=0.02, full_tol=0.10)


def test_gptst_pretrain_bf16_drift():
    cfg = default_config("PEMS08", mode="pretrain", model="STGCN")
    cfg = cfg.replace(num_nodes=12, hidden_dim=16, embed_dim=8,
                      embed_dim_spa=4, HS=4, HT=6, HT_Tem=4,
                      change_epoch=1, log_dir=None)  # epoch 5 > change:
    # the adaptive-mask + KL regime runs in both precisions
    l32 = _train(cfg.replace(compute_dtype="float32"))
    l16 = _train(cfg.replace(compute_dtype="bfloat16"))
    _assert_drift_bounded(l32, l16, head_tol=0.05, full_tol=0.25)
