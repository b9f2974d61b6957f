"""End-to-end STGCN smoke: shapes, loss decrease over 2 epochs, and
checkpoint round-trip — the reference's social test (§4) made explicit."""

import jax
import jax.numpy as jnp
import numpy as np

from gptst_tpu.config import default_config
from gptst_tpu.data import build_dataset
from gptst_tpu.models.build import build_predictor, predictor_forward
from gptst_tpu.train import Trainer


def _small_cfg(**kw):
    base = dict(
        mode="ori", model="STGCN", num_nodes=16, batch_size=8, epochs=2,
        lr_decay=False, early_stop=False, log_step=1000)
    base.update(kw)
    return default_config("PEMS08", **base)


def test_stgcn_forward_shapes():
    cfg = _small_cfg()
    init_fn, apply_fn = build_predictor(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    x = jnp.zeros((4, 12, 16, 1))
    out = apply_fn(params, x)
    assert out.shape == (4, 12, 16, 1)


def test_stgcn_eval_mode_width():
    # predictors must accept dim_in=64 (eval-mode contract, Model.py:46-49)
    cfg = _small_cfg(mode="eval")
    init_fn, apply_fn = build_predictor(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    out = apply_fn(params, jnp.zeros((2, 12, 16, 64)))
    assert out.shape == (2, 12, 16, 1)


def test_stgcn_two_epoch_training_improves(tmp_path):
    cfg = _small_cfg()
    # tiny synthetic dataset: override node count via spec-less path
    ds = build_dataset(cfg, num_steps=400, seed=0)
    # shrink nodes to 16 for speed
    for attr in ("x_train", "y_train", "x_val", "y_val", "x_test", "y_test"):
        setattr(ds, attr, getattr(ds, attr)[:, :, :16])
    init_fn, apply_fn = build_predictor(cfg)
    params = init_fn(jax.random.PRNGKey(cfg.seed))
    fwd = predictor_forward(cfg, apply_fn)
    tr = Trainer(forward=fwd, params=params, cfg=cfg, dataset=ds,
                 log_dir=str(tmp_path))
    result = tr.train()
    hist = result["history"]
    assert len(hist) == 2
    assert hist[1] < hist[0], f"loss did not decrease: {hist}"
    assert np.isfinite(result["report"]["average"][0])

    # checkpoint round-trip
    p0 = jax.tree.leaves(tr.params)[0]
    tr.params = jax.tree.map(jnp.zeros_like, tr.params)
    tr.load_checkpoint(str(tmp_path / "best_model"))
    np.testing.assert_allclose(jax.tree.leaves(tr.params)[0], p0)
