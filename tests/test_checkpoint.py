"""Resumable-training checkpoint round-trip (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from gptst_tpu.config import default_config
from gptst_tpu.data import build_dataset
from gptst_tpu.models.build import build_predictor, predictor_forward
from gptst_tpu.train import Trainer


def test_full_checkpoint_roundtrip(tmp_path):
    cfg = default_config("PEMS08", mode="ori", model="STGCN", num_nodes=16,
                         batch_size=8, epochs=1, lr_decay=False,
                         early_stop=False, log_step=1000)
    ds = build_dataset(cfg, num_steps=300, seed=0)
    init_fn, apply_fn = build_predictor(cfg)
    fwd = predictor_forward(cfg, apply_fn)
    tr = Trainer(forward=fwd, params=init_fn(jax.random.PRNGKey(0)),
                 cfg=cfg, dataset=ds)
    tr.train_epoch(1, jax.random.PRNGKey(1))
    path = str(tmp_path / "full_ckpt")
    tr.save_full_checkpoint(path, epoch=1)

    tr2 = Trainer(forward=fwd, params=init_fn(jax.random.PRNGKey(9)),
                  cfg=cfg, dataset=ds)
    next_epoch = tr2.restore_full_checkpoint(path)
    assert next_epoch == 2
    assert tr2.batch_seen == tr.batch_seen
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state (adam moments) restored too
    for a, b in zip(jax.tree_util.tree_leaves(tr.opt_state),
                    jax.tree_util.tree_leaves(tr2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    loss = tr2.train_epoch(next_epoch, jax.random.PRNGKey(2))
    assert np.isfinite(loss)
