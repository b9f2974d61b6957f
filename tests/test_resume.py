"""Kill-and-resume: a run interrupted after a periodic checkpoint and
resumed with `-resume` reproduces the uninterrupted loss trajectory
exactly (VERDICT r1 item 8; SURVEY §5 failure-recovery build plan)."""

import numpy as np
import jax

from gptst_tpu.config.config import default_config
from gptst_tpu.data import build_dataset
from gptst_tpu.models.build import build_model
from gptst_tpu.train import Trainer


def _make(tmp_path, epochs, ckpt_every):
    cfg = default_config(
        "PEMS08", mode="ori", model="STGCN", num_nodes=12,
        batch_size=8, epochs=epochs, lr_decay=False, early_stop=False,
        debug=True, log_step=10_000, scan_steps=1,
        ckpt_every_epochs=ckpt_every)
    ds = build_dataset(cfg, num_steps=260, seed=5)
    init_fn, forward = build_model(cfg, scaler_zeros=ds.scaler_zeros)
    params = init_fn(jax.random.PRNGKey(cfg.seed))
    return Trainer(forward=forward, params=params, cfg=cfg, dataset=ds,
                   seed=cfg.seed, log_dir=str(tmp_path))


def test_kill_and_resume_reproduces_trajectory(tmp_path):
    straight_dir = tmp_path / "straight"
    straight_dir.mkdir()
    straight = _make(straight_dir, epochs=6, ckpt_every=0)
    full = straight.train()["history"]
    assert len(full) == 6

    # interrupted run: checkpoint every 2 epochs, "die" after epoch 4
    kill_dir = tmp_path / "killed"
    kill_dir.mkdir()
    first = _make(kill_dir, epochs=4, ckpt_every=2)
    part1 = first.train()["history"]
    assert len(part1) == 4
    assert (kill_dir / "full_ckpt").exists()

    # fresh process state: new Trainer, new params init, resume=True
    second = _make(kill_dir, epochs=6, ckpt_every=2)
    part2 = second.train(resume=True)["history"]
    # the checkpoint was written at epoch 4 -> resume trains 5..6
    assert len(part2) == 2

    np.testing.assert_allclose(part1 + part2, full, rtol=1e-5, atol=1e-6)


def test_resume_restores_best_bookkeeping(tmp_path):
    t = _make(tmp_path, epochs=3, ckpt_every=1)
    t.train()
    t2 = _make(tmp_path, epochs=3, ckpt_every=1)
    start = t2.restore_full_checkpoint(str(tmp_path / "full_ckpt"))
    assert start == 4
    assert np.isfinite(t2._best_loss)
    assert t2.batch_seen > 0
    # restored best params differ from the fresh init
    fresh = _make(tmp_path, epochs=1, ckpt_every=0).params
    a = jax.tree_util.tree_leaves(t2._best_params)[0]
    b = jax.tree_util.tree_leaves(fresh)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
