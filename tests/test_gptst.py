"""GPT-ST pretrain network tests: mask curriculum statistics, output
contract, and a 2-epoch training smoke across the curriculum switch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptst_tpu.config import default_config
from gptst_tpu.data import build_dataset
from gptst_tpu.models.build import build_model
from gptst_tpu.models.gptst import GPTST, GPTSTConfig, generate_mask
from gptst_tpu.train import Trainer


def small_gcfg(**kw):
    base = dict(num_nodes=12, input_base_dim=1, hidden_dim=16, horizon=12,
                embed_dim=8, embed_dim_spa=4, HS=4, HT=6, HT_Tem=4,
                num_route=2, mask_ratio=0.25, ada_mask_ratio=0.5,
                ada_type="all", change_epoch=2, epochs=10, scaler_zeros=-0.5)
    base.update(kw)
    return GPTSTConfig(**base)


def test_random_mask_exact_count_and_values():
    cfg = small_gcfg()
    B, T, N, D = 4, 12, 12, 1
    guide = jnp.ones((B, T, N, cfg.HS)) / cfg.HS
    mask = generate_mask(cfg, jax.random.PRNGKey(0), guide,
                         jnp.asarray(1, jnp.int32), (B, T, N, D))
    m = np.asarray(mask)
    assert set(np.unique(m)) <= {0.0, 1.0}
    numel = B * T * N * D
    assert int((m == 0).sum()) == int(numel * cfg.mask_ratio)


@pytest.mark.parametrize("ada_type", ["all", "half"])
def test_adaptive_mask_budget_and_cluster_structure(ada_type):
    cfg = small_gcfg(ada_type=ada_type, change_epoch=2, epochs=10,
                     ada_mask_ratio=1.0)
    B, T, N, D = 4, 12, 12, 1
    rng = jax.random.PRNGKey(1)
    # sharply clustered guide → deterministic label_c
    labels = jax.random.randint(rng, (B, T, N), 0, cfg.HS)
    guide = jax.nn.one_hot(labels, cfg.HS)
    epoch = jnp.asarray(6, jnp.int32)  # ramp = (6-2)/(10-2)*1.0 = 0.5
    mask = generate_mask(cfg, jax.random.PRNGKey(2), guide, epoch,
                         (B, T, N, D))
    m = np.asarray(mask)[..., 0]
    total = B * T * N
    mask_num_sum = int(total * cfg.mask_ratio)
    assert int((m == 0).sum()) == mask_num_sum

    if ada_type == "all":
        # adaptive part: a_num = floor(mask_num_sum * 0.5); whole clusters
        # must be fully masked except at most one boundary cluster
        lab = np.asarray(labels)
        fully_masked = []
        for c in range(cfg.HS):
            sel = m[lab == c]
            frac = (sel == 0).mean()
            if frac == 1.0:
                fully_masked.append(c)
        a_num = int(mask_num_sum * 0.5)
        if fully_masked:
            n_full = sum(int((lab == c).sum()) for c in fully_masked)
            assert n_full <= a_num  # never over the adaptive budget


def test_mask_ramp_saturates():
    cfg = small_gcfg(change_epoch=2, epochs=10, ada_mask_ratio=2.0)
    B, T, N, D = 2, 12, 12, 1
    guide = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(0), (B, T, N), 0, cfg.HS),
        cfg.HS)
    # epoch far beyond saturation: ramp clamps at 1.0 → still exact total
    mask = generate_mask(cfg, jax.random.PRNGKey(3), guide,
                         jnp.asarray(10, jnp.int32), (B, T, N, D))
    total = B * T * N
    assert int((np.asarray(mask) == 0).sum()) == int(total * cfg.mask_ratio)


def test_gptst_pretrain_output_contract():
    cfg = small_gcfg()
    model = GPTST(cfg)
    B = 3
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, 12, cfg.num_nodes, cfg.input_base_dim + 2))
    params = model.init(rng, x, jax.random.PRNGKey(1), jnp.asarray(1, jnp.int32))
    flow_out, dec, inv_mask, prob, hs_cat = model.apply(
        params, x, jax.random.PRNGKey(2), jnp.asarray(5, jnp.int32))
    assert flow_out.shape == (B, 12, cfg.num_nodes, cfg.input_base_dim)
    assert dec.shape == (B, 12, cfg.num_nodes, cfg.hidden_dim)
    assert inv_mask.shape == (B, 12, cfg.num_nodes, cfg.input_base_dim)
    # inv_mask: 1 on masked-out points
    assert set(np.unique(np.asarray(inv_mask))) <= {0.0, 1.0}
    assert prob.shape == (B, 12, cfg.num_nodes, cfg.HS)
    np.testing.assert_allclose(np.asarray(prob).sum(-1), 1.0, rtol=1e-4)
    assert hs_cat.shape == (B, 12, cfg.num_nodes, cfg.HS)
    np.testing.assert_allclose(np.asarray(hs_cat).sum(-1), 1.0, rtol=1e-4)

    # encoder-only path
    emb = model.apply(params, x)
    assert emb.shape == (B, 12, cfg.num_nodes, cfg.hidden_dim)


def test_pretrain_two_epochs_crossing_curriculum(tmp_path):
    cfg = default_config(
        "PEMS08", mode="pretrain", model="STGCN",
        num_nodes=12, hidden_dim=16, embed_dim=8, embed_dim_spa=4, HS=4,
        HT=6, HT_Tem=4, batch_size=8, epochs=3, change_epoch=1,
        lr_decay=False, early_stop=False, log_step=1000, up_epoch=())
    ds = build_dataset(cfg, num_steps=300, seed=0)
    for attr in ("x_train", "y_train", "x_val", "y_val", "x_test", "y_test"):
        setattr(ds, attr, getattr(ds, attr)[:, :, :12])
    init_fn, fwd = build_model(cfg, scaler_zeros=ds.scaler_zeros)
    params = init_fn(jax.random.PRNGKey(0))
    tr = Trainer(forward=fwd, params=params, cfg=cfg, dataset=ds)
    res = tr.train()
    hist = res["history"]
    assert len(hist) == 3
    # flow loss should improve from epoch 1 to epoch 3 even as the
    # adaptive branch kicks in at epoch 2
    assert hist[-1] < hist[0], hist
    assert np.isfinite(res["report"]["average"][0])
