"""Config fidelity vs every shipped reference conf file.

Round-trips each `conf/<MODEL>/<DATASET>.conf` [train] section and the
shared `params_predictors.conf` / `GPTST_pretrain/*.conf` blocks, and
asserts our effective merged namespace matches the reference's merge
rule (predictor wins for overlapping names in non-pretrain modes,
`model/Run.py:37-43`).
"""

import configparser
import os

import pytest

from gptst_tpu.config.config import (
    _DOWNSTREAM_TRAIN_DEFAULTS, default_config, from_ini,
    predictor_train_overrides,
)

CONF_ROOT = "/root/reference/conf"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CONF_ROOT), reason="reference confs not mounted")

# reference conf dir name -> our model registry name
_DIR_TO_MODEL = {
    "ASTGCN": "ASTGCN", "CCRNN_demand": "CCRNN",
    "DMVSTNET_demand": "DMVSTNET", "GWN": "GWN", "MSDR": "MSDR",
    "MTGNN": "MTGNN", "ST-WA": "ST_WA", "STFGNN": "STFGNN",
    "STGCN": "STGCN", "STGODE": "STGODE", "STMGCN_demand": "STMGCN",
    "STSGCN": "STSGCN", "TGCN": "TGCN",
}


def _train_section(path):
    cp = configparser.ConfigParser()
    cp.read(path)
    return cp["train"]


def _all_predictor_confs():
    out = []
    for d in sorted(os.listdir(CONF_ROOT)):
        if d == "GPTST_pretrain" or d not in _DIR_TO_MODEL:
            continue
        for f in sorted(os.listdir(os.path.join(CONF_ROOT, d))):
            if f.endswith(".conf"):
                out.append((d, f[: -len(".conf")]))
    return out


@pytest.mark.parametrize("conf_dir,dataset", _all_predictor_confs())
def test_predictor_train_overrides_match_conf(conf_dir, dataset):
    t = _train_section(os.path.join(CONF_ROOT, conf_dir, dataset + ".conf"))
    ours = predictor_train_overrides(_DIR_TO_MODEL[conf_dir], dataset)
    assert ours["seed"] == int(t["seed"])
    assert ours["seed_mode"] == (t["seed_mode"] == "True")
    assert ours["xavier"] == (t["xavier"] == "True")
    assert ours["loss_func"] == t["loss_func"]


def test_downstream_train_defaults_match_params_predictors():
    t = _train_section(
        os.path.join(CONF_ROOT, "GPTST_pretrain", "params_predictors.conf"))
    d = _DOWNSTREAM_TRAIN_DEFAULTS
    assert d["batch_size"] == int(t["batch_size"])
    assert d["epochs"] == int(t["epochs"])
    assert d["lr_init"] == float(t["lr_init"])
    assert d["lr_decay"] == (t["lr_decay"] == "True")
    assert d["lr_decay_rate"] == float(t["lr_decay_rate"])
    assert d["lr_decay_step"] == tuple(
        int(s) for s in t["lr_decay_step"].split(","))
    assert d["early_stop_patience"] == int(t["early_stop_patience"])
    assert d["change_epoch"] == int(t["change_epoch"])
    assert d["debug"] == (t["debug"] == "True")
    assert d["max_grad_norm"] == float(t["max_grad_norm"])


@pytest.mark.parametrize("dataset",
                         ["PEMS08", "METR_LA", "NYC_BIKE", "NYC_TAXI"])
def test_effective_eval_config_matches_reference_merge(dataset):
    """default_config in eval mode == framework conf merged with the
    predictor's [train] (predictor wins) and the shared downstream
    block for keys the predictor conf does not carry."""
    for model, conf_dir in (("GWN", "GWN"), ("ST_WA", "ST-WA"),
                            ("STGODE", "STGODE")):
        path = os.path.join(CONF_ROOT, conf_dir, dataset + ".conf")
        if not os.path.exists(path):
            continue
        t = _train_section(path)
        cfg = default_config(dataset, mode="eval", model=model)
        assert cfg.seed == int(t["seed"])
        assert cfg.seed_mode == (t["seed_mode"] == "True")
        assert cfg.xavier == (t["xavier"] == "True")
        assert cfg.loss_func == t["loss_func"]
        # keys only in params_predictors.conf
        assert cfg.epochs == 100
        assert cfg.lr_decay_step == (25, 50, 75)
        assert cfg.early_stop_patience == 25
        assert cfg.change_epoch == 0
        assert cfg.debug is False


@pytest.mark.parametrize("dataset",
                         ["PEMS08", "METR_LA", "NYC_BIKE", "NYC_TAXI"])
def test_pretrain_config_matches_reference_conf(dataset):
    path = os.path.join(CONF_ROOT, "GPTST_pretrain", dataset + ".conf")
    got = from_ini(path, dataset, mode="pretrain")
    want = default_config(dataset, mode="pretrain")
    for key in ("seed", "batch_size", "epochs", "lr_init", "lr_decay",
                "lr_decay_rate", "lr_decay_step", "early_stop_patience",
                "change_epoch", "up_epoch", "max_grad_norm", "debug",
                "ada_type", "ada_mask_ratio", "mask_ratio", "num_nodes",
                "input_base_dim", "mae_thresh", "mape_thresh"):
        assert getattr(got, key) == getattr(want, key), key
