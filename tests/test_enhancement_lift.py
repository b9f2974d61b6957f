"""Gating test for the framework's reason to exist (VERDICT r3 #1):
pretraining must IMPROVE the downstream predictor — eval mode (frozen
GPT-ST encoder + Fusion + predictor, `model/Model.py:106-117`) beats
ori mode (predictor alone) on test MAE.

Runs the full pretrain -> ori -> eval protocol through the real CLI on
small synthetic data (the diurnal generator gives eval a structural
edge: the encoder sees calendar channels that `forward_ori` strips, so
the lift is robust even at smoke scale — measured ~20-27% here, +3.7%
at the full N=48/20-day scale recorded in BASELINE.md). The two-sided
reference comparison lives in `scripts/lift_experiment.py`.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.lift_experiment import build_sandbox, run_jax_side

# build_sandbox patches the reference's own conf tree; without the
# reference checkout the protocol can't follow its shipped values
if not os.path.isdir("/root/reference/conf"):
    pytest.skip("reference checkout not present", allow_module_level=True)


def test_eval_beats_ori(tmp_path):
    root = str(tmp_path)
    build_sandbox(root, n=12, steps=600, data_seed=0)
    res = run_jax_side(root, n=12, pre_epochs=2, epochs=2)
    assert res["eval_mae"] < res["ori_mae"], res
    # the lift at this scale is large (~25%); gate at a conservative 5%
    assert res["lift_pct"] > 5.0, res
    # leave the numbers in the test log for the record
    print(json.dumps(res))
