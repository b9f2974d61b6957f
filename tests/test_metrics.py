"""Masked-metric tests vs closed-form cases and torch (CPU) reference
semantics — torch is available in the image, so we can check the exact
masked_select behavior without any reference code."""

import numpy as np
import pytest
import torch

from gptst_tpu.eval import (
    all_metrics, corr, masked_huber, masked_mae, masked_mape, masked_rmse,
)


def torch_masked_mae(pred, true, thresh):
    p, t = torch.tensor(pred), torch.tensor(true)
    if thresh is not None:
        m = torch.gt(t, thresh)
        p, t = torch.masked_select(p, m), torch.masked_select(t, m)
    return torch.mean(torch.abs(t - p)).item()


def torch_masked_mape(pred, true, thresh):
    p, t = torch.tensor(pred), torch.tensor(true)
    if thresh is not None:
        m = torch.gt(t, thresh)
        p, t = torch.masked_select(p, m), torch.masked_select(t, m)
    return torch.mean(torch.abs((t - p) / t)).item()


@pytest.mark.parametrize("thresh", [None, 0.0, 5.0])
def test_masked_mae_matches_torch(thresh):
    rng = np.random.default_rng(0)
    true = rng.uniform(-1, 20, size=(8, 12, 10, 1)).astype(np.float32)
    pred = true + rng.normal(0, 2, size=true.shape).astype(np.float32)
    ours = float(masked_mae(pred, true, thresh))
    ref = torch_masked_mae(pred, true, thresh)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.mark.parametrize("thresh", [0.0, 0.001])
def test_masked_mape_matches_torch(thresh):
    rng = np.random.default_rng(1)
    true = rng.uniform(0, 30, size=(4, 12, 9, 2)).astype(np.float32)
    pred = true * rng.uniform(0.8, 1.2, size=true.shape).astype(np.float32)
    ours = float(masked_mape(pred, true, thresh))
    ref = torch_masked_mape(pred, true, thresh)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_rmse_closed_form():
    pred = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    true = np.array([2.0, 1.0, 4.0, 5.0], dtype=np.float32)
    np.testing.assert_allclose(float(masked_rmse(pred[None, :], true[None, :])), 1.0)


def test_huber_small_and_large_branches():
    pred = np.array([0.0, 0.0], dtype=np.float32)
    true = np.array([0.5, 3.0], dtype=np.float32)
    # 0.5: 0.5*0.25 = 0.125 ; 3.0: 3 - 0.5 = 2.5 → mean = 1.3125
    np.testing.assert_allclose(float(masked_huber(pred, true)), 1.3125, rtol=1e-6)


def test_corr_matches_torch_reference_semantics():
    rng = np.random.default_rng(2)
    true = rng.normal(10, 3, size=(6, 12, 7, 1)).astype(np.float32)
    pred = 0.7 * true + rng.normal(0, 1, size=true.shape).astype(np.float32)

    # torch re-derivation of CORR_torch (lib/metrics.py:54-76)
    p = torch.tensor(pred).transpose(2, 3)
    t = torch.tensor(true).transpose(2, 3)
    dims = (0, 1, 2)
    pm, tm = p.mean(dim=dims), t.mean(dim=dims)
    ps, ts = p.std(dim=dims), t.std(dim=dims)
    c = ((p - pm) * (t - tm)).mean(dim=dims) / (ps * ts)
    ref = c[(ts != 0)].mean().item()

    np.testing.assert_allclose(float(corr(pred, true)), ref, rtol=1e-4)


def test_all_metrics_returns_five():
    x = np.random.rand(4, 12, 5, 1).astype(np.float32) * 10
    y = x + 0.5
    out = all_metrics(y, x, None, 0.0)
    assert len(out) == 5
    assert all(np.isfinite(float(v)) for v in out)
