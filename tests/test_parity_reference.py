"""Golden parity against the PyTorch reference (SURVEY.md §4 item 1).

Runs the actual reference code (read-only mount, torch CPU) side by
side with our JAX implementation: metrics, scalers, calendar-feature
synthesis, windowing, graph artifact builders, and a full STGCN
forward with transplanted weights. The reference hardcodes 'cuda:0' in
a few modules; a `torch.Tensor.to` shim maps those to CPU.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/model")

if not hasattr(np, "mat"):  # reference uses np.mat, removed in numpy 2.0
    np.mat = np.asmatrix
    np.matrix.A1  # noqa: B018  (asmatrix still exists)

import jax
import jax.numpy as jnp

RTOL, ATOL = 1e-5, 1e-5


@pytest.fixture(autouse=True)
def _cpu_shim(monkeypatch):
    """Map the reference's hardcoded .to('cuda:0') calls to CPU."""
    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        if args and isinstance(args[0], (str, torch.device)) \
                and "cuda" in str(args[0]):
            return orig_to(self, "cpu")
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", to)


# --- metrics ---------------------------------------------------------------

def _rand(shape, seed):
    return np.random.default_rng(seed).uniform(0.5, 10.0, shape) \
        .astype(np.float32)


@pytest.mark.parametrize("thresh", [None, 0.0, 3.0])
def test_masked_metrics_parity(thresh):
    from lib import metrics as ref

    from gptst_tpu.eval.metrics import (
        masked_mae, masked_huber, masked_mape, masked_rmse,
    )

    pred = _rand((8, 12, 10, 1), 0)
    true = _rand((8, 12, 10, 1), 1)
    tp, tt = torch.tensor(pred), torch.tensor(true)
    np.testing.assert_allclose(
        float(masked_mae(jnp.asarray(pred), jnp.asarray(true), thresh)),
        float(ref.MAE_torch(tp, tt, thresh)[0]), rtol=RTOL)
    np.testing.assert_allclose(
        float(masked_rmse(jnp.asarray(pred), jnp.asarray(true), thresh)),
        float(ref.RMSE_torch(tp, tt, thresh)), rtol=RTOL)
    np.testing.assert_allclose(
        float(masked_mape(jnp.asarray(pred), jnp.asarray(true), thresh)),
        float(ref.MAPE_torch(tp, tt, thresh)), rtol=RTOL)
    np.testing.assert_allclose(
        float(masked_huber(jnp.asarray(pred), jnp.asarray(true), thresh)),
        float(ref.huber_loss(tp, tt, thresh)[0]), rtol=RTOL)


@pytest.mark.parametrize("thresh", [None, 3.0])
def test_auxiliary_metrics_parity(thresh):
    from lib import metrics as ref

    from gptst_tpu.eval.metrics import (
        masked_mare, masked_opnbi, masked_pnbi, masked_smape,
    )

    pred = _rand((8, 12, 10, 1), 10)
    true = _rand((8, 12, 10, 1), 11)
    tp, tt = torch.tensor(pred), torch.tensor(true)
    pairs = [
        (masked_pnbi, ref.PNBI_torch), (masked_opnbi, ref.oPNBI_torch),
        (masked_mare, ref.MARE_torch), (masked_smape, ref.SMAPE_torch),
    ]
    for ours, theirs in pairs:
        np.testing.assert_allclose(
            float(ours(jnp.asarray(pred), jnp.asarray(true), thresh)),
            float(theirs(tp, tt, thresh)), rtol=1e-5)


def test_corr_parity():
    from lib import metrics as ref

    from gptst_tpu.eval.metrics import corr

    pred = _rand((8, 12, 10, 1), 2)
    true = _rand((8, 12, 10, 1), 3)
    np.testing.assert_allclose(
        float(corr(jnp.asarray(pred), jnp.asarray(true))),
        float(ref.CORR_torch(torch.tensor(pred), torch.tensor(true))),
        rtol=1e-4)


# --- data pipeline ---------------------------------------------------------

def test_time_add_parity():
    from lib.load_dataset import time_add

    from gptst_tpu.data.timefeat import time_features

    data = _rand((500, 7), 4)
    for week_start, interval in [(5, 5), (2, 30)]:
        day_ref, week_ref, _ = time_add(data, week_start, interval=interval)
        day, week = time_features(500, week_start, interval)
        np.testing.assert_array_equal(day, day_ref[:, 0])
        np.testing.assert_array_equal(week, week_ref[:, 0])


def test_window_parity():
    from lib.add_window import Add_Window_Horizon

    from gptst_tpu.data.window import add_window_horizon

    data = _rand((100, 5, 3), 5)
    x_ref, y_ref = Add_Window_Horizon(data, window=12, horizon=12)
    x, y = add_window_horizon(data, 12, 12)
    np.testing.assert_allclose(x, x_ref, rtol=RTOL)
    np.testing.assert_allclose(y, y_ref, rtol=RTOL)


def test_scaler_parity():
    from lib.normalization import StandardScaler as RefScaler

    from gptst_tpu.data.scalers import fit_standard_scaler

    x = _rand((200, 10), 6)
    ref = RefScaler(x.mean(), x.std())
    ours = fit_standard_scaler(x)
    np.testing.assert_allclose(ours.transform(x), ref.transform(x),
                               rtol=RTOL)
    np.testing.assert_allclose(
        ours.inverse_transform(ours.transform(x)), x, rtol=1e-4, atol=1e-4)


# --- graph artifacts -------------------------------------------------------

def _graph(n=20, seed=7):
    from gptst_tpu.graph.artifacts import random_sensor_graph

    a = random_sensor_graph(n, avg_degree=5, seed=seed)
    return a + np.diag(np.zeros(n))


def test_stgcn_laplacian_cheb_parity():
    from STGCN.args import cheb_poly_approx, scaled_laplacian as ref_lap

    from gptst_tpu.graph.artifacts import cheb_poly_stack, scaled_laplacian

    a = _graph()
    lap_ref = np.asarray(ref_lap(a))
    lap = scaled_laplacian(a)
    np.testing.assert_allclose(lap, lap_ref, rtol=1e-4, atol=1e-5)
    lk_ref = np.asarray(cheb_poly_approx(lap_ref, 3, a.shape[0]))
    lk = cheb_poly_stack(lap, 3)
    np.testing.assert_allclose(lk, lk_ref.reshape(lk.shape), rtol=1e-4,
                               atol=1e-5)


def test_gwn_adj_normalization_parity():
    from GWN.GWN import asym_adj as ref_asym, sym_adj as ref_sym

    from gptst_tpu.graph.artifacts import asym_adj

    a = _graph()
    np.testing.assert_allclose(asym_adj(a), np.asarray(ref_asym(a)),
                               rtol=RTOL, atol=ATOL)
    # note: reference sym_adj does NOT add self loops for GWN
    d = a.sum(1) ** -0.5
    ours_plain = a * d[:, None] * d[None, :]
    np.testing.assert_allclose(ours_plain, np.asarray(ref_sym(a)),
                               rtol=1e-4, atol=1e-5)


def test_tgcn_laplacian_parity():
    from TGCN.TGCN import calculate_normalized_laplacian

    from gptst_tpu.graph.artifacts import sym_adj

    a = _graph()
    ref = np.asarray(calculate_normalized_laplacian(a).todense())
    np.testing.assert_allclose(sym_adj(a), ref, rtol=1e-4, atol=1e-5)


# --- STGCN end-to-end forward with transplanted weights --------------------

def test_stgcn_forward_parity():
    import argparse

    from STGCN.stgcn import STGCN as RefSTGCN

    from gptst_tpu.config import default_config
    from gptst_tpu.models.build import build_predictor

    n = 16
    a = _graph(n, seed=9)
    cfg = default_config("PEMS08", mode="ori", model="STGCN", num_nodes=n)
    init_fn, apply_fn = build_predictor(cfg, adj=a)
    params = init_fn(jax.random.PRNGKey(0))

    from STGCN.args import cheb_poly_approx, scaled_laplacian
    ns = argparse.Namespace(Ks=3, Kt=3, blocks1=[64, 32, 128],
                            drop_prob=0.0, outputl_ks=3, num_nodes=n)
    ns.G = torch.FloatTensor(
        np.asarray(cheb_poly_approx(scaled_laplacian(a), 3, n)))
    ref = RefSTGCN(ns, torch.device("cpu"), dim_in=1, dim_out=1)
    ref.eval()

    # transplant torch weights -> our param tree (shared helper)
    from parity_utils import transplant_stgcn

    p = jax.tree.map(np.asarray, params)["params"]
    transplant_stgcn(p, ref)

    x = _rand((4, 12, n, 1), 11)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(apply_fn({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
