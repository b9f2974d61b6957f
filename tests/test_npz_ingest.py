"""Real-`.npz` ingest branch (VERDICT r3 weak #6): the one code path
that runs when the actual datasets arrive must be covered BEFORE they
do. Fixtures follow the reference archive layouts exactly
(`lib/load_dataset.py:44-89`):

  PEMS08   data: (T, 170, 3)  -> keep channel 0 (flow)
  METR_LA  data: (T, 207)     -> expand to (T, N, 1) (speed only)
  NYC_BIKE data: (T, 250, 2)  -> keep both channels (pick/drop)
  NYC_TAXI data: (T, 266, 2)  -> keep both channels
"""

import numpy as np
import pytest

from gptst_tpu.config import default_config
from gptst_tpu.data import build_dataset
from gptst_tpu.data.pipeline import load_raw_series

_FIXTURES = {
    # dataset -> (stored shape, expected loaded shape)
    "PEMS08": ((200, 24, 3), (200, 24, 1)),
    "METR_LA": ((200, 24), (200, 24, 1)),
    "NYC_BIKE": ((200, 24, 2), (200, 24, 2)),
    "NYC_TAXI": ((200, 24, 2), (200, 24, 2)),
}
_NPZ = {
    "PEMS08": "PEMS08/PEMS08.npz",
    "METR_LA": "METR_LA/metr_la.npz",
    "NYC_BIKE": "NYC_BIKE/NYC_BIKE.npz",
    "NYC_TAXI": "NYC_TAXI/NYC_TAXI.npz",
}


def _write_fixture(root, dataset, seed=0):
    shape, _ = _FIXTURES[dataset]
    rng = np.random.default_rng(seed)
    data = rng.uniform(10.0, 300.0, size=shape).astype(np.float32)
    p = root / _NPZ[dataset]
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(p, data=data)
    return data


@pytest.mark.parametrize("dataset", list(_FIXTURES))
def test_load_raw_series_reference_layout(tmp_path, dataset):
    data = _write_fixture(tmp_path, dataset)
    got = load_raw_series(dataset, data_root=str(tmp_path))
    assert got.shape == _FIXTURES[dataset][1]
    assert got.dtype == np.float32
    if dataset == "PEMS08":
        np.testing.assert_allclose(got[..., 0], data[..., 0])
    elif dataset == "METR_LA":
        np.testing.assert_allclose(got[..., 0], data)
    else:
        np.testing.assert_allclose(got, data)


def test_missing_file_falls_back_to_synthetic(tmp_path):
    got = load_raw_series("PEMS08", data_root=str(tmp_path),
                          num_steps=300)
    assert got.shape == (300, 170, 1)  # spec shape, synthetic


@pytest.mark.parametrize("dataset,mode",
                         [("PEMS08", "ori"), ("NYC_BIKE", "ori"),
                          ("PEMS08", "pretrain")])
def test_full_pipeline_from_npz(tmp_path, dataset, mode):
    """build_dataset over a real-format archive: window shapes, the
    train-only scaler fit, and the calendar channels all follow
    `lib/dataloader.py:101-159` semantics."""
    data = _write_fixture(tmp_path, dataset, seed=3)
    cfg = default_config(dataset, mode=mode, model="STGCN", num_nodes=24)
    ds = build_dataset(cfg, data_root=str(tmp_path))

    b = cfg.input_base_dim
    t, n = 200, 24
    lag, hor = cfg.lag, cfg.horizon
    n_test = int(t * cfg.test_ratio)
    n_val = int(t * (cfg.val_ratio + cfg.test_ratio)) - n_test
    n_train = t - n_val - n_test
    assert ds.x_train.shape == (n_train - lag - hor + 1, lag, n, b + 2)
    assert ds.y_train.shape == (n_train - lag - hor + 1, hor, n, b + 2)
    assert ds.x_test.shape[0] == n_test - lag - hor + 1

    # scaler fit on the train split of the REAL data (not synthetic)
    base = data[..., :1] if dataset == "PEMS08" else data
    train_raw = base[:n_train]
    s = ds.scaler_data
    np.testing.assert_allclose(s.mean, train_raw.mean(), rtol=1e-5)
    np.testing.assert_allclose(s.std, train_raw.std(), rtol=1e-5)

    # flow channels are std-transformed; undoing the transform must
    # recover the raw windowed values
    x0 = ds.x_train[0, :, :, :b]
    recon = s.inverse_transform(x0)
    np.testing.assert_allclose(recon, train_raw[:lag], rtol=1e-4,
                               atol=1e-3)
