"""Native C++ banded DTW vs the numpy reference implementation."""

import numpy as np
import pytest

from gptst_tpu.graph.dtw import banded_dtw_all_pairs
from gptst_tpu.native import native_banded_dtw_pairs


def test_native_matches_numpy():
    rng = np.random.default_rng(0)
    days, t, n = 3, 40, 8
    x = rng.normal(size=(days, t, n)).astype(np.float32)
    iu, ju = np.triu_indices(n, k=1)
    got = native_banded_dtw_pairs(x, iu.astype(np.int32),
                                  ju.astype(np.int32), radius=6)
    if got is None:
        pytest.skip("no C++ toolchain")
    # numpy reference on the same pair cost tensors
    a = x[:, :, iu]
    b = x[:, :, ju]
    local = np.abs(a[:, None, :, :] - b[:, :, None, :]).sum(axis=0)
    local = np.moveaxis(local, 2, 0)
    want = banded_dtw_all_pairs(local.astype(np.float64), radius=6)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_dtw_distance_matrix_uses_native():
    from gptst_tpu.graph.dtw import dtw_distance_matrix

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 30, 6))
    d = dtw_distance_matrix(x, radius=5)
    assert d.shape == (6, 6)
    np.testing.assert_allclose(d, d.T)
    assert (np.diag(d) == 0).all()
