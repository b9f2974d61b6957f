"""Masked evaluation metrics.

JAX re-derivation of `lib/metrics.py`. The reference masks with
`torch.masked_select(x, true > thresh)` and reduces over the ragged
result; under XLA we need static shapes, so every metric is expressed
as where/sum/count — numerically identical for mean-type reductions.

Threshold semantics (`lib/metrics.py:11-18`): a threshold of ``None``
disables masking entirely; a numeric threshold keeps entries with
``true > thresh``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _mask(true: jnp.ndarray, thresh: float | None) -> jnp.ndarray:
    if thresh is None:
        return jnp.ones_like(true, dtype=jnp.float32)
    return (true > thresh).astype(jnp.float32)


def _masked_mean(vals: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(m.sum(), 1.0)
    return (vals * m).sum() / denom


def masked_mae(pred, true, thresh: float | None = None):
    m = _mask(true, thresh)
    return _masked_mean(jnp.abs(pred - true), m)


def masked_mse(pred, true, thresh: float | None = None):
    m = _mask(true, thresh)
    return _masked_mean((pred - true) ** 2, m)


def masked_rmse(pred, true, thresh: float | None = None):
    return jnp.sqrt(masked_mse(pred, true, thresh))


def masked_mape(pred, true, thresh: float | None = None):
    m = _mask(true, thresh)
    safe_true = jnp.where(m > 0, true, 1.0)
    return _masked_mean(jnp.abs((true - pred) / safe_true), m)


def masked_pnbi(pred, true, thresh: float | None = None):
    """Positive-negative bias indicator (`lib/metrics.py:88-94`)."""
    m = _mask(true, thresh)
    return _masked_mean((pred - true > 0).astype(jnp.float32), m)


def masked_opnbi(pred, true, thresh: float | None = None):
    """Overall PNBI: mean of (true + pred) / (2 true)
    (`lib/metrics.py:96-102`)."""
    m = _mask(true, thresh)
    safe_true = jnp.where(m > 0, true, 1.0)
    return _masked_mean((true + pred) / (2.0 * safe_true), m)


def masked_mare(pred, true, thresh: float | None = None):
    """Mean absolute relative error: sum|err| / sum(true)
    (`lib/metrics.py:104-109`)."""
    m = _mask(true, thresh)
    return (jnp.abs(true - pred) * m).sum() / jnp.maximum(
        (true * m).sum(), 1e-12)


def masked_smape(pred, true, thresh: float | None = None):
    """Symmetric MAPE (`lib/metrics.py:111-117`)."""
    m = _mask(true, thresh)
    denom = jnp.abs(true) + jnp.abs(pred)
    safe = jnp.where(denom > 0, denom, 1.0)
    return _masked_mean(jnp.abs(true - pred) / safe, m)


def masked_rrse(pred, true, thresh: float | None = None):
    """Root relative squared error (`lib/metrics.py:47-52`).

    Note the reference computes `true.mean()` over the *masked* values.
    """
    m = _mask(true, thresh)
    denom = jnp.maximum(m.sum(), 1.0)
    t_mean = (true * m).sum() / denom
    num = jnp.sqrt(((pred - true) ** 2 * m).sum())
    den = jnp.sqrt(((true - t_mean) ** 2 * m).sum())
    return num / den


def masked_huber(pred, true, thresh: float | None = None, delta: float = 1.0):
    m = _mask(true, thresh)
    r = jnp.abs(pred - true)
    small = 0.5 * r ** 2
    large = delta * r - 0.5 * delta ** 2
    return _masked_mean(jnp.where(r <= delta, small, large), m)


def corr(pred, true):
    """Per-node Pearson correlation averaged over nodes with nonzero std.

    Mirrors `CORR_torch` (`lib/metrics.py:54-76`): inputs (B,T,N,D) are
    treated as N independent series over the (B,T,D) axes; 2D/3D inputs
    are promoted the same way the reference does. Uses the population
    (biased) std? — no: torch.std defaults to Bessel correction, so we
    use ddof=1 equivalents.
    """
    if pred.ndim == 2:          # (B, N)
        pred = pred[:, None, :, None]
        true = true[:, None, :, None]
    elif pred.ndim == 3:        # (B, N, D) -> (B, 1, D, N)
        pred = jnp.swapaxes(pred, 1, 2)[:, None]
        true = jnp.swapaxes(true, 1, 2)[:, None]
    elif pred.ndim == 4:        # (B, T, N, D) -> (B, T, D, N)
        pred = jnp.swapaxes(pred, 2, 3)
        true = jnp.swapaxes(true, 2, 3)
    else:
        raise ValueError(f"corr: unsupported rank {pred.ndim}")
    dims = (0, 1, 2)
    n = pred.shape[0] * pred.shape[1] * pred.shape[2]
    p_mean = pred.mean(axis=dims)
    t_mean = true.mean(axis=dims)
    # torch.std uses ddof=1
    p_std = jnp.sqrt(((pred - p_mean) ** 2).sum(axis=dims) / (n - 1))
    t_std = jnp.sqrt(((true - t_mean) ** 2).sum(axis=dims) / (n - 1))
    c = ((pred - p_mean) * (true - t_mean)).mean(axis=dims) / (p_std * t_std)
    valid = (t_std != 0).astype(jnp.float32)
    return (jnp.where(valid > 0, c, 0.0).sum()) / jnp.maximum(valid.sum(), 1.0)


def all_metrics(pred, true, mae_thresh: float | None, mape_thresh: float | None):
    """(mae, rmse, mape, rrse, corr) — `lib/metrics.py:206-228`."""
    return (
        masked_mae(pred, true, mae_thresh),
        masked_rmse(pred, true, mae_thresh),
        masked_mape(pred, true, mape_thresh),
        masked_rrse(pred, true, mae_thresh),
        corr(pred, true),
    )
