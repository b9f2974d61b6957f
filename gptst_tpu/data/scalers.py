"""Normalization scalers.

Functional counterparts of `lib/normalization.py`. Each scaler is a
frozen dataclass whose transform/inverse_transform work uniformly on
numpy and jax arrays (pure arithmetic, no device state). Statistics are
always fit on the train split only (`lib/dataloader.py:119`).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class NScaler:
    def transform(self, x):
        return x

    def inverse_transform(self, x):
        return x


@dataclasses.dataclass(frozen=True)
class StandardScaler:
    mean: float
    std: float

    def transform(self, x):
        return (x - self.mean) / self.std

    def inverse_transform(self, x):
        return x * self.std + self.mean


@dataclasses.dataclass(frozen=True)
class MinMax01Scaler:
    min: float
    max: float

    def transform(self, x):
        return (x - self.min) / (self.max - self.min)

    def inverse_transform(self, x):
        return x * (self.max - self.min) + self.min


@dataclasses.dataclass(frozen=True)
class MinMax11Scaler:
    min: float
    max: float

    def transform(self, x):
        return ((x - self.min) / (self.max - self.min)) * 2.0 - 1.0

    def inverse_transform(self, x):
        return ((x + 1.0) / 2.0) * (self.max - self.min) + self.min


def fit_standard_scaler(x: np.ndarray) -> StandardScaler:
    std = float(x.std())
    # guard constant channels (e.g. the weekday channel of a series
    # shorter than a week) — the reference would divide by zero here
    return StandardScaler(mean=float(x.mean()), std=std if std > 0 else 1.0)


def fit_channel_scalers(
    train_data: np.ndarray, input_base_dim: int
) -> tuple[StandardScaler, StandardScaler, StandardScaler]:
    """Fit separate std-scalers for (base, day, week) channel groups.

    Matches `lib/dataloader.py:36-54`: the base channels share one
    scalar mean/std; day and week channels each get their own.
    """
    base = train_data[..., :input_base_dim]
    day = train_data[..., input_base_dim:input_base_dim + 1]
    week = train_data[..., input_base_dim + 1:input_base_dim + 2]
    return (
        fit_standard_scaler(base),
        fit_standard_scaler(day),
        fit_standard_scaler(week),
    )
