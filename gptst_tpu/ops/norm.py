"""Normalization layers.

`BatchStatsNorm` mirrors torch BatchNorm's *training-mode* math
(normalize by the current batch's statistics, learnable affine). The
reference predictors (GWN `GWN.py:197`, MTGNN, STGODE) train with
exactly these dynamics; we apply the same statistics at eval time
instead of running averages, keeping every forward a pure function of
(params, batch) — no mutable state threaded through the trainer. With
the reference's batch size (64) the batch statistics are tight
estimators of the running ones; the deviation is documented here.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchStatsNorm(nn.Module):
    """Normalize over all axes but the last (channel), learnable affine."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        axes = tuple(range(x.ndim - 1))
        mean = x.mean(axis=axes, keepdims=True)
        var = x.var(axis=axes, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
