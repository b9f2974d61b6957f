"""STGODE — graph neural ODE predictor.

TPU-native counterpart of `model/STGODE/STGODE.py` + `odegcn.py`
(253 LoC): parallel branches over a spatial gaussian-kernel graph and a
DTW semantic graph (n_layers=3 each), every branch a sandwich
TCN -> graph-ODE -> TCN -> BatchNorm-over-nodes, elementwise max merge,
then a two-layer MLP head over the flattened (T, C) per node
(`STGODE.py:133-178`). The ODE
  dx/dt = sigmoid(alpha)/2 * A x - 3x + x W + W2 x + x0
with spectral-norm-clamped W = (w ⊙ clamp(d,0,1)) w^T (`odegcn.py:33-48`)
is integrated by torchdiffeq's fixed-grid Euler on t=[0,6] — which is a
SINGLE Euler step of size 6 (the grid is the evaluation points); we
reproduce exactly that. x0 is gradient-stopped (`odegcn.py:57`,
`.clone().detach()`). Defaults follow `conf/STGODE/*.conf`
(out_channels [64,32,64], huber loss, xavier init).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

xavier = nn.initializers.xavier_uniform()


@dataclasses.dataclass(frozen=True)
class STGODEConfig:
    num_nodes: int
    out_channels: tuple[int, int, int] = (64, 32, 64)
    n_layers: int = 3
    ode_time: float = 6.0
    dropout: float = 0.0   # reference sets TCN dropout 0.2 in train only


def stgode_normalized_adj(a: np.ndarray) -> np.ndarray:
    """A_reg = 0.4 * (I + D^-1/2 A D^-1/2) (`args.py:133-144`)."""
    d = np.maximum(a.sum(axis=1), 1e-4)
    diag = 1.0 / np.sqrt(d)
    a_wave = diag[:, None] * a * diag[None, :]
    return (0.4 * (np.eye(a.shape[0]) + a_wave)).astype(np.float32)


class TemporalConvNet(nn.Module):
    """Causal dilated TCN, kernel 2, dilations 1/2/4, residual 1x1
    (`STGODE.py:22-66`). Layout here: (B, T, N, C).

    The reference's residual line (`STGODE.py:64`) reads
    `relu(network(y) + downsample(y) if downsample else y)`, which by
    Python precedence is `relu(network+down) if down else relu(y)` —
    when in/out channels match there is NO downsample and the whole TCN
    output is DISCARDED (the block degenerates to relu). We reproduce
    exactly that so trained behavior matches; the conv params are still
    created (XLA dead-code-eliminates them)."""

    channels: tuple[int, ...]

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        y = x
        for i, c_out in enumerate(self.channels):
            dilation = 2 ** i
            pad = dilation  # (kernel-1) * dilation, chomped to causal
            y = nn.Conv(c_out, kernel_size=(2, 1),
                        kernel_dilation=(dilation, 1),
                        padding=((pad, 0), (0, 0)),
                        kernel_init=nn.initializers.normal(0.01))(y)
            y = jax.nn.relu(y)
        if x.shape[-1] != self.channels[-1]:
            x = nn.Conv(self.channels[-1], kernel_size=(1, 1),
                        kernel_init=nn.initializers.normal(0.01))(x)
            return jax.nn.relu(y + x)
        return jax.nn.relu(x)


class ODEG(nn.Module):
    """One Euler step of the graph ODE (`odegcn.py:20-75`)."""

    feature_dim: int
    temporal_dim: int

    @nn.compact
    def __call__(self, x, adj):  # x: (B, T, N, C)
        n = adj.shape[0]
        alpha = self.param("alpha", nn.initializers.constant(0.8), (n,))
        w = self.param("w", lambda k: jnp.eye(self.feature_dim))
        d = self.param("d", nn.initializers.ones, (self.feature_dim,))
        w2 = self.param("w2", lambda k: jnp.eye(self.temporal_dim))
        d2 = self.param("d2", nn.initializers.ones, (self.temporal_dim,))

        x0 = jax.lax.stop_gradient(x)
        a = jax.nn.sigmoid(alpha)[None, None, :, None]
        xa = jnp.einsum("nm,btmc->btnc", adj, x)
        wc = (w * jnp.clip(d, 0.0, 1.0)) @ w.T
        xw = x @ wc
        w2c = (w2 * jnp.clip(d2, 0.0, 1.0)) @ w2.T
        xw2 = jnp.einsum("btnc,ts->bsnc", x, w2c)
        f = a / 2 * xa - x + xw - x + xw2 - x + x0
        return jax.nn.relu(x + 6.0 * f)


class NodeBatchNorm(nn.Module):
    """torch BatchNorm2d over the NODE axis (`STGODE.py:114` operates on
    (B, N, T, F) with N as channels); batch-stats semantics."""

    num_nodes: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (B, T, N, C)
        scale = self.param("scale", nn.initializers.ones, (self.num_nodes,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_nodes,))
        mean = x.mean(axis=(0, 1, 3), keepdims=True)
        var = x.var(axis=(0, 1, 3), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale[None, None, :, None] + bias[None, None, :, None]


class STGODEBlock(nn.Module):
    cfg: STGODEConfig
    lag: int

    @nn.compact
    def __call__(self, x, adj):
        c = self.cfg
        h = TemporalConvNet(c.out_channels)(x)
        h = ODEG(c.out_channels[-1], self.lag)(h, adj)
        h = TemporalConvNet(c.out_channels)(jax.nn.relu(h))
        return NodeBatchNorm(c.num_nodes)(h)


class STGODE(nn.Module):
    """x: (B, T, N, dim_in) -> (B, horizon, N, dim_out)."""

    cfg: STGODEConfig
    dim_in: int
    dim_out: int
    horizon: int
    lag: int

    @nn.compact
    def __call__(self, x, adj_sp, adj_se):
        c = self.cfg
        B, T, N, _ = x.shape
        outs = []
        for adj, tag in ((adj_sp, "sp"), (adj_se, "se")):
            for i in range(c.n_layers):
                h = STGODEBlock(c, self.lag, name=f"{tag}_{i}_0")(x, adj)
                h = STGODEBlock(c, self.lag, name=f"{tag}_{i}_1")(h, adj)
                outs.append(h)
        h = jnp.max(jnp.stack(outs), axis=0)             # (B,T,N,C)
        flat = jnp.swapaxes(h, 1, 2).reshape(B, N, T * c.out_channels[2])
        h = jax.nn.relu(nn.Dense(
            self.horizon * c.out_channels[1], kernel_init=xavier)(flat))
        out = nn.Dense(self.horizon * self.dim_out, kernel_init=xavier)(h)
        out = out.reshape(B, N, self.horizon, self.dim_out)
        return jnp.swapaxes(out, 1, 2)
