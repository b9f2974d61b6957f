"""STSGCN — spatio-temporal synchronous graph convolutional network.

TPU-native counterpart of `model/STSGCN/STSGCN.py` (334 LoC): a
3N x 3N localized synchronous adjacency (block-diagonal spatial copies
+ cross-step self edges + identity, `construct_adj` `:237-253`), GLU
graph-conv modules that crop the middle N rows and max-pool over their
3 sub-layers (`:29-82`), applied over sliding 3-step windows with
*individual* per-window weights (`:114-154`), and per-horizon output
heads (`:310-313`). Defaults follow `conf/STSGCN/*.conf` (4 layers of
filters [64,64,64], GLU, steps=3, first_layer_embedding_size=64,
loss mask_huber).

Re-design: the reference loops windows in Python with one module per
window; here all windows are batched into a (B, W, 3N, C) tensor and
the per-window weights into a (W, C, F) stack — one einsum per
sub-layer, MXU-shaped. Position embeddings are zero-initialized
learnables exactly as `:15-18` (their xavier init is commented out in
the reference).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) —
# load-bearing for stability under the unnormalized 3N adjacency
torch_linear = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


@dataclasses.dataclass(frozen=True)
class STSGCNConfig:
    num_nodes: int
    filter_list: tuple = ((64, 64, 64),) * 4
    feature_dim: int = 64
    activation: str = "GLU"
    temporal_emb: bool = True
    spatial_emb: bool = True
    steps: int = 3
    first_layer_embedding_size: int = 64


def construct_sync_adj(a: np.ndarray, steps: int = 3) -> np.ndarray:
    """Block-diagonal A copies + adjacent-step self edges + I
    (`STSGCN.py:237-253`)."""
    n = a.shape[0]
    adj = np.zeros((n * steps, n * steps), dtype=np.float32)
    for i in range(steps):
        adj[i * n:(i + 1) * n, i * n:(i + 1) * n] = a
    for k in range(steps - 1):
        idx = np.arange(n)
        adj[k * n + idx, (k + 1) * n + idx] = 1.0
        adj[(k + 1) * n + idx, k * n + idx] = 1.0
    np.fill_diagonal(adj, 1.0)
    return adj


class SyncLayer(nn.Module):
    """One STSGCL with individual per-window weights, vectorized."""

    cfg: STSGCNConfig
    filters: tuple[int, ...]
    timesteps: int

    @nn.compact
    def __call__(self, x, adj):  # x: (B, T, N, C); adj: (3N, 3N)
        c = self.cfg
        B, T, N, C = x.shape
        if c.temporal_emb:
            x = x + self.param("temporal_emb", nn.initializers.zeros,
                               (1, T, 1, C))
        if c.spatial_emb:
            x = x + self.param("spatial_emb", nn.initializers.zeros,
                               (1, 1, N, C))
        w_cnt = T - 2
        # (B, W, 3, N, C) -> (B, W, 3N, C)
        wins = jnp.stack([x[:, i:i + 3] for i in range(w_cnt)], axis=1)
        h = wins.reshape(B, w_cnt, 3 * N, C)

        crops = []
        feat = C
        for li, f in enumerate(self.filters):
            h = jnp.einsum("mn,bwnc->bwmc", adj, h)
            if c.activation == "GLU":
                w = self.param(f"w{li}", torch_linear, (w_cnt, feat, 2 * f))
                b = self.param(f"b{li}", nn.initializers.zeros,
                               (w_cnt, 1, 2 * f))
                z = jnp.einsum("bwnc,wcf->bwnf", h, w) + b
                lhs, rhs = jnp.split(z, 2, axis=-1)
                h = lhs * jax.nn.sigmoid(rhs)
            else:
                w = self.param(f"w{li}", torch_linear, (w_cnt, feat, f))
                b = self.param(f"b{li}", nn.initializers.zeros, (w_cnt, 1, f))
                h = jax.nn.relu(jnp.einsum("bwnc,wcf->bwnf", h, w) + b)
            feat = f
            crops.append(h[:, :, N:2 * N])       # middle time-step rows
        # max over the sub-layer outputs (`STSGCN.py:75-82`)
        return jnp.max(jnp.stack(crops, axis=0), axis=0)  # (B, W, N, F)


class STSGCN(nn.Module):
    """x: (B, T, N, dim_in) -> (B, horizon, N, dim_out)."""

    cfg: STSGCNConfig
    dim_in: int
    dim_out: int
    horizon: int
    lag: int

    @nn.compact
    def __call__(self, x, adj):
        c = self.cfg
        if x.shape[-1] > c.feature_dim:
            x = x[..., : c.feature_dim]
        if c.first_layer_embedding_size:
            x = jax.nn.relu(nn.Dense(c.first_layer_embedding_size)(x))
        t = self.lag
        for filters in c.filter_list:
            x = SyncLayer(c, tuple(filters), t)(x, adj)
            t -= 2
        # per-horizon heads (`STSGCN.py:310-313`): each sees all of
        # (T_rem * C) per node
        B, T, N, C = x.shape
        flat = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, N, T * C)
        outs = []
        for _ in range(self.horizon):
            h = nn.Dense(128)(flat)
            o = nn.Dense(self.dim_out)(h)
            outs.append(o[:, None])              # (B, 1, N, D)
        return jnp.concatenate(outs, axis=1)
