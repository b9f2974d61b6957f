"""STFGNN — spatio-temporal fusion graph neural network.

TPU-native counterpart of `model/STFGNN/STFGNN.py` (343 LoC): the
STSGCN synchronous-conv idea with stride 4 over a 4N x 4N *fusion*
graph mixing the spatial adjacency and a DTW temporal-similarity graph
(`args.py:110-151`), plus a gated dual dilated-conv data path (kernel
(1,2), dilation 3: sigmoid * tanh) added to the window outputs
(`STFGNN.py:130-131,176-183`). Per-window GCN modules are
individually-parameterized GLU convs over the 4N graph, cropping rows
[N:2N] and max-pooling over sub-layers (`:5-102`). Defaults follow
`conf/STFGNN/*.conf` (3 layers of [64,64,64], strides 4,
first_layer_embedding 64, out_layer_dim 128, huber loss).

As in our STSGCN, windows are batched into (B, W, 4N, C) and per-window
weights into (W, C, F) stacks — one einsum per sub-layer. Position
embeddings are xavier-normal with gain 3e-4 (`STFGNN.py:155-161`).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

torch_linear = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


@dataclasses.dataclass(frozen=True)
class STFGNNConfig:
    num_nodes: int
    hidden_dims: tuple = ((64, 64, 64),) * 3
    first_layer_embedding_size: int = 64
    out_layer_dim: int = 128
    strides: int = 4
    temporal_emb: bool = True
    spatial_emb: bool = True


def construct_adj_fusion(a: np.ndarray, a_dtw: np.ndarray,
                         steps: int = 4) -> np.ndarray:
    """4N_1-mode fusion graph (`model/STFGNN/args.py:110-151`):
    diagonal blocks [DTW, A, A, DTW], adjacent-step self edges, DTW
    corner blocks, A-block couplings, self loops."""
    n = a.shape[0]
    adj = np.zeros((n * steps, n * steps), dtype=np.float32)
    for i in range(steps):
        blk = a if i in (1, 2) else a_dtw
        adj[i * n:(i + 1) * n, i * n:(i + 1) * n] = blk
    idx = np.arange(n)
    for k in range(steps - 1):
        adj[k * n + idx, (k + 1) * n + idx] = 1.0
        adj[(k + 1) * n + idx, k * n + idx] = 1.0
    adj[3 * n:4 * n, 0:n] = a_dtw
    adj[0:n, 3 * n:4 * n] = a_dtw
    coupling = adj[0:n, n:2 * n]
    adj[2 * n:3 * n, 0:n] = coupling
    adj[0:n, 2 * n:3 * n] = coupling
    adj[n:2 * n, 3 * n:4 * n] = coupling
    adj[3 * n:4 * n, n:2 * n] = coupling
    np.fill_diagonal(adj, 1.0)
    return adj


class FusionLayer(nn.Module):
    """One STSGCL with the gated dilated-conv data path."""

    cfg: STFGNNConfig
    filters: tuple[int, ...]
    timesteps: int

    @nn.compact
    def __call__(self, x, adj):  # x: (B, T, N, C); adj: (4N, 4N)
        c = self.cfg
        B, T, N, C = x.shape
        # xavier_normal with gain=3e-4 (`STFGNN.py:155-161`) ~ near-zero
        emb_init = nn.initializers.normal(stddev=3e-4)
        if c.temporal_emb:
            x = x + self.param("temporal_emb", emb_init, (1, T, 1, C))
        if c.spatial_emb:
            x = x + self.param("spatial_emb", emb_init, (1, 1, N, C))

        # gated dual dilated conv over time: kernel 2, dilation 3 -> T-3
        left = jax.nn.sigmoid(nn.Conv(
            self.filters[-1], kernel_size=(2, 1), kernel_dilation=(3, 1),
            padding="VALID", name="conv1")(x))
        right = jnp.tanh(nn.Conv(
            self.filters[-1], kernel_size=(2, 1), kernel_dilation=(3, 1),
            padding="VALID", name="conv2")(x))
        data_res = left * right                   # (B, T-3, N, F)

        s = c.strides
        w_cnt = T - s + 1
        wins = jnp.stack([x[:, i:i + s] for i in range(w_cnt)], axis=1)
        h = wins.reshape(B, w_cnt, s * N, C)
        crops = []
        feat = C
        for li, f in enumerate(self.filters):
            h = jnp.einsum("mn,bwnc->bwmc", adj, h)
            w = self.param(f"w{li}", torch_linear, (w_cnt, feat, 2 * f))
            b = self.param(f"b{li}", nn.initializers.zeros, (w_cnt, 1, 2 * f))
            z = jnp.einsum("bwnc,wcf->bwnf", h, w) + b
            lhs, rhs = jnp.split(z, 2, axis=-1)
            h = lhs * jax.nn.sigmoid(rhs)
            feat = f
            crops.append(h[:, :, N:2 * N])
        mid = jnp.max(jnp.stack(crops, axis=0), axis=0)  # (B, W, N, F)
        return mid + data_res


class STFGNN(nn.Module):
    """x: (B, T, N, dim_in) -> (B, horizon, N, dim_out)."""

    cfg: STFGNNConfig
    dim_in: int
    dim_out: int
    horizon: int
    lag: int

    @nn.compact
    def __call__(self, x, adj):
        c = self.cfg
        x = jax.nn.relu(nn.Dense(c.first_layer_embedding_size,
                                 name="first_fc")(x))
        t = self.lag
        for filters in c.hidden_dims:
            x = FusionLayer(c, tuple(filters), t)(x, adj)
            t -= c.strides - 1
        B, T, N, C = x.shape
        flat = jnp.swapaxes(x, 1, 2).reshape(B, N, T * C)
        outs = []
        for _ in range(self.horizon):
            h = nn.Dense(c.out_layer_dim)(flat)
            o = nn.Dense(self.dim_out)(h)
            outs.append(o[:, None])
        return jnp.concatenate(outs, axis=1)
