"""DMVST-Net — simplified multi-view demand predictor.

TPU-native counterpart of `model/DMVSTNET_demand/DMVSTNET.py` (63 LoC):
three views fused per timestep — a local GNN spatial view (dense
row-normalized adjacency einsum + residual, `:4-14, 45-48`), an LSTM
temporal view over [spatial ‖ temporal] projections shared across
nodes (`:52-55`), and a semantic view from a node-embedding weight
pool (`:57-58`) — concatenated into a linear head. Defaults follow
`conf/DMVSTNET_demand/*.conf` (hidden_dim=64, topo_embedded_dim=16).

The reference flattens [spatial ‖ temporal] (2*hidden wide) into an
LSTM of width hidden*dim_out, which only type-checks for the NYC
2-channel datasets; here the LSTM width is 2*hidden explicitly
(identical for dim_out=2, well-defined otherwise).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from gptst_tpu.ops.param_pool import node_param_linear


@dataclasses.dataclass(frozen=True)
class DMVSTNetConfig:
    num_nodes: int
    hidden_dim: int = 64
    topo_embedded_dim: int = 16


class DMVSTNet(nn.Module):
    """x: (B, T, N, dim_in) -> (B, T, N, dim_out)."""

    cfg: DMVSTNetConfig
    dim_in: int
    dim_out: int

    @nn.compact
    def __call__(self, x, adj):  # adj: (N, N) row-normalized
        c = self.cfg
        B, T, N, _ = x.shape
        h = c.hidden_dim
        x_spa = nn.Dense(h, name="lin_in_spa")(x)
        x_tem = nn.Dense(h, name="lin_in_tem")(x)
        x_sen = nn.Dense(h, name="lin_in_sen")(x)

        # local GNN view + residual (`DMVSTNET.py:12-13, 46-47`)
        g = nn.relu(nn.Dense(h, name="local_gnn")(
            jnp.einsum("vn,btnd->btvd", adj, x_spa)))
        spatial_out = nn.Dense(h, name="lin_spa")(g) + x_spa

        # temporal view: LSTM over time, shared across nodes
        lstm_width = 2 * h
        seq = jnp.concatenate([spatial_out, x_tem], axis=-1)  # (B,T,N,2h)
        seq = jnp.transpose(seq, (0, 2, 1, 3)).reshape(B * N, T, lstm_width)
        out_lstm = nn.RNN(nn.OptimizedLSTMCell(lstm_width))(seq)  # (BN,T,2h)
        hid = out_lstm[:, -1:, :]                              # final hidden
        temporal = (out_lstm + hid).reshape(B, N, T, lstm_width)
        temporal = jnp.transpose(temporal, (0, 2, 1, 3))       # (B,T,N,2h)

        # semantic view: node-embedding weight pool (`:57-58`)
        node_emb = self.param("node_embeddings",
                              nn.initializers.xavier_uniform(),
                              (c.num_nodes, c.topo_embedded_dim))
        w_pool = self.param("w", nn.initializers.xavier_uniform(),
                            (c.topo_embedded_dim, h, h))
        sem = node_param_linear(x_sen, node_emb, w_pool, None)

        cat = jnp.concatenate([temporal, sem], axis=-1)
        return nn.Dense(self.dim_out, name="output")(cat)
