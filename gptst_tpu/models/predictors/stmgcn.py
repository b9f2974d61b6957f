"""ST-MGCN — spatio-temporal multi-graph convolutional network (demand).

TPU-native counterpart of `model/STMGCN_demand/STMGCN.py` + `GCN.py`
(265 LoC): for each of M=2 graphs (distance, Pearson correlation) a
*context-gated LSTM* — the node's temporal profile is graph-convolved,
globally pooled, squeezed through a (shared-twice) FC into per-timestep
sigmoid gates that re-weight the sequence (`STMGCN.py:36-49` eq. 6-9)
— feeds a 3-layer LSTM shared across nodes; its last state runs
through a K-support GCN; graph outputs are sum-fused into a linear
head emitting all horizons (`:110-129`). Supports are Chebyshev K=2
kernel stacks (3 terms) per graph (`GCN.py:61-140`). Defaults follow
`conf/STMGCN_demand/*.conf` (lstm 64 x3, gcn 64).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier_normal = nn.initializers.xavier_normal()


@dataclasses.dataclass(frozen=True)
class STMGCNConfig:
    num_nodes: int
    m_graphs: int = 2
    lstm_hidden_dim: int = 64
    lstm_num_layers: int = 3
    gcn_hidden_dim: int = 64
    cheb_k: int = 2
    # activation remat for the LSTM cells: auto|none|full|dots
    # (`ops/recurrent.remat_cell`; "auto" resolves by node count)
    remat: str = "auto"


class MultiSupportGCN(nn.Module):
    """K-support graph conv (`GCN.py:5-42`): concat [A_k x] -> linear."""

    hidden_dim: int
    activation: bool = True

    @nn.compact
    def __call__(self, supports, x):  # supports: (K,N,N); x: (B,N,C)
        sup = jnp.einsum("knm,bmc->bknc", supports, x)
        k, c = supports.shape[0], x.shape[-1]
        cat = jnp.moveaxis(sup, 1, 2).reshape(x.shape[0], x.shape[1], k * c)
        w = self.param("W", xavier_normal, (k * c, self.hidden_dim))
        b = self.param("b", nn.initializers.zeros, (self.hidden_dim,))
        out = cat @ w + b
        return jax.nn.relu(out) if self.activation else out


class ContextGatedLSTM(nn.Module):
    """CG-LSTM for one graph (`STMGCN.py:5-49`)."""

    cfg: STMGCNConfig
    seq_len: int

    @nn.compact
    def __call__(self, supports, obs):  # obs: (B,T,N,D)
        c = self.cfg
        B, T, N, D = obs.shape
        x_seq = obs.sum(-1)                          # (B,T,N)
        x_seq = jnp.swapaxes(x_seq, 1, 2)            # (B,N,T)
        g = MultiSupportGCN(self.seq_len, name="gconv_temporal")(
            supports, x_seq)
        x_hat = x_seq + g                            # eq. 6
        z = x_hat.mean(axis=1)                       # eq. 7: (B,T)
        fc = nn.Dense(self.seq_len, name="fc")       # shared twice (`:43`)
        s = jax.nn.sigmoid(fc(jax.nn.relu(fc(z))))   # eq. 8
        rew = jnp.einsum("btnf,bt->btnf", obs, s)    # eq. 9

        from gptst_tpu.ops.recurrent import remat_cell, resolve_remat

        seq = jnp.swapaxes(rew, 1, 2).reshape(B * N, T, D)
        h = seq
        cell_cls = remat_cell(nn.OptimizedLSTMCell,
                              resolve_remat(c.remat, N))
        for i in range(c.lstm_num_layers):
            h = nn.RNN(cell_cls(c.lstm_hidden_dim),
                       name=f"lstm{i}")(h)
        return h[:, -1].reshape(B, N, c.lstm_hidden_dim)


class STMGCN(nn.Module):
    """x: (B, T, N, dim_in) -> (B, T, N, dim_out)."""

    cfg: STMGCNConfig
    dim_in: int
    dim_out: int

    @nn.compact
    def __call__(self, x, support_stacks):  # (M, K, N, N)
        c = self.cfg
        B, T, N, _ = x.shape
        feats = []
        for m in range(c.m_graphs):
            rnn_out = ContextGatedLSTM(c, T, name=f"cg_lstm{m}")(
                support_stacks[m], x)
            feats.append(MultiSupportGCN(c.gcn_hidden_dim, name=f"gcn{m}")(
                support_stacks[m], rnn_out))
        fused = sum(feats)                           # (B,N,H)
        out = nn.Dense(self.dim_out * T, name="fc")(fused)
        out = out.reshape(B, N, T, self.dim_out)
        return jnp.swapaxes(out, 1, 2)
