"""ASTGCN — attention-based spatio-temporal GCN.

TPU-native counterpart of `model/ASTGCN/ASTGCN.py` (312 LoC): low-rank
bilinear temporal attention E (T x T) re-mixes the time axis, spatial
attention S (N x N) modulates a K=3 Chebyshev conv (T_k ⊙ S), then a
(3,1) temporal conv + 1x1 residual + LayerNorm over channels, x2
blocks, and a final conv over the feature axis that emits all horizons
at once (`ASTGCN.py:294-311`). The reference's per-timestep Python loop
in the attended Cheb conv (`:100-131`) is one fused einsum here.
Defaults follow `conf/ASTGCN/*.conf` (nb_block=2, K=3, 64/64 filters,
time_strides=1).

Reference init relies on the global xavier sweep (`model/Run.py:79-85`,
ASTGCN confs set xavier=True): matrices xavier-uniform, vectors
uniform[0,1).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier = nn.initializers.xavier_uniform()
vec_uniform = nn.initializers.uniform(scale=1.0)


@dataclasses.dataclass(frozen=True)
class ASTGCNConfig:
    num_nodes: int
    nb_block: int = 2
    K: int = 3
    nb_chev_filter: int = 64
    nb_time_filter: int = 64
    time_strides: int = 1


class SpatialAttention(nn.Module):
    """(B,T,N,F) -> (B,N,N) row-softmax scores (`ASTGCN.py:49-78`)."""

    timesteps: int
    num_nodes: int

    @nn.compact
    def __call__(self, x):
        T, N, F = self.timesteps, self.num_nodes, x.shape[-1]
        w1 = self.param("W1", vec_uniform, (T,))
        w2 = self.param("W2", xavier, (F, T))
        w3 = self.param("W3", vec_uniform, (F,))
        bs = self.param("bs", xavier, (1, N, N))
        vs = self.param("Vs", xavier, (N, N))
        lhs = jnp.einsum("btnf,t->bnf", x, w1) @ w2          # (B,N,T)
        rhs = jnp.einsum("f,btnf->bnt", w3, x)               # (B,N,T)
        product = lhs @ jnp.swapaxes(rhs, 1, 2)              # (B,N,N)
        s = jnp.einsum("nk,bkm->bnm", vs, jax.nn.sigmoid(product + bs))
        return jax.nn.softmax(s, axis=1)


class TemporalAttention(nn.Module):
    """(B,T,N,F) -> (B,T,T) scores (`ASTGCN.py:134-163`)."""

    timesteps: int
    num_nodes: int

    @nn.compact
    def __call__(self, x):
        T, N, F = self.timesteps, self.num_nodes, x.shape[-1]
        u1 = self.param("U1", vec_uniform, (N,))
        u2 = self.param("U2", xavier, (F, N))
        u3 = self.param("U3", vec_uniform, (F,))
        be = self.param("be", xavier, (1, T, T))
        ve = self.param("Ve", xavier, (T, T))
        lhs = jnp.einsum("btnf,n->btf", x, u1) @ u2          # (B,T,N)
        rhs = jnp.einsum("f,btnf->bnt", u3, x)               # (B,N,T)
        product = lhs @ rhs                                   # (B,T,T)
        e = jnp.einsum("ts,bsr->btr", ve, jax.nn.sigmoid(product + be))
        return jax.nn.softmax(e, axis=1)


class ASTGCNBlock(nn.Module):
    """TAt -> SAt -> attended Cheb conv -> time conv + residual + LN
    (`ASTGCN.py:217-255`)."""

    cfg: ASTGCNConfig
    timesteps: int

    @nn.compact
    def __call__(self, x, cheb):  # x: (B,T,N,F); cheb: (K,N,N)
        c = self.cfg
        B, T, N, F = x.shape
        e = TemporalAttention(self.timesteps, c.num_nodes)(x)
        # x_TAt[..., t] = sum_s x[..., s] E[s, t] on the flattened (N,F)
        x_tat = jnp.einsum("bsnf,bst->btnf", x, e)
        s_at = SpatialAttention(self.timesteps, c.num_nodes)(x_tat)

        theta = self.param("Theta", xavier, (c.K, F, c.nb_chev_filter))
        # out[b,t,n,o] = relu( sum_k sum_m (T_k ⊙ S)[b,m,n] x[b,t,m,i] Θ_k[i,o] )
        a = cheb[:, None] * s_at[None]                       # (K,B,N,N)
        gcn = jax.nn.relu(
            jnp.einsum("kbmn,btmi,kio->btno", a, x, theta))

        tconv = nn.Conv(c.nb_time_filter, kernel_size=(3, 1),
                        strides=(c.time_strides, 1),
                        padding=((1, 1), (0, 0)), name="time_conv")(gcn)
        res = nn.Conv(c.nb_time_filter, kernel_size=(1, 1),
                      strides=(c.time_strides, 1), name="residual_conv")(x)
        return nn.LayerNorm()(jax.nn.relu(res + tconv))


class ASTGCN(nn.Module):
    """x: (B, T, N, dim_in) -> (B, horizon, N, dim_out)."""

    cfg: ASTGCNConfig
    dim_in: int
    dim_out: int
    horizon: int
    lag: int

    @nn.compact
    def __call__(self, x, cheb):
        c = self.cfg
        t = self.lag
        for b in range(c.nb_block):
            x = ASTGCNBlock(c, t)(x, cheb)
            t = t // c.time_strides if b == 0 else t
        # final conv: kernel spans the whole feature axis, the time axis
        # acts as input channels (`ASTGCN.py:294,309-311`)
        w = self.param("final_w", xavier,
                       (x.shape[1], c.nb_time_filter,
                        self.horizon * self.dim_out))
        b_ = self.param("final_b", vec_uniform,
                        (self.horizon * self.dim_out,))
        out = jnp.einsum("btnf,tfo->bno", x, w) + b_          # (B,N,T_out*D)
        out = out.reshape(x.shape[0], c.num_nodes, self.horizon, self.dim_out)
        return jnp.transpose(out, (0, 2, 1, 3))
