"""MTGNN — graph structure learning + mix-hop propagation.

TPU-native counterpart of `model/MTGNN/MTGNN.py` (501 LoC): a learned
directed graph `relu(tanh(alpha(M1 M2^T - M2 M1^T)))` with top-k row
sparsification (`MTGNN.py:149-202`), dilated-inception TCN blocks
(kernels {2,3,6,7}), bidirectional MixProp graph convs
`gconv1(x, A) + gconv2(x, A^T)` (`:487`), per-layer skip convs that
collapse the remaining time axis, and a node-indexed LayerNorm over the
full (T, N, C) slab (`:294-327`). Defaults follow `conf/MTGNN/*.conf`
(layers=3, gcn_depth=2, subgraph_size=20, node_dim=40,
dilation_exponential=1, conv/residual 32, skip 64, end 128,
propalpha=0.05, tanhalpha=3).

Receptive field (dilation_exponential=1): layers*(7-1) + dim_out; the
input is front-padded to it so, as in GWN, the surviving time length
equals dim_out and the final 1x1's channel axis becomes the horizon.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from gptst_tpu.ops.graph_conv import mixprop, mtgnn_graph
from gptst_tpu.ops.temporal import DilatedInception


@dataclasses.dataclass(frozen=True)
class MTGNNConfig:
    num_nodes: int
    gcn_true: bool = True
    build_adj: bool = True
    gcn_depth: int = 2
    dropout: float = 0.3
    subgraph_size: int = 20
    node_dim: int = 40
    dilation_exponential: int = 1
    conv_channels: int = 32
    residual_channels: int = 32
    skip_channels: int = 64
    end_channels: int = 128
    layers: int = 3
    propalpha: float = 0.05
    tanhalpha: float = 3.0
    kernel_size: int = 7

    def receptive_field(self, dim_out: int) -> int:
        k = self.kernel_size - 1
        if self.dilation_exponential > 1:
            e = self.dilation_exponential
            return int(dim_out + k * (e ** self.layers - 1) / (e - 1))
        return self.layers * k + dim_out


class NodeLayerNorm(nn.Module):
    """LayerNorm over the whole (T, N, C) slab with per-(T,N,C) affine
    (`MTGNN.py:294-327` — elementwise_affine with full idx)."""

    shape: tuple[int, int, int]  # (T, N, C)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, N, C)
        w = self.param("weight", nn.initializers.ones, self.shape)
        b = self.param("bias", nn.initializers.zeros, self.shape)
        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        var = x.var(axis=(1, 2, 3), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * w + b


class GraphConstructor(nn.Module):
    """Learned directed adjacency (`MTGNN.py:149-202`)."""

    num_nodes: int
    node_dim: int
    alpha: float
    k: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        e1 = self.param("emb1", nn.initializers.normal(1.0),
                        (self.num_nodes, self.node_dim))
        e2 = self.param("emb2", nn.initializers.normal(1.0),
                        (self.num_nodes, self.node_dim))
        m1 = nn.Dense(self.node_dim, name="lin1")(e1)
        m2 = nn.Dense(self.node_dim, name="lin2")(e2)
        return mtgnn_graph(m1, m2, self.alpha, self.k)


class MTGNN(nn.Module):
    """x: (B, T, N, dim_in) -> (B, horizon, N, dim_out)."""

    cfg: MTGNNConfig
    dim_in: int
    dim_out: int
    horizon: int
    lag: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, predefined_adj=None, *,
                 deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        rf = c.receptive_field(self.dim_out)
        t_full = max(self.lag, rf)
        if x.shape[1] < rf:
            x = jnp.pad(x, ((0, 0), (rf - x.shape[1], 0), (0, 0), (0, 0)))

        if c.gcn_true:
            if c.build_adj:
                adp = GraphConstructor(
                    c.num_nodes, c.node_dim, c.tanhalpha,
                    c.subgraph_size, name="gc")()
            else:
                adp = predefined_adj

        drop = lambda h: nn.Dropout(rate=c.dropout,
                                    deterministic=deterministic)(h)
        h = nn.Dense(c.residual_channels, name="start_conv")(x)
        # skip0: conv over the whole (padded) time axis -> time length 1
        skip = nn.Conv(c.skip_channels, kernel_size=(t_full, 1),
                       padding="VALID", name="skip0")(drop(x))
        for i in range(c.layers):
            residual = h
            filt = jnp.tanh(DilatedInception(c.conv_channels)(h))
            gate = jax.nn.sigmoid(DilatedInception(c.conv_channels)(h))
            h = drop(filt * gate)
            # in-loop skips collapse the whole remaining time axis to 1
            s = nn.Conv(c.skip_channels, kernel_size=(h.shape[1], 1),
                        padding="VALID")(h)
            skip = s + skip
            if c.gcn_true:
                w1 = self.param(f"mixprop1_w_{i}",
                                nn.initializers.xavier_uniform(),
                                ((c.gcn_depth + 1) * c.conv_channels,
                                 c.residual_channels))
                w2 = self.param(f"mixprop2_w_{i}",
                                nn.initializers.xavier_uniform(),
                                ((c.gcn_depth + 1) * c.conv_channels,
                                 c.residual_channels))
                # the reference MixProp projection is a biased 1x1 conv
                # (`MTGNN.py:27-33,61`)
                b1 = self.param(f"mixprop1_b_{i}", nn.initializers.zeros,
                                (c.residual_channels,))
                b2 = self.param(f"mixprop2_b_{i}", nn.initializers.zeros,
                                (c.residual_channels,))
                h = (mixprop(h, adp, w1, c.gcn_depth, c.propalpha) + b1
                     + mixprop(h, adp.T, w2, c.gcn_depth, c.propalpha) + b2)
            else:
                h = nn.Dense(c.residual_channels)(h)
            h = h + residual[:, -h.shape[1]:]
            h = NodeLayerNorm(
                (h.shape[1], c.num_nodes, c.residual_channels))(h)

        skip = nn.Conv(c.skip_channels,
                       kernel_size=(h.shape[1] - self.dim_out + 1, 1),
                       padding="VALID", name="skipE")(h) + skip
        h = jax.nn.relu(skip)
        h = jax.nn.relu(nn.Dense(c.end_channels, name="end_conv_1")(h))
        h = nn.Dense(self.horizon, name="end_conv_2")(h)
        # (B, dim_out, N, horizon) -> (B, horizon, N, dim_out)
        return jnp.transpose(h, (0, 3, 2, 1))
