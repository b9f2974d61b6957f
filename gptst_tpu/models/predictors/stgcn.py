"""STGCN — spatio-temporal graph convolutional network.

TPU-native re-design of `model/STGCN/stgcn.py` (155 LoC, torch):
channels-last (B, T, N, C) layout, Chebyshev spatial conv as one fused
einsum over a precomputed (K, N, N) polynomial stack, SAME-padded GLU
temporal convs. Config defaults follow `conf/STGCN/*.conf`
(Ks=3, Kt=3, blocks1=[64, 32, 128], outputl_ks=3).

Architecture (`stgcn.py:127-155`): two ST-Conv sandwich blocks
(TemporalGLU -> ChebConv -> TemporalReLU -> LayerNorm -> Dropout) then
an output head (TemporalGLU -> LayerNorm -> sigmoid temporal conv ->
1x1 projection). Input width `dim_in` is free so the same module serves
ori mode (raw channels) and eval mode (64-wide fused embeddings),
`model/Model.py:46-49`.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from gptst_tpu.ops.graph_conv import cheb_conv
from gptst_tpu.ops.temporal import TemporalConv, align_channels


@dataclasses.dataclass(frozen=True)
class STGCNConfig:
    num_nodes: int
    ks: int = 3
    kt: int = 3
    blocks1: tuple[int, int, int] = (64, 32, 128)
    drop_prob: float = 0.0
    outputl_ks: int = 3


class SpatioConvLayer(nn.Module):
    """Chebyshev graph conv + aligned residual (`stgcn.py:56-80`)."""

    ks: int
    c_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cheb: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        theta = self.param(
            "theta", nn.initializers.kaiming_uniform(), (c_in, self.c_out, self.ks))
        bias = self.param("bias", nn.initializers.zeros, (self.c_out,))
        x_gc = cheb_conv(x, cheb, theta, bias)
        proj = nn.Dense(self.c_out) if c_in > self.c_out else None
        x_in = align_channels(x, self.c_out, proj)
        return nn.relu(x_gc + x_in)


class STConvBlock(nn.Module):
    """GLU-TConv -> ChebConv -> TConv -> LayerNorm over (N, C)
    (`stgcn.py:82-97`)."""

    ks: int
    kt: int
    channels: tuple[int, int, int]  # (c_in_expected, c_mid, c_out)
    drop_prob: float

    @nn.compact
    def __call__(self, x, cheb, *, deterministic: bool = True):
        c = self.channels
        x = TemporalConv(kt=self.kt, c_out=c[1], act="GLU")(x)
        x = SpatioConvLayer(ks=self.ks, c_out=c[1])(x, cheb)
        x = TemporalConv(kt=self.kt, c_out=c[2], act="relu")(x)
        # torch LayerNorm([N, C]) normalizes jointly over the last two dims
        x = nn.LayerNorm(reduction_axes=(-2, -1), feature_axes=(-2, -1))(x)
        if self.drop_prob > 0:
            x = nn.Dropout(rate=self.drop_prob, deterministic=deterministic)(x)
        return x


class OutputLayer(nn.Module):
    """GLU-TConv -> LayerNorm -> sigmoid TConv(1) -> 1x1 head
    (`stgcn.py:108-124`)."""

    c: int
    t_kernel: int
    dim_out: int

    @nn.compact
    def __call__(self, x):
        x = TemporalConv(kt=self.t_kernel, c_out=self.c, act="GLU")(x)
        x = nn.LayerNorm(reduction_axes=(-2, -1), feature_axes=(-2, -1))(x)
        x = TemporalConv(kt=1, c_out=self.c, act="sigmoid")(x)
        return nn.Dense(self.dim_out)(x)


class STGCN(nn.Module):
    """x: (B, T, N, dim_in) -> (B, T, N, dim_out)."""

    cfg: STGCNConfig
    dim_in: int
    dim_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cheb: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        b1 = self.cfg.blocks1
        blocks0 = (self.dim_in, b1[1], b1[0])  # `stgcn.py:133`
        x = STConvBlock(self.cfg.ks, self.cfg.kt, blocks0,
                        self.cfg.drop_prob)(x, cheb, deterministic=deterministic)
        x = STConvBlock(self.cfg.ks, self.cfg.kt, b1,
                        self.cfg.drop_prob)(x, cheb, deterministic=deterministic)
        return OutputLayer(c=b1[2], t_kernel=self.cfg.outputl_ks,
                           dim_out=self.dim_out)(x)
