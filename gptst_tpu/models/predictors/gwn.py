"""Graph WaveNet (GWN).

TPU-native counterpart of `model/GWN/GWN.py` (314 LoC): gated dilated
causal TCN (WaveNet) blocks with skip/residual paths, diffusion graph
convolution over a support list, and a learned adaptive adjacency
`softmax(relu(E1 @ E2))` (`GWN.py:238`). Defaults follow
`conf/GWN/*.conf` (blocks=4, layers=2, kernel=2, nhid=32,
aptonly+addaptadj+randomadj=True, so the only support is the adaptive
one).

Layout re-design: channels-last (B, T, N, C); dilated convs run on the
T axis with VALID padding (time shrinks exactly as the reference's).
The reference front-pads time by 1 and sizes the receptive field as
`dim_out + blocks*(kernel-1)*(2^layers - 1)` (`GWN.py:152,177-201`) so
the residual time length after the last block equals dim_out, and the
final 1x1 conv's channel axis becomes the output horizon — both quirks
preserved.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from gptst_tpu.ops.graph_conv import adaptive_adj, diffusion_conv
from gptst_tpu.ops.norm import BatchStatsNorm


@dataclasses.dataclass(frozen=True)
class GWNConfig:
    num_nodes: int
    dropout: float = 0.3
    blocks: int = 4
    layers: int = 2
    gcn_bool: bool = True
    addaptadj: bool = True
    aptonly: bool = True
    # support preprocessing (`GWN.py:299-313`) and the nodevec init
    # source: randomadj=False seeds the adaptive adjacency from the
    # rank-10 SVD of supports[0] (`GWN.py:159-175`); every shipped conf
    # uses randomadj=True (random normal nodevecs)
    adjtype: str = "doubletransition"
    randomadj: bool = True
    kernel_size: int = 2
    nhid: int = 32
    residual_channels: int = 32
    dilation_channels: int = 32
    adapt_rank: int = 10

    @property
    def skip_channels(self) -> int:
        return self.nhid * 8

    @property
    def end_channels(self) -> int:
        return self.nhid * 16

    def receptive_field(self, dim_out: int) -> int:
        per_block = (self.kernel_size - 1) * (2 ** self.layers - 1)
        return dim_out + self.blocks * per_block


class DilatedCausal(nn.Module):
    """VALID (kt,1) conv over T with time dilation."""

    features: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, kernel_size=(self.kernel, 1),
                       kernel_dilation=(self.dilation, 1),
                       padding="VALID")(x)


class GWN(nn.Module):
    """x: (B, T, N, dim_in) -> (B, horizon, N, dim_out).

    `nodevec_init`: optional (init1, init2) flax initializers for the
    adaptive-adjacency embeddings — the SVD-seeded `randomadj=False`
    branch (`GWN.py:159-175`, built by `models/build.py:_build_gwn`).
    """

    cfg: GWNConfig
    dim_in: int
    dim_out: int
    horizon: int
    nodevec_init: tuple | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, supports: tuple = (), *,
                 deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        rf = c.receptive_field(self.dim_out)
        # front-pad time by 1, then up to the receptive field (`GWN.py:220-229`)
        pad = max(1, rf - x.shape[1])
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0), (0, 0)))

        # GWN's NConv contracts einsum('ncvl,vw->ncwl') — aggregation by
        # A^T (`GWN.py:60-66`); transpose once so graph_matmul (A @ x)
        # reproduces it exactly
        sup = [s.T for s in supports]
        if c.gcn_bool and c.addaptadj:
            i1, i2 = (self.nodevec_init if self.nodevec_init is not None
                      else (nn.initializers.normal(1.0),
                            nn.initializers.normal(1.0)))
            e1 = self.param("nodevec1", i1, (c.num_nodes, c.adapt_rank))
            e2 = self.param("nodevec2", i2, (c.adapt_rank, c.num_nodes))
            sup = sup + [adaptive_adj(e1, e2).T]

        x = nn.Dense(c.residual_channels, name="start_conv")(x)
        skip = None
        for b in range(c.blocks):
            dilation = 1
            for layer in range(c.layers):
                residual = x
                filt = jnp.tanh(DilatedCausal(
                    c.dilation_channels, c.kernel_size, dilation)(residual))
                gate = jax.nn.sigmoid(DilatedCausal(
                    c.dilation_channels, c.kernel_size, dilation)(residual))
                x = filt * gate
                s = nn.Dense(c.skip_channels)(x)
                skip = s if skip is None else s + skip[:, -s.shape[1]:]
                if c.gcn_bool and sup:
                    w = self.param(
                        f"gconv_w_{b}_{layer}", nn.initializers.xavier_uniform(),
                        ((2 * len(sup) + 1) * c.dilation_channels,
                         c.residual_channels))
                    bia = self.param(f"gconv_b_{b}_{layer}",
                                     nn.initializers.zeros,
                                     (c.residual_channels,))
                    x = diffusion_conv(x, sup, w, bia, order=2)
                    if c.dropout > 0:
                        x = nn.Dropout(rate=c.dropout,
                                       deterministic=deterministic)(x)
                else:
                    x = nn.Dense(c.residual_channels)(x)
                x = x + residual[:, -x.shape[1]:]
                x = BatchStatsNorm()(x)
                dilation *= 2

        x = jax.nn.relu(skip)
        x = jax.nn.relu(nn.Dense(c.end_channels, name="end_conv_1")(x))
        x = nn.Dense(self.horizon, name="end_conv_2")(x)
        # (B, t_rem=dim_out, N, horizon) -> (B, horizon, N, dim_out)
        return jnp.transpose(x, (0, 3, 2, 1))
