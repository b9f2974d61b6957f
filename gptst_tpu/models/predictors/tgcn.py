"""TGCN — temporal graph convolutional network (graph-GRU).

TPU-native counterpart of `model/TGCN/TGCN.py` (174 LoC): a GRU whose
gates are graph convolutions over D^-1/2 (A+I) D^-1/2, followed by a
linear readout of all horizons from the final state
(`TGCN.py:147,172-174`). The reference's Python loop over T
(`TGCN.py:168-169`) and its `torch.sparse.mm` become a `lax.scan` over
a dense MXU matmul (N <= 266). Defaults follow `conf/TGCN/*.conf`
(rnn_units=100).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from gptst_tpu.ops.recurrent import GraphGRUCell, scan_over_time


@dataclasses.dataclass(frozen=True)
class TGCNConfig:
    num_nodes: int
    rnn_units: int = 100
    lam: float = 0.0015  # L2 weight used by the reference's lreg variant
    # activation remat for the scanned GRU cell: auto|none|full|dots
    # (`ops/recurrent.remat_cell`) — trades ~1 recomputed forward for
    # O(T) backward residual memory. With the node-major cell the
    # stored path fits AND wins up to (at least) 64k/batch-8, so
    # "auto" (default) resolves to "none" below 128k nodes
    # (`ops/recurrent.resolve_remat`). CLI: `--remat full` to force.
    remat: str = "auto"


class TGCN(nn.Module):
    """x: (B, T, N, dim_in) -> (B, T_out, N, dim_out)."""

    cfg: TGCNConfig
    dim_in: int
    dim_out: int
    horizon: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, support: jnp.ndarray) -> jnp.ndarray:
        B, _, N, _ = x.shape
        from gptst_tpu.ops.graph_conv import ShardedSupport
        from gptst_tpu.ops.recurrent import (GraphGRUCellNM, remat_cell,
                                             resolve_remat)

        # node-major cell: storing residuals beats recomputing up to
        # (at least) 64k/batch-8 — see `resolve_remat`'s docstring
        rm = resolve_remat(self.cfg.remat, N, threshold=131072)
        if isinstance(support, ShardedSupport):
            # the halo/ring support carries a shard_map closure that
            # jax.checkpoint cannot abstract as a call operand; the
            # sharded path also divides the residual stack across
            # devices, so remat is forced off there. The sharded fn is
            # built for batch-major operands, so keep the original cell
            # layout on this path.
            scanned = scan_over_time(
                GraphGRUCell, num_units=self.cfg.rnn_units, remat="none")
            h0 = jnp.zeros((B, N, self.cfg.rnn_units), x.dtype)
            h, _ = scanned(h0, x, support)
        else:
            # node-major scan: one (B,T,N,D)->(T,N,B,D) transpose for
            # the whole sequence instead of two transposes + a pad
            # round-trip per aggregation (see `GraphGRUCellNM`); the
            # param tree is identical to the batch-major path.
            scanned = nn.scan(
                remat_cell(GraphGRUCellNM, rm),
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                in_axes=(0, nn.broadcast),
                out_axes=0,
            )(num_units=self.cfg.rnn_units)
            xt = jnp.transpose(x, (1, 2, 0, 3))      # (T, N, B, D)
            h0 = jnp.zeros((N, B, self.cfg.rnn_units), x.dtype)
            h, _ = scanned(h0, xt, support)          # h: (N, B, U)
            h = jnp.swapaxes(h, 0, 1)                # (B, N, U)
        out = nn.Dense(self.horizon * self.dim_out)(h)  # (B, N, T_out*D)
        out = out.reshape(B, N, self.horizon, self.dim_out)
        return jnp.transpose(out, (0, 2, 1, 3))
