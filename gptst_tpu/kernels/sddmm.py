"""Block-sparse SDDMM Pallas kernel — sampled E1 @ E2 products.

The adaptive-adjacency models learn a dense graph from node embeddings
— GWN's `softmax(relu(E1 @ E2))` (`model/GWN/GWN.py:238`) and MTGNN's
`relu(tanh(alpha*(M1 M2^T - M2 M1^T)))` (`model/MTGNN/MTGNN.py:149-202`).
At reference scale (N <= 266) the dense N x N product is free; at large
N it is O(N^2) memory per step. This kernel computes the products only
on a fixed block-sparse *pattern* (e.g. the k-NN graph of the static
adjacency): for every nonzero (TB x TB) block (i, j) it runs one MXU
matmul `E1[i-tile] @ E2[:, j-tile]`, giving block values that slot
straight into the block-CSR SpMM (`gptst_tpu/kernels/spmm.py`).

Semantics note: the sparse softmax normalizes over pattern entries
only, whereas the reference's dense softmax also counts exp(0)=1 for
every non-edge. This is the standard sparse-attention definition; at
reference scale the dense path is used, so parity is unaffected.

Backward: dE1/dE2 are SpMM-shaped gather/segment-sum contractions over
the same pattern, expressed as XLA batched matmuls + segment_sum (the
gathered operands are (nnzb, TB, d) with d the embedding rank — tiny).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptst_tpu.kernels.spmm import BlockCSR


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SDDMMPattern:
    """Static sparsity pattern for SDDMM, derived from a BlockCSR.

    Block b lives at block-row `row_ids[b]`, block-col `cols[b]`;
    `mask` zeroes entries of stored blocks that are not pattern edges
    (and whole padding blocks). `t_*` give the transposed block order
    so a learned adjacency's backward-SpMM structure can be assembled
    inside jit: t_vals = vals[t_order].transpose(0, 2, 1).
    """

    row_ids: jnp.ndarray   # (nnzb,) int32
    cols: jnp.ndarray      # (nnzb,) int32
    ptr: jnp.ndarray       # (row_tiles + 1,) int32
    mask: jnp.ndarray      # (nnzb, TB, TB) float32 in {0, 1}
    t_ptr: jnp.ndarray     # (row_tiles + 1,) int32
    t_cols: jnp.ndarray    # (nnzb,) int32
    t_order: jnp.ndarray   # (nnzb,) int32
    n: int
    n_pad: int
    tile: int

    def tree_flatten(self):
        return ((self.row_ids, self.cols, self.ptr, self.mask,
                 self.t_ptr, self.t_cols, self.t_order),
                (self.n, self.n_pad, self.tile))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def nnzb(self) -> int:
        return self.cols.shape[0]

    @classmethod
    def from_bcsr(cls, bcsr: BlockCSR) -> "SDDMMPattern":
        """Pattern of an existing block-CSR adjacency (includes its
        _DMA_CHUNK padding blocks, masked to zero)."""
        ptr = np.asarray(bcsr.block_ptr, np.int64)
        cols = np.asarray(bcsr.block_cols, np.int64)
        vals = np.asarray(bcsr.block_vals)
        nnzb = cols.shape[0]
        real = int(ptr[-1])
        row_ids = np.zeros(nnzb, np.int64)
        row_ids[:real] = np.repeat(
            np.arange(len(ptr) - 1), np.diff(ptr))
        mask = (vals != 0).astype(np.float32)
        mask[real:] = 0.0

        # transposed block order over the real (unpadded) blocks,
        # padding blocks appended unchanged at the tail
        order = np.arange(real)
        t_sort = np.lexsort((row_ids[:real], cols[:real]))
        t_order = np.concatenate([order[t_sort],
                                  np.arange(real, nnzb)])
        t_cols_real = row_ids[:real][t_sort]
        t_rows_real = cols[:real][t_sort]
        rt = len(ptr) - 1
        t_ptr = np.zeros(rt + 1, np.int64)
        np.add.at(t_ptr, t_rows_real + 1, 1)
        t_ptr = np.cumsum(t_ptr)
        t_cols = np.concatenate([t_cols_real, cols[real:]])
        return cls(
            row_ids=jnp.asarray(row_ids, jnp.int32),
            cols=jnp.asarray(cols, jnp.int32),
            ptr=jnp.asarray(ptr, jnp.int32),
            mask=jnp.asarray(mask),
            t_ptr=jnp.asarray(t_ptr, jnp.int32),
            t_cols=jnp.asarray(t_cols, jnp.int32),
            t_order=jnp.asarray(t_order, jnp.int32),
            n=bcsr.n, n_pad=bcsr.n_pad, tile=bcsr.tile)


def _sddmm_kernel(rids_ref, cols_ref, e1_ref, e2_ref, out_ref):
    del rids_ref, cols_ref  # consumed by the index maps
    out_ref[0] = jnp.dot(e1_ref[:], e2_ref[:],
                         preferred_element_type=jnp.float32)


def _sddmm_fwd_impl(pattern: SDDMMPattern, e1: jnp.ndarray,
                    e2: jnp.ndarray) -> jnp.ndarray:
    n, d = e1.shape
    tb = pattern.tile
    d_pad = _round_up(max(d, 128), 128)
    e1_pad = jnp.zeros((pattern.n_pad, d_pad), jnp.float32)
    e1_pad = e1_pad.at[:n, :d].set(e1.astype(jnp.float32))
    e2_pad = jnp.zeros((d_pad, pattern.n_pad), jnp.float32)
    e2_pad = e2_pad.at[:d, :n].set(e2.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pattern.nnzb,),
        in_specs=[
            pl.BlockSpec((tb, d_pad), lambda b, rids, cols: (rids[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, tb), lambda b, rids, cols: (0, cols[b]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, tb), lambda b, rids, cols: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pattern.nnzb, tb, tb), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * pattern.nnzb * tb * tb * d_pad,
            bytes_accessed=(2 * pattern.nnzb * tb * d_pad
                            + pattern.nnzb * tb * tb) * 4,
            transcendentals=0),
    )(pattern.row_ids, pattern.cols, e1_pad, e2_pad)


@jax.custom_vjp
def sddmm(pattern: SDDMMPattern, e1: jnp.ndarray,
          e2: jnp.ndarray) -> jnp.ndarray:
    """Sampled (E1 @ E2) on the pattern's nonzero blocks.

    e1: (N, d); e2: (d, N). Returns (nnzb, TB, TB) block values,
    elementwise-masked by the pattern (non-edges within stored blocks
    and padding blocks are 0).
    """
    return _sddmm_fwd_impl(pattern, e1, e2) * pattern.mask


def _gather_tiles(x_pad: jnp.ndarray, ids: jnp.ndarray,
                  tile: int) -> jnp.ndarray:
    """x_pad: (n_pad, d) -> (len(ids), tile, d) row-tile gather."""
    tiles = x_pad.reshape(-1, tile, x_pad.shape[-1])
    return jnp.take(tiles, ids, axis=0)


def _sddmm_fwd(pattern, e1, e2):
    return sddmm(pattern, e1, e2), (pattern, e1, e2)


def _sddmm_bwd(res, g):
    pattern, e1, e2 = res
    n, d = e1.shape
    tb = pattern.tile
    rt = pattern.n_pad // tb
    g = g * pattern.mask
    e1_pad = jnp.zeros((pattern.n_pad, d), e1.dtype).at[:n].set(e1)
    e2_pad = jnp.zeros((pattern.n_pad, d), e2.dtype).at[:n].set(e2.T)

    # dE1[row-tile r] += sum_b in row r: g[b] @ E2[:, col b].T
    e2_tiles = _gather_tiles(e2_pad, pattern.cols, tb)   # (nnzb, TB, d)
    contrib1 = jnp.einsum("bij,bjd->bid", g, e2_tiles)
    de1 = jax.ops.segment_sum(contrib1, pattern.row_ids, num_segments=rt)
    de1 = de1.reshape(pattern.n_pad, d)[:n]

    # dE2[:, col-tile c] += sum_b in col c: E1[row b].T @ g[b]
    e1_tiles = _gather_tiles(e1_pad, pattern.row_ids, tb)
    contrib2 = jnp.einsum("bid,bij->bdj", e1_tiles, g)
    de2 = jax.ops.segment_sum(contrib2, pattern.cols, num_segments=rt)
    de2 = jnp.moveaxis(de2, 0, 1).reshape(d, pattern.n_pad)[:, :n]

    zeros = jax.tree.map(jnp.zeros_like, pattern)
    return (zeros, de1.astype(e1.dtype), de2.astype(e2.dtype))


sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)


def sddmm_reference(pattern: SDDMMPattern, e1, e2) -> jnp.ndarray:
    """Dense-gather reference implementation (for tests)."""
    n, d = e1.shape
    tb = pattern.tile
    e1_pad = jnp.zeros((pattern.n_pad, d), jnp.float32).at[:n].set(e1)
    e2_pad = jnp.zeros((pattern.n_pad, d), jnp.float32).at[:n].set(e2.T)
    t1 = _gather_tiles(e1_pad, pattern.row_ids, tb)
    t2 = _gather_tiles(e2_pad, pattern.cols, tb)
    return jnp.einsum("bid,bjd->bij", t1, t2) * pattern.mask


def _block_row_softmax(pattern: SDDMMPattern,
                       scores: jnp.ndarray) -> jnp.ndarray:
    """Row softmax restricted to pattern entries.

    scores: (nnzb, TB, TB) with non-edges already 0 (post-relu, so all
    entries >= 0; exp runs unshifted exactly like the reference's
    softmax over non-negative relu outputs)."""
    rt = pattern.n_pad // pattern.tile
    ex = jnp.exp(scores) * pattern.mask
    row_sums = jax.ops.segment_sum(
        ex.sum(axis=2), pattern.row_ids, num_segments=rt)  # (rt, TB)
    denom = jnp.take(row_sums, pattern.row_ids, axis=0)     # (nnzb, TB)
    return ex / jnp.maximum(denom[:, :, None], 1e-38)


def adaptive_support(pattern: SDDMMPattern, e1: jnp.ndarray,
                     e2: jnp.ndarray):
    """GWN-style sparse adaptive adjacency as a `SparseSupport`.

    softmax(relu(E1 @ E2)) restricted to the pattern (`GWN.py:238`).
    The returned support's forward and transposed block-CSRs are
    assembled inside jit from the SDDMM output (t_order permutation),
    so gradients flow through the block values to E1/E2.
    """
    from gptst_tpu.ops.graph_conv import SparseSupport

    vals = _block_row_softmax(pattern, jax.nn.relu(sddmm(pattern, e1, e2)))
    t_vals = jnp.take(vals, pattern.t_order,
                      axis=0).transpose(0, 2, 1)
    fwd = BlockCSR(block_ptr=pattern.ptr, block_cols=pattern.cols,
                   block_vals=vals, n=pattern.n, n_pad=pattern.n_pad,
                   tile=pattern.tile)
    bwd = BlockCSR(block_ptr=pattern.t_ptr, block_cols=pattern.t_cols,
                   block_vals=t_vals, n=pattern.n, n_pad=pattern.n_pad,
                   tile=pattern.tile)
    return SparseSupport(fwd, bwd)


def mtgnn_support(pattern: SDDMMPattern, m1: jnp.ndarray,
                  m2: jnp.ndarray, alpha: float):
    """MTGNN-style sparse learned graph (`MTGNN.py:149-202`).

    relu(tanh(alpha * (M1 M2^T - M2 M1^T))) on the pattern; the
    pattern itself plays the role of the reference's top-k mask.
    m1, m2: (N, d) transformed node embeddings."""
    from gptst_tpu.ops.graph_conv import SparseSupport

    s12 = sddmm(pattern, m1, m2.T)
    s21 = sddmm(pattern, m2, m1.T)
    vals = jax.nn.relu(jnp.tanh(alpha * (s12 - s21))) * pattern.mask
    t_vals = jnp.take(vals, pattern.t_order, axis=0).transpose(0, 2, 1)
    fwd = BlockCSR(block_ptr=pattern.ptr, block_cols=pattern.cols,
                   block_vals=vals, n=pattern.n, n_pad=pattern.n_pad,
                   tile=pattern.tile)
    bwd = BlockCSR(block_ptr=pattern.t_ptr, block_cols=pattern.t_cols,
                   block_vals=t_vals, n=pattern.n, n_pad=pattern.n_pad,
                   tile=pattern.tile)
    return SparseSupport(fwd, bwd)
