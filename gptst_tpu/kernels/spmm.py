"""Block-sparse SpMM Pallas kernel — the framework's sparse hot op.

All graph aggregation is `A @ X` over the node axis (SURVEY.md §7.1#2).
At reference scale (N <= 266) dense matmuls win outright, so the dense
einsum in `gptst_tpu.ops.graph_conv` stays the default. This kernel is
the scaling path for large sensor graphs: the adjacency is tiled into
(TB x TB) blocks, only nonzero blocks are kept (block-CSR), and each
row-tile's output accumulates dense block matmuls on the MXU — the
idiomatic TPU "sparse" formulation (gather/scatter SpMM starves the
MXU; block-dense keeps it saturated at real-graph block densities).

Kernel layout:
  grid = (row_tiles, feature_tiles)
  block_ptr / block_cols ride scalar prefetch (SMEM) so the inner
  fori_loop can index x with `pl.ds(col * TB, TB)` dynamic slices;
  block values and the x feature stripe live in VMEM.

Backward: dX = A^T @ dY is the same kernel over the transposed block
structure (precomputed once). dA (per nonzero block) = dY_rowtile @
X_coltile^T — a wide-inner-dim SDDMM kernel — so learned block-sparse
adjacencies (`gptst_tpu/kernels/sddmm.py:adaptive_support`) train;
for constant graph artifacts the dA kernel is dead code XLA removes.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_chunk(cols: np.ndarray, vals: np.ndarray, tile: int):
    """Append _DMA_CHUNK zero blocks so chunked DMAs may over-read."""
    pad = _DMA_CHUNK
    cols = np.concatenate([cols, np.zeros(pad, cols.dtype)])
    vals = np.concatenate(
        [vals, np.zeros((pad, tile, tile), vals.dtype)])
    return cols, vals


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockCSR:
    """Block-compressed sparse row adjacency (padded to tile grid)."""

    block_ptr: jnp.ndarray    # (row_tiles + 1,) int32
    block_cols: jnp.ndarray   # (nnzb,) int32
    block_vals: jnp.ndarray   # (nnzb, TB, TB) float32
    n: int                    # logical node count
    n_pad: int                # padded node count
    tile: int

    def tree_flatten(self):
        return ((self.block_ptr, self.block_cols, self.block_vals),
                (self.n, self.n_pad, self.tile))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def row_tiles(self) -> int:
        return self.n_pad // self.tile

    @property
    def nnzb_logical(self) -> int:
        """Static logical block count. `block_vals.shape[0]` includes
        the _DMA_CHUNK zero pad blocks `_pad_chunk` appends (so chunked
        DMAs may over-read); byte/chunk models must not count them
        (`block_ptr[-1]` holds the same value but is a device array —
        unusable under trace)."""
        return self.block_vals.shape[0] - _DMA_CHUNK

    @classmethod
    def _from_blocks(cls, u_rows: np.ndarray, u_cols: np.ndarray,
                     blocks: np.ndarray, n: int, n_pad: int,
                     tile: int, vals_dtype=jnp.float32) -> "BlockCSR":
        """Assemble from host-side unique (row, col, block) triples
        (must be lexsorted by (row, col))."""
        rt = n_pad // tile
        ptr = np.zeros(rt + 1, np.int64)
        np.add.at(ptr, u_rows + 1, 1)
        ptr = np.cumsum(ptr)
        if u_rows.size == 0:  # keep shapes non-empty for the kernel
            u_cols = np.zeros(1, np.int64)
            blocks = np.zeros((1, tile, tile), np.float32)
            ptr = np.concatenate(
                [np.zeros(rt, np.int64), np.ones(1, np.int64)])
        u_cols, blocks = _pad_chunk(u_cols, blocks, tile)
        return cls(
            block_ptr=jnp.asarray(ptr, jnp.int32),
            block_cols=jnp.asarray(u_cols, jnp.int32),
            block_vals=jnp.asarray(blocks, vals_dtype),
            n=n, n_pad=n_pad, tile=tile)

    @staticmethod
    def _coo_blocks(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                    n_pad: int, tile: int):
        """Edge list -> lexsorted unique block triples (host-side)."""
        rt = n_pad // tile
        br = rows // tile
        bc = cols // tile
        key = br.astype(np.int64) * rt + bc
        uniq, inv = np.unique(key, return_inverse=True)
        blocks = np.zeros((uniq.size, tile, tile), np.float32)
        np.add.at(blocks, (inv, rows % tile, cols % tile),
                  vals.astype(np.float32))
        return (uniq // rt).astype(np.int64), (uniq % rt).astype(np.int64), \
            blocks

    @classmethod
    def from_dense(cls, adj: np.ndarray, tile: int = 128,
                   vals_dtype=jnp.float32) -> "BlockCSR":
        n = adj.shape[0]
        n_pad = _round_up(n, tile)
        rows, cols = np.nonzero(adj)
        u_rows, u_cols, blocks = cls._coo_blocks(
            rows, cols, adj[rows, cols], n_pad, tile)
        return cls._from_blocks(u_rows, u_cols, blocks, n, n_pad, tile,
                                vals_dtype)

    @classmethod
    def from_coo(cls, rows: np.ndarray, cols: np.ndarray,
                 vals: np.ndarray, n: int, tile: int = 128,
                 vals_dtype=jnp.float32) -> "BlockCSR":
        """Build from an edge list without materializing the dense
        (N, N) adjacency — required beyond ~16k nodes."""
        n_pad = _round_up(n, tile)
        u_rows, u_cols, blocks = cls._coo_blocks(rows, cols, vals,
                                                 n_pad, tile)
        return cls._from_blocks(u_rows, u_cols, blocks, n, n_pad, tile,
                                vals_dtype)

    @classmethod
    def pair_from_coo(cls, rows: np.ndarray, cols: np.ndarray,
                      vals: np.ndarray, n: int, tile: int = 128,
                      vals_dtype=jnp.float32
                      ) -> tuple["BlockCSR", "BlockCSR"]:
        """(A, A^T) built in one host-side pass — no device round-trip
        (a `transpose()` on an already-uploaded BlockCSR must download
        the blocks first, which is slow on tunneled backends)."""
        n_pad = _round_up(n, tile)
        u_rows, u_cols, blocks = cls._coo_blocks(rows, cols, vals,
                                                 n_pad, tile)
        a = cls._from_blocks(u_rows, u_cols, blocks, n, n_pad, tile,
                             vals_dtype)
        order = np.lexsort((u_rows, u_cols))
        at = cls._from_blocks(
            u_cols[order], u_rows[order],
            np.ascontiguousarray(blocks[order].transpose(0, 2, 1)),
            n, n_pad, tile, vals_dtype)
        return a, at

    @classmethod
    def pair_from_dense(cls, adj: np.ndarray, tile: int = 128,
                        vals_dtype=jnp.float32
                        ) -> tuple["BlockCSR", "BlockCSR"]:
        rows, cols = np.nonzero(adj)
        return cls.pair_from_coo(rows, cols, adj[rows, cols],
                                 adj.shape[0], tile, vals_dtype)

    def transpose(self) -> "BlockCSR":
        """Block structure of A^T (for the backward pass). Downloads
        the block values — prefer `pair_from_coo`/`pair_from_dense`
        when the host-side edge data is still at hand."""
        rt = self.row_tiles
        ptr = np.asarray(self.block_ptr)
        cols = np.asarray(self.block_cols)
        vals = np.asarray(self.block_vals)
        nb = int(ptr[-1])
        u_rows = np.repeat(np.arange(rt, dtype=np.int64),
                           np.diff(ptr).astype(np.int64))
        u_cols = cols[:nb].astype(np.int64)
        order = np.lexsort((u_rows, u_cols))
        return BlockCSR._from_blocks(
            u_cols[order], u_rows[order],
            np.ascontiguousarray(vals[:nb][order].transpose(0, 2, 1)),
            self.n, self.n_pad, self.tile)


# Max blocks DMA'd per async copy. A lone (128,128) f32 block is
# 64 KiB — small enough that per-DMA issue latency dominates HBM
# streaming time (measured ~4x off bandwidth-bound). Blocks of a row
# tile are contiguous in block_vals, so batching CHUNK of them per
# copy amortizes the issue cost; from_dense/transpose pad the value
# array by CHUNK zero blocks so the final (partial) chunk can
# over-copy safely. The per-call chunk (`_pick_chunk`) shrinks when a
# grid cell averages few blocks: every cell's LAST chunk over-reads up
# to chunk-1 blocks, and at e.g. 64k nodes x 4 panels (~10 blocks per
# cell) chunk=8 rounding inflated adjacency traffic ~1.5x.
_DMA_CHUNK = 8


def _pick_chunk(nnzb: int, cells: int) -> int:
    avg = nnzb / max(cells, 1)
    if avg >= 16:
        return 8
    if avg >= 6:
        return 4
    return 2


def _spmm_kernel(chunk, ptr_ref, cols_ref, vals_hbm, x_ref, out_ref):
    i = pl.program_id(0)
    tb = out_ref.shape[0]
    start = ptr_ref[i]
    end = ptr_ref[i + 1]
    num = end - start
    nch = pl.cdiv(num, chunk)

    def scoped(vbuf, sems):
        # double-buffered, chunked HBM->VMEM DMA of adjacency blocks,
        # overlapped with the MXU matmuls
        def get_dma(slot, c):
            return pltpu.make_async_copy(
                vals_hbm.at[pl.ds(start + c * chunk, chunk)],
                vbuf.at[slot], sems.at[slot])

        @pl.when(nch > 0)
        def _():
            get_dma(0, 0).start()

        def chunk_body(c, acc):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < nch)
            def _():
                get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

            get_dma(slot, c).wait()
            base = start + c * chunk
            # gather the CHUNK referenced x tiles and contract the whole
            # chunk in ONE dot_general over (k, col) — an effective
            # K = CHUNK*TB matmul instead of CHUNK serial TBxTB dots
            # (small dots leave the MXU issue-bound). A chunk may
            # overrun into the next row tile's blocks: SELECT those
            # value blocks to zero (selection, not multiplication —
            # legitimate NaN/Inf in k < valid blocks must propagate,
            # while an overrun NaN times zero would survive a multiply)
            valid = num - c * chunk
            xcat = jnp.stack([
                x_ref[pl.ds(cols_ref[base + k] * tb, tb), :]
                for k in range(chunk)
            ]).astype(vbuf.dtype)                       # (CHUNK, TB, FT)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, 1, 1), 0)
            vcat = jnp.where(lane < valid, vbuf[slot],
                             jnp.zeros_like(vbuf[slot]))
            # matched operand dtypes: bf16 block values halve HBM
            # traffic AND double the MXU rate; accumulation stays f32.
            # Batched over the chunk axis + sum: Mosaic's tpu.matmul
            # cannot lower a multi-dim contraction (((0,2),(0,1)))
            blk = jax.lax.dot_general(
                vcat, xcat,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return acc + blk.sum(axis=0)

        acc0 = jnp.zeros(out_ref.shape, jnp.float32)
        out_ref[:] = jax.lax.fori_loop(0, nch, chunk_body, acc0).astype(
            out_ref.dtype)

    pl.run_scoped(
        scoped,
        pltpu.VMEM((2, chunk, tb, tb), vals_hbm.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    )


def _spmm_kernel_stream(chunk, ptr_ref, cols_ref, vals_hbm, x_hbm,
                        out_ref):
    """Large-N variant: x stays in HBM; the referenced (TB, FT) column
    blocks are gathered per adjacency block, double-buffered with the
    value DMAs (the resident-stripe variant needs n_pad*FT*4 bytes of
    VMEM, which overflows past ~16k nodes)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    tb = out_ref.shape[0]
    ft = out_ref.shape[1]
    start = ptr_ref[i]
    end = ptr_ref[i + 1]
    num = end - start
    nch = pl.cdiv(num, chunk)

    def scoped(vbuf, xbuf, vsem, xsem):
        def val_dma(slot, c):
            return pltpu.make_async_copy(
                vals_hbm.at[pl.ds(start + c * chunk, chunk)],
                vbuf.at[slot], vsem.at[slot])

        def x_dma(slot, c, k):
            col = cols_ref[start + c * chunk + k]  # pad cols are 0
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(col * tb, tb), pl.ds(j * ft, ft)],
                xbuf.at[slot, k], xsem.at[slot, k])

        def start_chunk(slot, c):
            val_dma(slot, c).start()
            for k in range(chunk):
                x_dma(slot, c, k).start()

        @pl.when(nch > 0)
        def _():
            start_chunk(0, 0)

        def chunk_body(c, acc):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < nch)
            def _():
                start_chunk(jax.lax.rem(c + 1, 2), c + 1)

            val_dma(slot, c).wait()
            valid = num - c * chunk
            # every started DMA must be waited (a leaked semaphore
            # signal would corrupt the slot's next reuse), but chunk
            # overrun reads the NEXT row tile's blocks — SELECT those
            # value blocks to zero, then contract the whole chunk in
            # ONE K = CHUNK*TB dot_general (serial TBxTB dots leave
            # the MXU issue-bound)
            for k in range(chunk):
                x_dma(slot, c, k).wait()
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, 1, 1), 0)
            vcat = jnp.where(lane < valid, vbuf[slot],
                             jnp.zeros_like(vbuf[slot]))
            return acc + jax.lax.dot_general(
                vcat, xbuf[slot].astype(vcat.dtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).sum(axis=0)

        acc0 = jnp.zeros(out_ref.shape, jnp.float32)
        out_ref[:] = jax.lax.fori_loop(0, nch, chunk_body, acc0).astype(
            out_ref.dtype)

    pl.run_scoped(
        scoped,
        pltpu.VMEM((2, chunk, out_ref.shape[0], out_ref.shape[0]),
                   vals_hbm.dtype),
        pltpu.VMEM((2, chunk, out_ref.shape[0], out_ref.shape[1]),
                   x_hbm.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2, chunk)),
    )


# Resident-stripe variant budget: the whole (n_pad, FT) x stripe lives
# in VMEM. Past this, switch to the panel / streaming-gather variants.
# TPU VMEM is ~16 MB/core and Pallas DOUBLE-BUFFERS input blocks when
# the block index varies across grid steps — so the stripe may claim
# at most ~2x6 MB, leaving the rest for the value chunks, the output
# tile, and pipeline slack. (An 8 MB budget compiled only by accident
# while every caller used a single feature tile, where the constant
# index let Mosaic keep one copy; multiple feature tiles revolve the
# buffer and a 2x8.39 MB stripe blew the 16 MB scoped-vmem limit.)
_STRIPE_VMEM_BUDGET = 6 * 1024 * 1024


def _spmm_kernel_panel(chunk, ptr2_ref, cols_ref, vals_hbm, x_ref,
                       out_ref):
    """Large-N variant: x is processed in VMEM-resident column PANELS.

    grid = (feat_tiles j, panels p, row_tiles i); the (panel_rows, FT)
    x panel rides a BlockSpec keyed on (p, j), so it loads ONCE per
    panel — total x traffic is n_pad*f_pad, vs the streaming-gather
    variant's nnzb*TB*FT duplicate reads (~42x on a degree-16 graph).
    Each (p, i) pair contracts only the blocks whose column tile falls
    in panel p (`ptr2` sub-ranges, precomputed by searchsorted over the
    globally (row, col)-sorted block keys); per-panel partial outputs
    land in (panels, n_pad, f_pad) and one fused XLA reduction sums
    them — trading 2*panels*n_pad*FT bytes of partial traffic for the
    elimination of the duplicate x gathers.
    """
    j = pl.program_id(0)
    p = pl.program_id(1)
    i = pl.program_id(2)
    del j
    tb = out_ref.shape[1]
    pt = x_ref.shape[0] // tb          # column tiles per panel
    start = ptr2_ref[i, p]
    end = ptr2_ref[i, p + 1]
    num = end - start
    nch = pl.cdiv(num, chunk)

    def scoped(vbuf, sems):
        def get_dma(slot, c):
            return pltpu.make_async_copy(
                vals_hbm.at[pl.ds(start + c * chunk, chunk)],
                vbuf.at[slot], sems.at[slot])

        @pl.when(nch > 0)
        def _():
            get_dma(0, 0).start()

        def chunk_body(c, acc):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < nch)
            def _():
                get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

            get_dma(slot, c).wait()
            base = start + c * chunk
            valid = num - c * chunk
            # overrun blocks (chunk rounding) may reference columns
            # outside this panel: clamp the local tile index and SELECT
            # their value blocks to zero (see _spmm_kernel)
            xcat = jnp.stack([
                x_ref[pl.ds(jnp.clip(
                    cols_ref[base + k] - p * pt, 0, pt - 1) * tb, tb), :]
                for k in range(chunk)
            ]).astype(vbuf.dtype)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, 1, 1), 0)
            vcat = jnp.where(lane < valid, vbuf[slot],
                             jnp.zeros_like(vbuf[slot]))
            return acc + jax.lax.dot_general(
                vcat, xcat,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).sum(axis=0)

        acc0 = jnp.zeros(out_ref.shape[1:], jnp.float32)
        out_ref[0] = jax.lax.fori_loop(0, nch, chunk_body, acc0).astype(
            out_ref.dtype)

    pl.run_scoped(
        scoped,
        pltpu.VMEM((2, chunk, tb, tb), vals_hbm.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    )


def _panel_ptr2(bcsr: BlockCSR, pt: int, panels: int) -> jnp.ndarray:
    """(rt, panels+1) absolute block-index boundaries of each row
    tile's per-panel column sub-ranges (device-side: no host pull of
    the block arrays, which is slow on tunneled backends)."""
    rt = bcsr.row_tiles
    ct = bcsr.n_pad // bcsr.tile
    nnzb = bcsr.block_vals.shape[0]
    bid = jnp.arange(nnzb, dtype=jnp.int32)
    rids = jnp.clip(
        jnp.searchsorted(bcsr.block_ptr, bid, side="right") - 1, 0, rt - 1)
    # blocks are globally (row, col)-sorted -> composite keys ascend;
    # chunk-padding blocks past ptr[-1] get the sentinel rt*ct, one
    # past the largest possible query (int32 throughout: rt*ct fits —
    # an int64 sentinel would silently truncate without jax_enable_x64)
    key = rids.astype(jnp.int32) * ct + bcsr.block_cols
    key = jnp.where(bid < bcsr.block_ptr[-1], key, jnp.int32(rt * ct))
    q = (jnp.arange(rt, dtype=jnp.int32)[:, None] * ct
         + jnp.minimum(jnp.arange(panels + 1, dtype=jnp.int32) * pt, ct))
    return jnp.searchsorted(key, q.reshape(-1)).reshape(
        rt, panels + 1).astype(jnp.int32)


def _spmm_panel(bcsr: BlockCSR, x_pad: jnp.ndarray,
                feat_tile: int) -> jnp.ndarray:
    """Panel-resident large-N path; x_pad: (n_pad, f_pad)."""
    n_pad, f_pad = x_pad.shape
    tb = bcsr.tile
    pt = max(1, _STRIPE_VMEM_BUDGET // (feat_tile * 4) // tb)
    ct = n_pad // tb
    panels = -(-ct // pt)
    rows_pan = panels * pt * tb
    if rows_pan != n_pad:  # last panel padding
        x_pad = jnp.zeros((rows_pan, f_pad), x_pad.dtype
                          ).at[:n_pad].set(x_pad)
    ptr2 = _panel_ptr2(bcsr, pt, panels)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(f_pad // feat_tile, panels, bcsr.row_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # block_vals
            pl.BlockSpec((pt * tb, feat_tile),
                         lambda j, p, i, *_: (p, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, feat_tile),
                               lambda j, p, i, *_: (p, i, j),
                               memory_space=pltpu.VMEM),
    )
    nnzb = bcsr.nnzb_logical
    vb = bcsr.block_vals.dtype.itemsize
    chunk = _pick_chunk(nnzb, bcsr.row_tiles * panels)
    partial = pl.pallas_call(
        functools.partial(_spmm_kernel_panel, chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((panels, n_pad, f_pad),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nnzb * tb * tb * f_pad,
            bytes_accessed=(nnzb * tb * tb * vb * (f_pad // feat_tile)
                            + rows_pan * f_pad * 4
                            + panels * n_pad * f_pad * 4),
            transcendentals=0),
    )(ptr2, bcsr.block_cols, bcsr.block_vals, x_pad)
    return partial.sum(axis=0).astype(x_pad.dtype)


# Largest per-panel partial-sum buffer the panel variant may allocate.
_PANEL_PARTIALS_CAP = 512 * 1024 * 1024


def _spmm_padded(bcsr: BlockCSR, x_pad: jnp.ndarray,
                 feat_tile: int) -> jnp.ndarray:
    """out_pad = A_pad @ x_pad; x_pad: (n_pad, f_pad)."""
    n_pad, f_pad = x_pad.shape
    tb = bcsr.tile
    stream = n_pad * feat_tile * 4 > _STRIPE_VMEM_BUDGET
    if stream:
        # prefer the panel-resident variant when the duplicate x reads
        # it eliminates (nnzb*TB*FT per feature tile) exceed the
        # partial-sum traffic it adds (2*panels*n_pad*FT), and the
        # partials buffer is affordable
        nnzb = bcsr.nnzb_logical
        pt = max(1, _STRIPE_VMEM_BUDGET // (feat_tile * 4) // tb)
        panels = -(-(n_pad // tb) // pt)
        if (nnzb * tb > 2 * panels * n_pad
                and panels * n_pad * f_pad * 4 <= _PANEL_PARTIALS_CAP):
            return _spmm_panel(bcsr, x_pad, feat_tile)
        chunk = _pick_chunk(bcsr.nnzb_logical, bcsr.row_tiles)
        kernel = functools.partial(_spmm_kernel_stream, chunk)
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        chunk = _pick_chunk(bcsr.nnzb_logical, bcsr.row_tiles)
        kernel = functools.partial(_spmm_kernel, chunk)
        x_spec = pl.BlockSpec((n_pad, feat_tile), lambda i, j, *_: (0, j),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bcsr.row_tiles, f_pad // feat_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # block_vals
            x_spec,
        ],
        out_specs=pl.BlockSpec((tb, feat_tile), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM),
    )
    nnzb = bcsr.nnzb_logical
    vb = bcsr.block_vals.dtype.itemsize
    flops = 2 * nnzb * tb * tb * feat_tile
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), x_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=nnzb * tb * tb * vb + 2 * n_pad * f_pad * 4,
            transcendentals=0),
    )(bcsr.block_ptr, bcsr.block_cols, bcsr.block_vals, x_pad)


def _choose_feat_tile(n_pad: int, f: int) -> int:
    """Largest feature tile (<= 512) that keeps the x stripe VMEM-
    resident; blocks are re-streamed once per feature tile, so a wider
    tile divides the adjacency traffic for wide activations (the model
    path folds B*T*C into f). Falls back to the widest tile for the
    streaming-gather variant when no stripe fits."""
    cap = _round_up(min(f, 512), 128)
    for ft in (512, 384, 256, 128):
        if ft <= cap and n_pad * ft * 4 <= _STRIPE_VMEM_BUDGET:
            return ft
    return cap


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def spmm(bcsr: BlockCSR, bcsr_t: BlockCSR, x: jnp.ndarray) -> jnp.ndarray:
    """A @ x over the node axis. x: (..., N, C); returns (..., N, C).

    `bcsr_t` is `bcsr.transpose()` (precompute once per graph — it
    defines the backward SpMM). Leading dims are flattened into the
    feature axis so one kernel call covers the whole batch.
    """
    return _spmm_impl(bcsr, x)


def _spmm_impl(bcsr: BlockCSR, x: jnp.ndarray) -> jnp.ndarray:
    *lead, n, c = x.shape
    assert n == bcsr.n, (n, bcsr.n)
    flat = jnp.moveaxis(x.reshape(-1, n, c), 1, 0).reshape(n, -1)
    f = flat.shape[1]
    feat_tile = _choose_feat_tile(bcsr.n_pad, f)
    f_pad = _round_up(f, feat_tile)
    if n == bcsr.n_pad and f == f_pad:
        x_pad = flat                 # aligned node-major caller: no copy
    else:
        x_pad = jnp.zeros((bcsr.n_pad, f_pad), x.dtype)
        x_pad = x_pad.at[:n, :f].set(flat)
    out = _spmm_padded(bcsr, x_pad, feat_tile)[:n, :f]
    out = jnp.moveaxis(out.reshape(n, -1, c), 0, 1).reshape(*lead, n, c)
    return out


def _dvals_kernel(rids_ref, cols_ref, g_ref, x_ref, out_ref):
    del rids_ref, cols_ref  # consumed by the index maps
    j = pl.program_id(1)
    blk = jax.lax.dot_general(
        g_ref[:], x_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[0] = blk

    @pl.when(j > 0)
    def _():
        out_ref[0] += blk


def _spmm_dvals(bcsr: BlockCSR, g: jnp.ndarray,
                x: jnp.ndarray) -> jnp.ndarray:
    """d block_vals[b] = dY[row-tile b] @ X[col-tile b]^T.

    g, x: (..., N, C) cotangent / saved input. Returns (nnzb, TB, TB)
    with the _pad_chunk padding blocks zeroed.
    """
    tb = bcsr.tile
    rt = bcsr.row_tiles
    nnzb = bcsr.block_vals.shape[0]

    def flatten(t):
        *_, n, c = t.shape
        flat = jnp.moveaxis(t.reshape(-1, n, c), 1, 0).reshape(n, -1)
        return flat

    gf, xf = flatten(g), flatten(x)
    f = gf.shape[1]
    feat_tile = 128 if f % 128 == 0 else _round_up(min(f, 512), 128)
    f_pad = _round_up(f, feat_tile)

    def pad(t):
        out = jnp.zeros((bcsr.n_pad, f_pad), jnp.float32)
        return out.at[: t.shape[0], :f].set(t.astype(jnp.float32))

    # block-row ids from the (possibly traced) ptr; clamp the padding
    # blocks into range and zero their output after the kernel
    bid = jnp.arange(nnzb, dtype=jnp.int32)
    rids = jnp.clip(
        jnp.searchsorted(bcsr.block_ptr, bid, side="right") - 1, 0, rt - 1
    ).astype(jnp.int32)
    valid = (bid < bcsr.block_ptr[-1]).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnzb, f_pad // feat_tile),
        in_specs=[
            pl.BlockSpec((tb, feat_tile),
                         lambda b, j, rids, cols: (rids[b], j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, feat_tile),
                         lambda b, j, rids, cols: (cols[b], j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, tb),
                               lambda b, j, rids, cols: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    dvals = pl.pallas_call(
        _dvals_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nnzb, tb, tb), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nnzb * tb * tb * f_pad,
            bytes_accessed=(2 * nnzb * tb * f_pad + nnzb * tb * tb) * 4,
            transcendentals=0),
    )(rids, bcsr.block_cols, pad(gf), pad(xf))
    return dvals * valid[:, None, None]


def _spmm_fwd(bcsr, bcsr_t, x):
    return _spmm_impl(bcsr, x), (bcsr, bcsr_t, x)


def _spmm_bwd(res, g):
    bcsr, bcsr_t, x = res
    d_bcsr = jax.tree.map(jnp.zeros_like, bcsr)
    d_bcsr = dataclasses.replace(
        d_bcsr,
        block_vals=_spmm_dvals(bcsr, g, x).astype(bcsr.block_vals.dtype))
    d_bcsr_t = jax.tree.map(jnp.zeros_like, bcsr_t)
    return (d_bcsr, d_bcsr_t, _spmm_impl(bcsr_t, g))


spmm.defvjp(_spmm_fwd, _spmm_bwd)


# --------------------------------------------------------------------------
# Diagonal-band (DIA) variant — banded graphs after the hybrid split
# --------------------------------------------------------------------------
#
# Once straggler edges ride the COO tail, the remaining blocks of a
# road graph are a narrow tile-diagonal band (RCM ordering makes this
# typical, not special). The general kernels pay for generality: the
# resident-stripe variant caps at ~16k nodes of VMEM, and the
# streaming-gather variant re-reads each x tile once per referencing
# row tile (~(2W+1)x for half-bandwidth W) through per-block dynamic
# DMAs. The DIA layout stores the band as (row_tiles, 2W+1, TB, TB)
# and feeds the kernel x through 2W+1 statically-indexed BlockSpecs
# (i+d-W, clamped) — no scalar prefetch, no dynamic slicing, one
# K=(2W+1)*TB MXU contraction per (row tile, feature tile). Out-of-
# range window blocks are harmless: their value blocks are structural
# zeros by construction.


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DIABand:
    """Tile-diagonal band storage: vals[i, d] is block (i, i + d - w)."""

    vals: jnp.ndarray    # (row_tiles, 2w+1, TB, TB)
    w: int               # half-bandwidth in tiles
    n: int
    n_pad: int
    tile: int

    def tree_flatten(self):
        return ((self.vals,), (self.w, self.n, self.n_pad, self.tile))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def row_tiles(self) -> int:
        return self.n_pad // self.tile


# Widest band the DIA path accepts (2*w+1 diagonals of VMEM-resident
# x blocks + the vals block per grid step; w=5 -> ~1.4 MB at ft=128).
_DIA_MAX_W = 5
# Minimum fraction of the band's block slots that must be nonzero —
# below this DIA streams too many structural-zero blocks and the
# general block-CSR kernels win.
_DIA_MIN_FILL = 0.4


def dia_pair_from_coo(rows: np.ndarray, cols: np.ndarray,
                      vals: np.ndarray, n: int, tile: int = 128,
                      vals_dtype=jnp.float32
                      ) -> tuple["DIABand", "DIABand"] | None:
    """(A, A^T) in DIA layout, or None when the edge set is not a
    narrow/dense-enough tile band."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    if rows.size == 0:
        return None
    n_pad = _round_up(n, tile)
    rt = n_pad // tile
    br, bc = rows // tile, cols // tile
    d = bc - br
    w = int(max(d.max(), -d.min()))
    if w > _DIA_MAX_W:
        return None
    nblocks = np.unique(br * rt + bc).size
    if nblocks < _DIA_MIN_FILL * min(rt * (2 * w + 1), rt * rt):
        return None
    dense = np.zeros((rt, 2 * w + 1, tile, tile), np.float32)
    np.add.at(dense, (br, d + w, rows % tile, cols % tile),
              vals.astype(np.float32))
    a = DIABand(jnp.asarray(dense, vals_dtype), w, n, n_pad, tile)
    # A^T: block (i, i+d-w)^T lands at row i+d-w, diagonal -d
    dense_t = np.zeros_like(dense)
    for dd in range(2 * w + 1):
        off = dd - w
        src = dense[:, dd].transpose(0, 2, 1)   # (rt, TB, TB)
        if off >= 0:
            dense_t[off:rt, 2 * w - dd][: rt - off] = src[: rt - off]
        else:
            dense_t[: rt + off, 2 * w - dd] = src[-off:]
    at = DIABand(jnp.asarray(dense_t, vals_dtype), w, n, n_pad, tile)
    return a, at


def _dia_kernel(ndiag, vals_ref, *refs):
    *x_refs, out_ref = refs
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for d in range(ndiag):
        acc += jax.lax.dot(vals_ref[0, d],
                           x_refs[d][:].astype(vals_ref.dtype),
                           preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _dia_feat_tile(dia: DIABand, f: int, x_itemsize: int = 4) -> int:
    """Feature tile minimizing total traffic: x-window bytes scale
    with round_up(f, ft) — (2w+1)+1 passes over the padded width at
    the activation's own itemsize — while the band re-streams once per
    feature tile. A model fold of B*T*C lands on awkward widths (e.g.
    520), where ft=512 pads the dominant x term 2x; picking by the
    byte model instead of "widest tile" recovers it."""
    ndiag = 2 * dia.w + 1
    band = dia.row_tiles * ndiag * dia.tile * dia.tile \
        * dia.vals.dtype.itemsize

    def cost(ft):
        f_pad = _round_up(f, ft)
        return ((ndiag + 1) * dia.n_pad * f_pad * x_itemsize
                + band * (f_pad // ft))

    return min((512, 384, 256, 128), key=cost)


def _dia_kernel_ring(ndiag, w, vals_ref, x_hbm, out_ref, ring, sems):
    """Ring-buffered DIA: x column blocks load ONCE each (the BlockSpec
    variant re-reads every block 2w+1 times — once per window spec).

    grid = (feat_tiles, row_tiles) with row tiles innermost; `ring`
    holds R = 2w+2 (TB, FT) x blocks persistent across grid steps. At
    step i the live window is blocks [i-w, i+w] and block i+1+w
    prefetches into the slot block i-w-1 just vacated (R consecutive
    block ids map to distinct slots; sequential grid execution makes
    the overwrite safe). Out-of-range ids clamp — their value blocks
    are structural zeros, so the product contributes nothing."""
    jf = pl.program_id(0)
    i = pl.program_id(1)
    rt = pl.num_programs(1)          # static
    tb = out_ref.shape[0]
    ft = out_ref.shape[1]
    R = ndiag + 1

    def dma(slot, blk):
        # blk may be traced; clamp into range (out-of-range window
        # positions multiply structural-zero value blocks anyway)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(jnp.clip(blk, 0, rt - 1) * tb, tb),
                     pl.ds(jf * ft, ft)],
            ring.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        # prologue (re-runs at each new feature tile): the step-0
        # window -w..w only — the step-1 lookahead (block w+1) is
        # started by step 0's own epilogue, exactly like every later
        # step's (starting it here too would double-signal its slot)
        for b in range(-w, w + 1):
            dma((b + R) % R, b).start()
        for b in range(-w, w + 1):
            dma((b + R) % R, b).wait()

    @pl.when(i > 0)
    def _():
        # the current step's leading block was prefetched by step i-1
        slot = jax.lax.rem(i + w + R, R)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, tb), pl.ds(jf * ft, ft)],
            ring.at[slot], sems.at[slot]).wait()

    @pl.when(i + 1 < rt)
    def _():
        # start the next step's lookahead BEFORE the dots so the DMA
        # overlaps compute; its slot held block i-w-1, last read at
        # step i-1 (block ids i-w..i+1+w are R consecutive ids and map
        # to distinct slots)
        dma(jax.lax.rem(i + 1 + w + R, R), i + 1 + w).start()

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for d in range(ndiag):
        slot = jax.lax.rem(i + d - w + R, R)
        acc += jax.lax.dot(vals_ref[0, d],
                           ring[slot].astype(vals_ref.dtype),
                           preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


# Opt-in for the ring-buffered DIA variant (x blocks load once each
# instead of once per window spec — saves 2w/(2w+1)+1... of the x
# traffic). Kept off by default until its on-chip numbers beat the
# BlockSpec variant's recorded rows. Read ONCE at import (ADVICE r4:
# a trace-time read silently ignored mid-process flips after a jitted
# step was compiled and cached, and mixed traced shapes could run
# different variants in one process); tests monkeypatch
# `spmm._DIA_USE_RING` directly.
_DIA_RING_ENV = "GPTST_DIA_RING"
_DIA_USE_RING = bool(os.environ.get(_DIA_RING_ENV))


def _dia_ring_call(dia: DIABand, x_pad: jnp.ndarray,
                   feat_tile: int) -> jnp.ndarray:
    tb, w = dia.tile, dia.w
    ndiag = 2 * w + 1
    rt = dia.row_tiles
    n_pad, f_pad = x_pad.shape
    vb = dia.vals.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_dia_kernel_ring, ndiag, w),
        grid=(f_pad // feat_tile, rt),
        in_specs=[
            pl.BlockSpec((1, ndiag, tb, tb),
                         lambda jf, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # x stays in HBM
        ],
        out_specs=pl.BlockSpec((tb, feat_tile), lambda jf, i: (i, jf),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), x_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((ndiag + 1, tb, feat_tile), x_pad.dtype),
            pltpu.SemaphoreType.DMA((ndiag + 1,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rt * ndiag * tb * tb * f_pad,
            bytes_accessed=(rt * ndiag * tb * tb * vb
                            * (f_pad // feat_tile)
                            + 2 * n_pad * f_pad * x_pad.dtype.itemsize),
            transcendentals=0),
    )(dia.vals, x_pad)


def _dia_impl(dia: DIABand, x: jnp.ndarray) -> jnp.ndarray:
    *lead, n, c = x.shape
    assert n == dia.n, (n, dia.n)
    flat = jnp.moveaxis(x.reshape(-1, n, c), 1, 0).reshape(n, -1)
    f = flat.shape[1]
    feat_tile = _dia_feat_tile(dia, f, x.dtype.itemsize)
    f_pad = _round_up(f, feat_tile)
    if n == dia.n_pad and f == f_pad:
        # node-major aligned caller (e.g. the concat-free graph-GRU at
        # B*U a multiple of 128): the pad would be an identity copy —
        # a full read+write pass over the operand per application —
        # so skip it. This is what makes the node-major cell layout
        # pay off: zero glue bytes around the kernel.
        x_pad = flat
    else:
        x_pad = jnp.zeros((dia.n_pad, f_pad), x.dtype)
        x_pad = x_pad.at[:n, :f].set(flat)

    if _DIA_USE_RING:
        out = _dia_ring_call(dia, x_pad, feat_tile)
        out = out[:n, :f]
        return jnp.moveaxis(out.reshape(n, -1, c), 0, 1).reshape(
            *lead, n, c)

    tb, w = dia.tile, dia.w
    ndiag = 2 * w + 1
    rt = dia.row_tiles

    def x_spec(d):
        return pl.BlockSpec(
            (tb, feat_tile),
            lambda i, j, d=d: (jnp.clip(i + d - w, 0, rt - 1), j),
            memory_space=pltpu.VMEM)

    vb = dia.vals.dtype.itemsize
    out = pl.pallas_call(
        functools.partial(_dia_kernel, ndiag),
        grid=(rt, f_pad // feat_tile),
        in_specs=[
            pl.BlockSpec((1, ndiag, tb, tb), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[x_spec(d) for d in range(ndiag)],
        ],
        out_specs=pl.BlockSpec((tb, feat_tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dia.n_pad, f_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rt * ndiag * tb * tb * f_pad,
            bytes_accessed=(rt * ndiag * tb * tb * vb
                            * (f_pad // feat_tile)
                            + (ndiag + 1) * dia.n_pad * f_pad
                            * x_pad.dtype.itemsize),
            transcendentals=0),
    )(dia.vals, *([x_pad] * ndiag))
    out = out[:n, :f]
    return jnp.moveaxis(out.reshape(n, -1, c), 0, 1).reshape(*lead, n, c)


@jax.custom_vjp
def dia_matmul(dia: DIABand, dia_t: DIABand, x: jnp.ndarray) -> jnp.ndarray:
    """A @ x for a DIA-banded adjacency. x: (..., N, C). The band is a
    constant graph artifact — no cotangent flows to the band values
    (learned adjacencies take the block-CSR/SDDMM path)."""
    return _dia_impl(dia, x)


def _dia_fwd(dia, dia_t, x):
    return _dia_impl(dia, x), (dia, dia_t)


def _dia_bwd(res, g):
    dia, dia_t = res
    zero = jax.tree.map(jnp.zeros_like, dia)
    zero_t = jax.tree.map(jnp.zeros_like, dia_t)
    return (zero, zero_t, _dia_impl(dia_t, g))


dia_matmul.defvjp(_dia_fwd, _dia_bwd)


# --------------------------------------------------------------------------
# Hybrid block + COO representation
# --------------------------------------------------------------------------
#
# Real sensor graphs are banded-local PLUS a few percent long-range
# links (`scripts/spmm_bench.py:road_graph_edges` models this). Under
# 128x128 block tiling the long-range edges land one-per-block: at
# N=64k a degree-16 graph stores ~21k nearly-EMPTY blocks next to
# ~1.3k well-filled banded ones, and the empty blocks dominate the
# streamed bytes ~10x (VERDICT r3 weak #3 — the 64k SoL gap is the
# byte model itself, not kernel inefficiency). The TPU-idiomatic split:
# keep well-filled blocks on the MXU block-CSR path, route straggler
# edges through an XLA gather + segment-sum — O(edges * C) bytes
# instead of O(blocks * TB^2).


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class COOTail:
    """Straggler edges as sorted COO (device-resident)."""

    rows: jnp.ndarray   # (e,) int32, sorted
    cols: jnp.ndarray   # (e,) int32
    vals: jnp.ndarray   # (e,) float32
    n: int

    def tree_flatten(self):
        return ((self.rows, self.cols, self.vals), (self.n,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def nnz(self) -> int:
        return self.vals.shape[0]


def _coo_impl(coo: COOTail, x: jnp.ndarray) -> jnp.ndarray:
    """coo @ x via gather + segment_sum. Accumulates in f32 and
    returns x.dtype, so bf16 activations keep their dtype through the
    hybrid sum (a promoted output would break scan carries)."""
    xg = jnp.take(x, coo.cols, axis=-2).astype(jnp.float32)  # (..., e, C)
    xg = xg * coo.vals[:, None]
    xg = jnp.moveaxis(xg, -2, 0)                 # (e, ..., C)
    out = jax.ops.segment_sum(xg, coo.rows, num_segments=x.shape[-2])
    return jnp.moveaxis(out, 0, -2).astype(x.dtype)


@jax.custom_vjp
def coo_matmul(coo: COOTail, coo_t: COOTail, x: jnp.ndarray) -> jnp.ndarray:
    """coo @ x over the node axis. x: (..., N, C); `coo_t` is the
    transposed tail (built alongside by `split_coo_hybrid`).

    Custom VJP: dx = coo_t @ g as another gather + segment_sum. Plain
    AD would transpose the forward's gather into a scatter-add, which
    TPUs serialize — the transposed-tail formulation keeps the backward
    on the same vectorized path as the forward. The tail is a constant
    graph artifact: no cotangent flows to the edge values (learned
    adjacencies ride the block-CSR/SDDMM path, never the tail)."""
    return _coo_impl(coo, x)


def _coo_fwd(coo, coo_t, x):
    return _coo_impl(coo, x), (coo, coo_t)


def _coo_bwd(res, g):
    coo, coo_t = res
    return (jax.tree.map(jnp.zeros_like, coo),
            jax.tree.map(jnp.zeros_like, coo_t),
            _coo_impl(coo_t, g))


coo_matmul.defvjp(_coo_fwd, _coo_bwd)


def _coo_split_edges(tile: int) -> int:
    """Blocks holding fewer edges than this ride the COO tail. Byte
    model: a stored block costs TB^2*vb per feature-tile pass (~128f
    bytes at TB=128, feat_tile=512); a COO edge costs ~2*f*4 gather +
    scatter traffic, so the crossover sits at TB^2*vb/(8*feat_tile) ~
    16-64 edges at TB=128 — 32 is the middle of that range, scaled
    quadratically for other tiles."""
    return max(1, tile * tile // 512)


def coo_split_mask(rows: np.ndarray, cols: np.ndarray, n: int,
                   tile: int = 128,
                   min_edges: int | None = None) -> np.ndarray:
    """Boolean mask: True for edges whose block is dense enough for
    the block path (shared by `split_coo_hybrid` and the DIA builder
    in `ops/graph_conv.make_support_coo`)."""
    if min_edges is None:
        min_edges = _coo_split_edges(tile)
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    rt = _round_up(n, tile) // tile
    key = (rows // tile) * rt + cols // tile
    _, inv, counts = np.unique(key, return_inverse=True,
                               return_counts=True)
    return counts[inv] >= min_edges


def split_coo_hybrid(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                     n: int, tile: int = 128,
                     min_edges: int | None = None,
                     vals_dtype=jnp.float32,
                     mask: np.ndarray | None = None,
                     build_blocks: bool = True):
    """Partition an edge list into (BlockCSR A, A^T, COOTail, COOTail^T).

    Edges whose (row-tile, col-tile) block holds >= min_edges edges go
    to the block path; the rest form the COO tail. Either part may be
    empty (an empty tail returns None; an empty block part yields the
    1-zero-block BlockCSR `_from_blocks` already emits). Pass a
    precomputed `mask` (from `coo_split_mask`) to skip recomputing it;
    `build_blocks=False` returns placeholder 1-zero-block CSRs for the
    block slots (used when a DIA band supersedes the block kernels —
    uploading ~100 MB of never-read block values wastes HBM).
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float32)
    dense = (coo_split_mask(rows, cols, n, tile, min_edges)
             if mask is None else mask)
    if build_blocks:
        a, at = BlockCSR.pair_from_coo(rows[dense], cols[dense],
                                       vals[dense], n, tile, vals_dtype)
    else:
        empty = np.zeros(0, np.int64)
        a, at = BlockCSR.pair_from_coo(empty, empty,
                                       np.zeros(0, np.float32), n, tile,
                                       vals_dtype)
    if dense.all():
        return a, at, None, None
    r, c, v = rows[~dense], cols[~dense], vals[~dense]
    o = np.lexsort((c, r))
    coo = COOTail(jnp.asarray(r[o], jnp.int32), jnp.asarray(c[o], jnp.int32),
                  jnp.asarray(v[o], jnp.float32), n)
    ot = np.lexsort((r, c))
    coo_t = COOTail(jnp.asarray(c[ot], jnp.int32),
                    jnp.asarray(r[ot], jnp.int32),
                    jnp.asarray(v[ot], jnp.float32), n)
    return a, at, coo, coo_t
