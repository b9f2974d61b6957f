"""Graph convolution primitives.

All graph aggregation in the framework flows through `graph_matmul`,
which dispatches on the support representation:

  * plain (N, N) array — dense einsum straight onto the MXU; the
    default at reference scale (N <= 266) and for learned/adaptive
    adjacencies;
  * `SparseSupport` — block-CSR Pallas SpMM
    (`gptst_tpu/kernels/spmm.py`) for large graphs, with an optional
    RCM node reordering that concentrates nonzero blocks.

`make_support` picks the representation from the node count, so model
code is representation-agnostic — the same predictor runs dense at
N=170 and block-sparse at N=64k.

Layout everywhere: x is (B, T, N, C) (or (B, N, C) for recurrent
cells), supports act on the N axis.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gptst_tpu.kernels.spmm import (
    BlockCSR, COOTail, DIABand, coo_matmul, coo_split_mask,
    dia_matmul, dia_pair_from_coo, spmm, split_coo_hybrid,
)

# Build-time sharding context: when a model is built under
# `use_sharding_mesh(mesh)`, every `make_support` call routes graph
# aggregation through the explicit node-sharded collective paths
# (ring / halo exchange) on that mesh's 'graph' axis.
_ACTIVE_MESH = None


@contextlib.contextmanager
def use_sharding_mesh(mesh):
    global _ACTIVE_MESH
    prev, _ACTIVE_MESH = _ACTIVE_MESH, mesh
    try:
        yield
    finally:
        _ACTIVE_MESH = prev

# Below this node count a dense (N, N) einsum beats the block-sparse
# kernel. Measured crossover (scripts/crossover_bench.py, banded
# degree-16 road graphs, TPU v5e, anchored timing): dense wins by
# 4-6x through N=2048 and stays ahead through ~8k when the operand is
# loop-resident (XLA hoists a one-time bf16 convert); in model use the
# dense support streams N^2 * 4 bytes per call, which crosses the
# block-CSR kernel's byte count (nnzb * TB^2 * 4) near N~4-6k for this
# graph family — so 4096 is the default, overridable per graph via
# `make_support(dense_threshold=...)` (denser or more scattered graphs
# favor dense longer; HBM capacity caps dense at ~32k regardless).
DENSE_THRESHOLD = 4096


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseSupport:
    """Block-CSR adjacency (+ its transpose, for the VJP), optionally
    behind an RCM node permutation (`gptst_tpu/graph/partition.py`),
    optionally with a COO straggler tail (edges whose blocks are too
    empty to justify streaming a full TB^2 value block — see
    `kernels/spmm.py:split_coo_hybrid`).

    With a permutation, `graph_matmul` computes Pᵀ (A_perm @ (P x)) so
    callers keep the original node order.
    """

    bcsr: BlockCSR
    bcsr_t: BlockCSR
    perm: jnp.ndarray | None = None      # (N,) permuted pos -> original
    inv_perm: jnp.ndarray | None = None
    coo: COOTail | None = None
    coo_t: COOTail | None = None
    # DIA band for the block part when it is a narrow tile-diagonal
    # band (typical for road graphs after RCM + the hybrid split);
    # `graph_matmul` prefers it over the block-CSR kernels. When set,
    # `bcsr`/`bcsr_t` are 1-zero-block placeholders (never read) —
    # consumers needing the block structure (e.g. an SDDMM pattern)
    # must build their own from the edge list.
    dia: DIABand | None = None
    dia_t: DIABand | None = None

    def tree_flatten(self):
        return ((self.bcsr, self.bcsr_t, self.perm, self.inv_perm,
                 self.coo, self.coo_t, self.dia, self.dia_t), ())

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def T(self) -> "SparseSupport":
        return SparseSupport(self.bcsr_t, self.bcsr, self.perm,
                             self.inv_perm, self.coo_t, self.coo,
                             self.dia_t, self.dia)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.bcsr.n, self.bcsr.n)


def _count_blocks(rows: np.ndarray, cols: np.ndarray, tile: int) -> int:
    pairs = (rows // tile).astype(np.int64) * (1 << 32) + cols // tile
    return int(np.unique(pairs).size)


@dataclasses.dataclass(frozen=True)
class ShardedSupport:
    """Node-sharded aggregation over a device mesh's 'graph' axis with
    *explicit* collectives (`gptst_tpu/parallel/halo.py`): `fn` is the
    shard_map'd A@x (boundary all_to_all halo exchange, or the ring
    collective matmul for halo-heavy graphs), chosen from the
    partition's measured traffic (`graph/partition.py:partition_stats`).

    `graph_matmul` pads x's node axis to `n_pad` and slices back, so
    model code is oblivious — the same predictor trains single-device
    dense and node-sharded across chips (SURVEY §2.5).
    """

    fn: object                # callable (..., n_pad, C) -> (..., n_pad, C)
    n: int
    n_pad: int
    kind: str                 # 'halo' | 'ring'

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n, self.n)


def make_sharded_support(adj: np.ndarray | None, mesh,
                         part=None) -> ShardedSupport:
    """Partition `adj` over the mesh's 'graph' axis and pick the
    cheaper explicit-collective path by modeled interconnect traffic:
    boundary halo exchange when the partition is local (banded road
    graphs after RCM ordering), the ring collective matmul otherwise.

    Pass a prebuilt `GraphPartition` (`graph/partition.py`, e.g. from
    `partition_graph_coo` for graphs too big to densify) to skip the
    dense partitioning; the ring fallback needs the dense `adj`.
    """
    from gptst_tpu.graph.partition import partition_graph, partition_stats
    from gptst_tpu.parallel.halo import make_halo_spmm, make_ring_spmm
    from gptst_tpu.parallel.mesh import GRAPH_AXIS

    parts = mesh.shape[GRAPH_AXIS]
    if part is None:
        # reorder=False: model node order is dataset order (node-indexed
        # params, metrics, labels all use it); a permuted layout would
        # need cross-shard gathers on every call
        part = partition_graph(adj, parts, reorder=False)
    stats = partition_stats(part)
    if adj is None or stats["halo_rows_moved"] <= stats["ring_rows_moved"]:
        fn, n_pad = make_halo_spmm(mesh, part)
        kind = "halo"
    else:
        fn, n_pad = make_ring_spmm(mesh, adj)
        kind = "ring"
    return ShardedSupport(fn=fn, n=part.n, n_pad=n_pad, kind=kind)


def make_support(adj: np.ndarray, *, dense_threshold: int = DENSE_THRESHOLD,
                 tile: int = 128, reorder: bool = True, mesh=None,
                 hybrid: bool = True):
    """Pick the aggregation representation for a precomputed support.

    Dense jnp array for small graphs; `SparseSupport` (block-CSR for
    the Pallas SpMM) above the threshold. With `reorder=True` an RCM
    node ordering is tried and kept only if it actually reduces the
    nonzero block count (>10% — it helps banded/road graphs presented
    in scrambled order, but cannot help expander-like graphs, where
    the identity order avoids the runtime permutation gathers).
    `hybrid=True` (default) routes edges in nearly-empty blocks through
    the COO gather tail instead of streaming full value blocks.

    With a `mesh` whose 'graph' axis is >1, aggregation instead runs
    node-sharded through the explicit-collective paths
    (`make_sharded_support`) regardless of size.
    """
    n = adj.shape[0]
    if mesh is None:
        mesh = _ACTIVE_MESH
    if mesh is not None:
        from gptst_tpu.parallel.mesh import GRAPH_AXIS

        if mesh.shape[GRAPH_AXIS] > 1:
            return make_sharded_support(np.asarray(adj), mesh)
    if n <= dense_threshold:
        return jnp.asarray(adj, jnp.float32)
    adj = np.asarray(adj)
    rows, cols = np.nonzero(adj)
    return make_support_coo(rows, cols, adj[rows, cols], n, tile=tile,
                            reorder=reorder, hybrid=hybrid)


def make_support_coo(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                     n: int, *, tile: int = 128, reorder: bool = True,
                     hybrid: bool = True,
                     vals_dtype=jnp.float32) -> SparseSupport:
    """`SparseSupport` straight from an edge list (no dense (N, N)
    materialization — required beyond ~16k nodes)."""
    perm = inv_perm = None
    if reorder:
        from gptst_tpu.graph.partition import rcm_order_coo

        p = rcm_order_coo(rows, cols, n)
        inv = np.empty_like(p)
        inv[p] = np.arange(n)
        if (_count_blocks(inv[rows], inv[cols], tile)
                < 0.9 * _count_blocks(rows, cols, tile)):
            rows, cols = inv[rows], inv[cols]
            perm = jnp.asarray(p, jnp.int32)
            inv_perm = jnp.asarray(inv, jnp.int32)
    dia = dia_t = None
    if hybrid:
        # DIA layout for the block part when it forms a narrow dense
        # tile band (the constant-artifact fast path; `kernels/spmm.py`).
        # When DIA takes over, the block-CSR slots hold 1-zero-block
        # placeholders — uploading the band twice would waste ~2x the
        # adjacency bytes of HBM for kernels that never run.
        mask = coo_split_mask(rows, cols, n, tile)
        pair = dia_pair_from_coo(rows[mask], cols[mask], vals[mask], n,
                                 tile, vals_dtype)
        if pair is not None:
            dia, dia_t = pair
        bcsr, bcsr_t, coo, coo_t = split_coo_hybrid(
            rows, cols, vals, n, tile=tile, vals_dtype=vals_dtype,
            mask=mask, build_blocks=pair is None)
    else:
        bcsr, bcsr_t = BlockCSR.pair_from_coo(rows, cols, vals, n, tile,
                                              vals_dtype)
        coo = coo_t = None
    return SparseSupport(bcsr, bcsr_t, perm, inv_perm, coo, coo_t,
                         dia, dia_t)


def graph_matmul(support, x: jnp.ndarray) -> jnp.ndarray:
    """support @ x over the node axis.

    support: (N, N) array or `SparseSupport`; x: (..., N, C). Dense:
    one MXU matmul per leading batch. Sparse: block-CSR Pallas SpMM
    (leading dims fold into the feature axis inside the kernel call).
    """
    if isinstance(support, ShardedSupport):
        n = x.shape[-2]
        if n != support.n_pad:
            pad = [(0, 0)] * x.ndim
            pad[-2] = (0, support.n_pad - n)
            x = jnp.pad(x, pad)
        out = support.fn(x)
        return out[..., :n, :] if n != support.n_pad else out
    if isinstance(support, SparseSupport):
        if support.perm is not None:
            x = jnp.take(x, support.perm, axis=-2)
        if support.dia is not None:
            out = dia_matmul(support.dia, support.dia_t, x)
        else:
            out = spmm(support.bcsr, support.bcsr_t, x)
        if support.coo is not None:
            out = out + coo_matmul(support.coo, support.coo_t, x)
        if support.inv_perm is not None:
            out = jnp.take(out, support.inv_perm, axis=-2)
        return out
    return jnp.einsum("nm,...mc->...nc", support, x)


def cheb_conv(x: jnp.ndarray, cheb_stack: jnp.ndarray,
              theta: jnp.ndarray, bias: jnp.ndarray | None = None
              ) -> jnp.ndarray:
    """Chebyshev spatial convolution with a precomputed polynomial stack.

    x: (B, T, N, Ci); cheb_stack: (K, N, N); theta: (Ci, Co, K);
    bias: (Co,) or None. Returns (B, T, N, Co).

    Matches STGCN's SpatioConvLayer (`model/STGCN/stgcn.py:76-77`):
      x_c  = einsum('knm,bitm->bitkn', Lk, x)
      x_gc = einsum('iok,bitkn->botn', theta, x_c) + b
    reshaped to channels-last.
    """
    xc = jnp.einsum("knm,btmi->btkni", cheb_stack, x)
    out = jnp.einsum("iok,btkni->btno", theta, xc)
    if bias is not None:
        out = out + bias
    return out


def diffusion_conv(x: jnp.ndarray, supports: list[jnp.ndarray],
                   weight: jnp.ndarray, bias: jnp.ndarray | None = None,
                   order: int = 2, include_self: bool = True) -> jnp.ndarray:
    """GWN-style diffusion convolution (`model/GWN/GWN.py:77-98`).

    Gathers [x, A1 x, A1^2 x, ..., Ak x, Ak^2 x, ...] along channels,
    then one dense projection. x: (..., N, Ci); each support (N, N);
    weight: ((1 + order*len(supports)) * Ci, Co).
    """
    feats = [x] if include_self else []
    for a in supports:
        h = x
        for _ in range(order):
            h = graph_matmul(a, h)
            feats.append(h)
    h = jnp.concatenate(feats, axis=-1)
    out = h @ weight
    if bias is not None:
        out = out + bias
    return out


def mixprop(x: jnp.ndarray, adj: jnp.ndarray, weight: jnp.ndarray,
            gdep: int, alpha: float) -> jnp.ndarray:
    """MTGNN MixProp propagation (`model/MTGNN/MTGNN.py:57-77`).

    h_{k} = alpha * x + (1 - alpha) * A_norm h_{k-1}; concatenate all
    hops then project. adj is row-normalized (A + I) / rowsum inside.
    x: (..., N, Ci); weight: ((gdep+1)*Ci, Co).
    """
    n = adj.shape[0]
    a = adj + jnp.eye(n, dtype=adj.dtype)
    d = a.sum(axis=1, keepdims=True)
    a = a / d
    h = x
    outs = [h]
    for _ in range(gdep):
        h = alpha * x + (1.0 - alpha) * graph_matmul(a, h)
        outs.append(h)
    return jnp.concatenate(outs, axis=-1) @ weight


def adaptive_adj(e1: jnp.ndarray, e2: jnp.ndarray) -> jnp.ndarray:
    """GWN adaptive adjacency softmax(relu(E1 @ E2)) (`GWN/GWN.py:238`).

    e1: (N, r), e2: (r, N). Returns (N, N) row-stochastic.
    """
    return jax.nn.softmax(jax.nn.relu(e1 @ e2), axis=1)


def mtgnn_graph(v1: jnp.ndarray, v2: jnp.ndarray,
                alpha: float, k: int) -> jnp.ndarray:
    """MTGNN learned directed graph with top-k sparsification
    (`model/MTGNN/MTGNN.py:149-202`).

    v1, v2: (N, d) linearly-transformed node embeddings.
    m_i = tanh(alpha * v_i); a = relu(tanh(alpha*(m1 m2^T - m2 m1^T))),
    keep top-k per row. Top-k is a static-shape threshold mask (XLA
    top_k), matching the reference's scatter-based mask.
    """
    m1 = jnp.tanh(alpha * v1)
    m2 = jnp.tanh(alpha * v2)
    a = jax.nn.relu(jnp.tanh(alpha * (m1 @ m2.T - m2 @ m1.T)))
    n = a.shape[0]
    if k >= n:
        return a
    # threshold at the k-th largest value per row (reference adds tiny
    # uniform noise to break ties; we rely on top_k's deterministic ties)
    kth = jax.lax.top_k(a, k)[0][:, -1:]
    return jnp.where(a >= kth, a, 0.0)
