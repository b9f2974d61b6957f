"""Spatially-partitioned graph aggregation with explicit collectives.

The GSPMD path (`gptst_tpu.parallel.spmd`) lets XLA place collectives
for node-sharded einsums. This module is the *explicit* scale-out
primitive (SURVEY.md §2.5): nodes are block-partitioned over the
'graph' mesh axis and `A @ X` runs as a ring collective matmul — each
step multiplies the local adjacency block column that matches the
x-shard currently held, then `ppermute`s the shard to the next device.
Compute on the resident shard overlaps the neighbor exchange (XLA
schedules the ppermute DMA concurrently with the matmul; on TPU the
transfer rides ICI). After P steps every device holds its output rows.

This is the TPU-native equivalent of the reference's (nonexistent)
distributed path — the reference is single-GPU (`model/Run.py:27`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gptst_tpu.graph.partition import GraphPartition
from gptst_tpu.parallel.mesh import GRAPH_AXIS


def _fold_nodes_first(x: jnp.ndarray) -> tuple[jnp.ndarray, tuple]:
    """(..., n, c) -> (n, prod(lead)*c) plus restore info."""
    *lead, n, c = x.shape
    flat = jnp.moveaxis(x.reshape(-1, n, c), 1, 0).reshape(n, -1)
    return flat, (tuple(lead), c)

def _unfold_nodes(flat: jnp.ndarray, info: tuple) -> jnp.ndarray:
    lead, c = info
    n = flat.shape[0]
    return jnp.moveaxis(flat.reshape(n, -1, c), 0, 1).reshape(*lead, n, c)


def partition_adjacency(adj: np.ndarray, parts: int) -> np.ndarray:
    """Pad N to a multiple of `parts` and return per-destination row
    blocks split by source shard: (parts, n_loc, parts, n_loc)."""
    n = adj.shape[0]
    n_loc = -(-n // parts)
    n_pad = n_loc * parts
    a = np.zeros((n_pad, n_pad), dtype=np.float32)
    a[:n, :n] = adj
    return a.reshape(parts, n_loc, parts, n_loc)


def _ring_spmm_local(a_blocks, x_local, axis_name: str):
    """Per-shard body: a_blocks (1, n_loc, P, n_loc);
    x_local (..., n_loc, C) — leading dims fold into features."""
    a_blocks = a_blocks[0]          # (n_loc, P, n_loc)
    xf, info = _fold_nodes_first(x_local)
    p = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    perm = [(i, (i - 1) % p) for i in range(p)]  # shift shards leftward

    def body(i, carry):
        acc, buf = carry
        src = jax.lax.rem(me + i, p)  # owner of the resident shard
        blk = jax.lax.dynamic_index_in_dim(a_blocks, src, axis=1,
                                           keepdims=False)  # (n_loc, n_loc)
        acc = acc + jnp.dot(blk, buf, preferred_element_type=jnp.float32)
        buf = jax.lax.ppermute(buf, axis_name, perm)
        return acc, buf

    # derive acc0 from the (axis-varying) input so the carry's varying
    # axes are consistent across iterations under shard_map VMA checks
    acc0 = (xf * 0).astype(jnp.float32)
    acc, _ = jax.lax.fori_loop(0, p, body, (acc0, xf))
    return _unfold_nodes(acc.astype(x_local.dtype), info)


def _node_spec(ndim: int) -> P:
    """PartitionSpec sharding axis -2 (nodes) over 'graph'."""
    return P(*([None] * (ndim - 2)), GRAPH_AXIS, None)


def make_ring_spmm(mesh: Mesh, adj: np.ndarray):
    """Build a jitted sharded `A @ x` for x: (..., N, C) node features.

    Returns (fn, n_pad): fn takes x padded to n_pad rows at axis -2,
    sharded (or shardable) over the 'graph' axis, and returns
    A_pad @ x_pad with the same sharding. Use `jax.device_put(x_pad,
    NamedSharding(mesh, P('graph', None)))` to place (N, C) inputs.
    Works nested inside an outer jit whose other axes (e.g. 'data')
    stay under GSPMD — only 'graph' is manual here.
    """
    parts = mesh.shape[GRAPH_AXIS]
    blocks = partition_adjacency(adj, parts)
    n_pad = blocks.shape[1] * parts
    blocks_j = jax.device_put(
        jnp.asarray(blocks),
        NamedSharding(mesh, P(GRAPH_AXIS, None, None, None)))
    manual = frozenset({GRAPH_AXIS}) if len(mesh.axis_names) > 1 else frozenset()

    @jax.jit
    def jitted(x):
        fn = jax.shard_map(
            functools.partial(_ring_spmm_local, axis_name=GRAPH_AXIS),
            mesh=mesh,
            in_specs=(P(GRAPH_AXIS, None, None, None), _node_spec(x.ndim)),
            out_specs=_node_spec(x.ndim),
            axis_names=manual,
        )
        return fn(blocks_j, x)

    return jitted, n_pad


def _halo_spmm_local(adj_loc, send_idx, halo_src, x_local, axis_name: str):
    """Boundary-only exchange + local dense aggregation.

    adj_loc (1, n_loc, n_loc+halo_max); send_idx (1, P, send_max);
    halo_src (1, halo_max); x_local (..., n_loc, C). Only the rows other
    shards actually read move over the interconnect (one all_to_all),
    vs the ring's full-shard circulation — the win is proportional to
    `partition_stats(...)['halo_frac']` (SURVEY §2.5: "halo exchange of
    boundary node features ... overlapped with local aggregation"; the
    overlap of the exchange with the local block's matmul is XLA's
    latency-hiding of independent ops).
    """
    adj_loc, send_idx, halo_src = adj_loc[0], send_idx[0], halo_src[0]
    xf, info = _fold_nodes_first(x_local)          # (n_loc, F)
    p, smax = send_idx.shape
    send_buf = jnp.take(xf, send_idx.reshape(-1), axis=0
                        ).reshape(p, smax, -1)     # (P, send_max, F)
    recv = jax.lax.all_to_all(send_buf, axis_name, split_axis=0,
                              concat_axis=0, tiled=True)
    halo = jnp.take(recv.reshape(p * smax, -1), halo_src, axis=0)
    xcat = jnp.concatenate([xf, halo], axis=0)     # (n_loc+halo_max, F)
    out = jnp.dot(adj_loc, xcat, preferred_element_type=jnp.float32)
    return _unfold_nodes(out.astype(x_local.dtype), info)


def make_halo_spmm(mesh: Mesh, part: GraphPartition):
    """Build a jitted sharded `A @ x` using the boundary-exchange layout
    of a `GraphPartition` (`gptst_tpu/graph/partition.py:send_idx`).

    Returns (fn, n_pad). x: (..., n_pad, C) in *permuted* node order
    (use `part.pad_features` at ingestion, or build the partition with
    `reorder=False`). Traffic: sum(halo_size) rows per call vs the
    ring's P*(P-1)*n_loc — see `partition_stats`.
    """
    adj_j = jax.device_put(
        jnp.asarray(part.local_adj),
        NamedSharding(mesh, P(GRAPH_AXIS, None, None)))
    send_j = jax.device_put(
        jnp.asarray(part.send_idx),
        NamedSharding(mesh, P(GRAPH_AXIS, None, None)))
    src_j = jax.device_put(
        jnp.asarray(part.halo_src),
        NamedSharding(mesh, P(GRAPH_AXIS, None)))
    manual = frozenset({GRAPH_AXIS}) if len(mesh.axis_names) > 1 else frozenset()

    @jax.jit
    def jitted(x):
        fn = jax.shard_map(
            functools.partial(_halo_spmm_local, axis_name=GRAPH_AXIS),
            mesh=mesh,
            in_specs=(P(GRAPH_AXIS, None, None), P(GRAPH_AXIS, None, None),
                      P(GRAPH_AXIS, None), _node_spec(x.ndim)),
            out_specs=_node_spec(x.ndim),
            axis_names=manual,
        )
        return fn(adj_j, send_j, src_j, x)

    return jitted, part.n_pad
