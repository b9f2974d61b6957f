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

from gptst_tpu.parallel.mesh import GRAPH_AXIS


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
    """Per-shard body: a_blocks (1, n_loc, P, n_loc); x_local (n_loc, C)."""
    a_blocks = a_blocks[0]          # (n_loc, P, n_loc)
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
    acc0 = (x_local * 0).astype(jnp.float32)
    acc, _ = jax.lax.fori_loop(0, p, body, (acc0, x_local))
    return acc.astype(x_local.dtype)


def make_ring_spmm(mesh: Mesh, adj: np.ndarray):
    """Build a jitted sharded `A @ x` for x: (N, C) node features.

    Returns (fn, n_pad): fn takes x padded to n_pad rows, sharded (or
    shardable) over the 'graph' axis, and returns A_pad @ x_pad with the
    same sharding. Use `jax.device_put(x_pad, NamedSharding(mesh,
    P('graph', None)))` to place inputs.
    """
    parts = mesh.shape[GRAPH_AXIS]
    blocks = partition_adjacency(adj, parts)
    n_pad = blocks.shape[1] * parts
    blocks_j = jax.device_put(
        jnp.asarray(blocks),
        NamedSharding(mesh, P(GRAPH_AXIS, None, None, None)))

    fn = jax.shard_map(
        functools.partial(_ring_spmm_local, axis_name=GRAPH_AXIS),
        mesh=mesh,
        in_specs=(P(GRAPH_AXIS, None, None, None), P(GRAPH_AXIS, None)),
        out_specs=P(GRAPH_AXIS, None),
    )
    jitted = jax.jit(lambda x: fn(blocks_j, x))
    return jitted, n_pad
