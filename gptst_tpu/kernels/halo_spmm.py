"""Fused ring collective-matmul SpMM (Pallas, inter-chip RDMA).

The explicit scale-out aggregation path (SURVEY §2.5 "collective
matmul / halo overlap"): nodes are block-partitioned over the 'graph'
mesh axis; each device holds its adjacency rows split by source shard
and its x shard. One Pallas kernel per device then runs the ring:

  step s: start RDMA of the resident x shard to the left neighbor
          (so shard (me+s+1) mod P arrives while we compute),
          matmul the matching adjacency block column on the MXU,
          flow-control with per-slot semaphores, repeat P times.

The transfer of the next shard rides the ICI *concurrently* with the
current block matmul — the latency-hiding the XLA-scheduled ring in
`gptst_tpu/parallel/halo.py` can only approximate. Buffer safety: a
sender may only overwrite a remote slot after the remote signals it
finished the matmul reading that slot (free_sem), and a slot is only
re-sent after its own send completed (send_sem).

Adjacency blocks are pre-rotated host-side so block s of device `me`
is the one consumed at ring step s — index maps need no axis_index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gptst_tpu.parallel.halo import partition_adjacency
from gptst_tpu.parallel.mesh import GRAPH_AXIS


def _ring_kernel(a_ref, x_ref, out_ref, buf, send_sem, recv_sem,
                 free_sem, *, parts: int, axis: str):
    """a_ref: (n_loc, P, n_loc) ring-ordered; x_ref: (n_loc, C)."""
    me = jax.lax.axis_index(axis)
    left = jax.lax.rem(me - 1 + parts, parts)   # we send to left
    right = jax.lax.rem(me + 1, parts)          # left's data comes from right

    buf[0] = x_ref[:]
    acc = jnp.zeros(out_ref.shape, jnp.float32)

    for s in range(parts):
        slot = s % 2
        nxt = (s + 1) % 2
        if s < parts - 1:
            # tell the device that writes our *next* slot that it is
            # free (we are not reading it this step)
            pltpu.semaphore_signal(
                free_sem.at[nxt], inc=1, device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            # wait for the receiver to free the slot we are sending into
            pltpu.semaphore_wait(free_sem.at[nxt], 1)
            rdma = pltpu.make_async_remote_copy(
                src_ref=buf.at[slot], dst_ref=buf.at[nxt],
                send_sem=send_sem.at[slot], recv_sem=recv_sem.at[nxt],
                device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            rdma.start()
        # compute overlaps the in-flight transfer
        acc = acc + jnp.dot(a_ref[:, s], buf[slot],
                            preferred_element_type=jnp.float32)
        if s < parts - 1:
            pltpu.make_async_remote_copy(
                src_ref=buf.at[slot], dst_ref=buf.at[nxt],
                send_sem=send_sem.at[slot], recv_sem=recv_sem.at[nxt],
                device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL).wait()
    out_ref[:] = acc.astype(out_ref.dtype)


def _rotate_blocks(blocks: np.ndarray) -> np.ndarray:
    """(P, n_loc, P, n_loc) dest-major blocks -> ring order: device p's
    s-th block is A[p, :, (p+s) % P, :]."""
    parts = blocks.shape[0]
    out = np.empty_like(blocks)
    for p in range(parts):
        for s in range(parts):
            out[p, :, s, :] = blocks[p, :, (p + s) % parts, :]
    return out


def make_fused_ring_spmm(mesh: Mesh, adj: np.ndarray, feat: int,
                         interpret: bool = False):
    """Build a jitted fused-ring `A @ x` over the 'graph' mesh axis.

    Returns (fn, n_pad): fn(x_pad) with x_pad (n_pad, feat) sharded
    P('graph', None). Compare against `parallel.halo.make_ring_spmm`
    (XLA-scheduled ppermute ring) — same math, explicit ICI overlap.
    """
    parts = mesh.shape[GRAPH_AXIS]
    blocks = _rotate_blocks(partition_adjacency(adj, parts))
    n_loc = blocks.shape[1]
    n_pad = n_loc * parts
    blocks_j = jax.device_put(
        jnp.asarray(blocks),
        NamedSharding(mesh, P(GRAPH_AXIS, None, None, None)))

    kernel = functools.partial(_ring_kernel, parts=parts, axis=GRAPH_AXIS)
    interpret_params = (
        pltpu.InterpretParams(dma_execution_mode="on_wait")
        if interpret else None)

    def per_device(a_blocks, x_local):
        a_blocks = a_blocks[0]        # (n_loc, P, n_loc)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_loc, feat), x_local.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, n_loc, feat), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR((2,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=(interpret_params if interpret else False),
        )
        return call(a_blocks, x_local)

    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(GRAPH_AXIS, None, None, None), P(GRAPH_AXIS, None)),
        out_specs=P(GRAPH_AXIS, None),
        check_vma=False,
    )
    jitted = jax.jit(lambda x: fn(blocks_j, x))
    return jitted, n_pad
