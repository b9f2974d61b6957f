"""Device mesh + sharding layout for the framework.

Two mesh axes (SURVEY.md §2.5, §7.1):

  * ``data``  — batch-parallel axis (DP). Gradients all-reduce over it;
    XLA/GSPMD inserts the psum from the sharding annotations alone.
  * ``graph`` — spatial partition axis (the TP-equivalent for graph
    nets): the node dimension of activations and of node-indexed
    parameter tables (node embeddings, per-node weight pools) is sharded
    across it, so the big per-node einsums run on local node shards and
    cluster/hyperedge reductions terminate in all-reduces over ICI.

The reference has no parallelism at all (single `cuda:0`,
`model/Run.py:27`); this module is new capability.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GRAPH_AXIS = "graph"


def choose_mesh_shape(n_devices: int,
                      graph_axis_size: Optional[int] = None) -> tuple[int, int]:
    """(data, graph) factorization of ``n_devices``.

    Defaults to a 2-way graph partition when the device count allows it —
    reference-scale graphs (170-266 nodes) saturate quickly, so most
    devices go to the batch axis.
    """
    if graph_axis_size is None:
        graph_axis_size = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    if n_devices % graph_axis_size:
        raise ValueError(
            f"{n_devices} devices not divisible by graph axis "
            f"{graph_axis_size}")
    return n_devices // graph_axis_size, graph_axis_size


def make_mesh(n_devices: Optional[int] = None,
              graph_axis_size: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    d, g = choose_mesh_shape(n_devices, graph_axis_size)
    dev = np.asarray(devices[:n_devices]).reshape(d, g)
    return Mesh(dev, (DATA_AXIS, GRAPH_AXIS))


def batch_pspec() -> P:
    """(B, T, N, D) activations: batch over 'data', nodes over 'graph'."""
    return P(DATA_AXIS, None, GRAPH_AXIS, None)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_pspec())


def param_pspec(leaf: Any, num_nodes: int) -> P:
    """Node-indexed tables shard their node dimension over 'graph';
    everything else is replicated."""
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 1 and shape[0] == num_nodes:
        return P(GRAPH_AXIS, *([None] * (len(shape) - 1)))
    return P()


def shard_params(params: Any, mesh: Mesh, num_nodes: int) -> Any:
    """Place a param pytree on the mesh with the framework layout."""
    return jax.tree.map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, param_pspec(a, num_nodes))), params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place (B, T, N, D) batch leaves on the mesh. An axis shards only
    when its size divides the mesh axis (e.g. a ragged tail batch
    replicates over 'data' instead — same math, no DP for it)."""

    def put(a):
        d_ax = DATA_AXIS if a.shape[0] % mesh.shape[DATA_AXIS] == 0 else None
        g_ax = GRAPH_AXIS if a.shape[2] % mesh.shape[GRAPH_AXIS] == 0 else None
        sh = NamedSharding(mesh, P(d_ax, None, g_ax, None))
        return jax.device_put(a, sh)

    return jax.tree.map(put, batch)
