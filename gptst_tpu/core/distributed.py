"""Multi-host initialization and mesh construction.

The reference is single-process/single-GPU (`model/Run.py:27`). On TPU
pods, each host runs this same program; `initialize_distributed` wires
the JAX runtime across hosts (coordinator discovery via env/args), and
`global_mesh` builds the ('data','graph') mesh over all global devices
so the SPMD train step (`gptst_tpu.parallel.spmd`) spans the slice —
XLA routes the collectives over ICI within a slice and DCN across
slices.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from gptst_tpu.parallel.mesh import make_mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-host.

    No-op for single-process runs (the common case on one chip/host).
    Arguments default to the standard JAX env vars; on Cloud TPU pods
    `jax.distributed.initialize()` auto-discovers everything.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("GPTST_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_mesh(graph_axis_size: Optional[int] = None):
    """('data','graph') mesh over all global devices (all hosts)."""
    return make_mesh(len(jax.devices()), graph_axis_size=graph_axis_size,
                     devices=jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0
