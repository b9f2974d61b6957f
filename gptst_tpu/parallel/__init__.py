from gptst_tpu.parallel.mesh import (
    DATA_AXIS, GRAPH_AXIS, batch_pspec, batch_sharding, choose_mesh_shape,
    make_mesh, param_pspec, shard_batch, shard_params,
)
from gptst_tpu.parallel.spmd import make_spmd_train_state, run_one_step

__all__ = [
    "DATA_AXIS", "GRAPH_AXIS", "batch_pspec", "batch_sharding",
    "choose_mesh_shape", "make_mesh", "param_pspec", "shard_batch",
    "shard_params", "make_spmd_train_state", "run_one_step",
]
