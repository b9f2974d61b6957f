"""SPMD training: the full train step jitted over a device mesh.

Strategy (idiomatic GSPMD): commit the operands — params via
`shard_params` (node tables on 'graph', rest replicated), batches via
`shard_batch` (B on 'data', N on 'graph') — and jit the very same step
function the local Trainer uses. XLA propagates shardings through the
program and inserts the gradient all-reduce over 'data' and the
node-partition collectives over 'graph'. No reference counterpart
(the reference is single-GPU, SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from gptst_tpu.config.config import FrameworkConfig
from gptst_tpu.models.api import ForwardFn
from gptst_tpu.parallel.mesh import shard_batch, shard_params
from gptst_tpu.train.loss import build_loss
from gptst_tpu.train.step import make_loss_terms, make_train_step


def make_spmd_train_state(
    cfg: FrameworkConfig,
    mesh: Mesh,
    forward: ForwardFn,
    params: Any,
    optimizer: optax.GradientTransformation,
    data_mean: float = 0.0,
    data_std: float = 1.0,
) -> tuple[Any, Any, Callable]:
    """Place params/opt_state on the mesh and build the jitted step.

    Returns (params, opt_state, step) where
    step(params, opt_state, x, y, rng, epoch) -> (params, opt_state,
    total_loss, flow_loss). Callers shard batches with `shard_batch`.
    """
    params = shard_params(params, mesh, cfg.num_nodes)
    # opt_state leaves are zeros_like(params) — they inherit the params'
    # shardings from the committed inputs.
    opt_state = jax.jit(optimizer.init)(params)
    loss_fn = build_loss(cfg.loss_func, data_mean, data_std,
                         cfg.mape_thresh, cfg.mode == "pretrain")
    loss_terms = make_loss_terms(forward, loss_fn, cfg)
    step = jax.jit(make_train_step(loss_terms, optimizer))
    return params, opt_state, step


def run_one_step(cfg: FrameworkConfig, mesh: Mesh, forward: ForwardFn,
                 params: Any, x, y, seed: int = 0) -> tuple[float, float]:
    """Convenience: one optimizer step under the mesh; returns losses."""
    optimizer = optax.adam(cfg.lr_init)
    params, opt_state, step = make_spmd_train_state(
        cfg, mesh, forward, params, optimizer)
    x, y = shard_batch((jnp.asarray(x), jnp.asarray(y)), mesh)
    rng = jax.random.PRNGKey(seed)
    params, opt_state, total, flow = step(
        params, opt_state, x, y, rng, jnp.asarray(1, jnp.int32),
        jnp.asarray(0, jnp.int32))
    jax.block_until_ready(params)
    return float(total), float(flow)
