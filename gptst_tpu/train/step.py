"""Pure train/eval step builders.

The single jitted train step is the unit both the local `Trainer` and
the SPMD path (`gptst_tpu.parallel`) compile — the same function runs
single-chip or under a `Mesh` with sharded operands (GSPMD inserts the
collectives). Loss assembly mirrors `model/BasicTrainer.py:81-97`:
pretrain = masked flow loss + 0.1*KL(mask-policy || routing) after
`change_epoch`; other modes = plain flow loss on the labels.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from gptst_tpu.config.config import FrameworkConfig
from gptst_tpu.models.api import ForwardFn
from gptst_tpu.train.loss import kl_div_sum


def make_loss_terms(forward: ForwardFn, loss_fn: Callable,
                    cfg: FrameworkConfig) -> Callable:
    """Returns loss_terms(params, x, y, rng, epoch, step) -> (total, flow).

    `cfg.compute_dtype == 'bfloat16'` enables the TPU mixed-precision
    recipe: master params stay f32 (Adam state, updates), the forward
    runs on a bf16 cast of params + inputs (half the HBM traffic, full
    MXU rate), and the loss/KL path is computed in f32. Gradients flow
    through the cast and arrive f32.
    """
    pretrain = cfg.mode == "pretrain"
    bf16 = cfg.compute_dtype == "bfloat16"

    def _cast_bf16(t):
        # bf16's 8 mantissa bits resolve ~0.004 near 1.0: the standardized
        # day-slot covariate channel stays distinguishable up to ~400
        # slots/day (reference datasets: 288 at 5-min, 48 at 30-min).
        # Datasets with finer time resolution should run compute_dtype=f32.
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)

    def loss_terms(params, x, y, rng, epoch, step):
        label = y if not pretrain else x
        if bf16:
            params_c, x, y = _cast_bf16(params), _cast_bf16(x), _cast_bf16(y)
        else:
            params_c = params
        out = forward(params_c, x, y, rng, epoch, step)
        pred = out.pred.astype(jnp.float32)
        mask = None if out.mask is None else out.mask.astype(jnp.float32)
        flow_loss = loss_fn(pred, label[..., : cfg.output_dim], mask)
        if pretrain and out.probability is not None:
            prob = out.probability.astype(jnp.float32)
            routing = out.routing.astype(jnp.float32)
            kl = kl_div_sum(jnp.log(jnp.maximum(prob, 1e-38)), routing)
            total = jnp.where(
                epoch > cfg.change_epoch, flow_loss + 0.1 * kl, flow_loss)
        else:
            total = flow_loss
        return total, flow_loss

    return loss_terms


def make_train_step(loss_terms: Callable,
                    optimizer: optax.GradientTransformation) -> Callable:
    """Returns step(params, opt_state, x, y, rng, epoch)
    -> (params, opt_state, total_loss, flow_loss)."""

    def step(params: Any, opt_state: Any, x, y, rng, epoch, step_count):
        (total, flow), grads = jax.value_and_grad(
            loss_terms, has_aux=True)(params, x, y, rng, epoch, step_count)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, flow

    return step


def make_scanned_train_step(loss_terms: Callable,
                            optimizer: optax.GradientTransformation) -> Callable:
    """K optimizer steps per dispatch via `lax.scan`.

    Per-step dispatch latency dominates at reference batch sizes (the
    compiled step is ~0.2 ms while a host round-trip costs ~1.7 ms);
    scanning K batches in one call amortizes it ~10x. Returns
    multi(params, opt_state, xs, ys, rngs, epoch, step_count)
    -> (params, opt_state, step_count', totals, flows) with
    xs/ys: (K, B, T, N, D), rngs: (K, 2) PRNG keys.
    """
    step = make_train_step(loss_terms, optimizer)

    def multi(params, opt_state, xs, ys, rngs, epoch, step_count):
        def body(carry, inp):
            p, o, s = carry
            x, y, r = inp
            p, o, total, flow = step(p, o, x, y, r, epoch, s)
            return (p, o, s + 1), (total, flow)

        (params, opt_state, step_count), (totals, flows) = jax.lax.scan(
            body, (params, opt_state, step_count), (xs, ys, rngs))
        return params, opt_state, step_count, totals, flows

    return multi


def make_indexed_train_step(loss_terms: Callable,
                            optimizer: optax.GradientTransformation,
                            constrain_batch: Callable | None = None
                            ) -> Callable:
    """K steps per dispatch gathering batches from a device-resident
    dataset — zero per-step host->device traffic.

    The reference keeps each split wholly on the GPU
    (`lib/dataloader.py:92-99`); this is the TPU equivalent: the train
    arrays live in HBM once, and each scanned step selects its batch
    with an on-device gather. Returns
    multi(params, opt_state, x_all, y_all, idx, rngs, epoch, step_count)
    with idx: (K, B) int32 window indices.

    Under a mesh the resident splits are node-sharded over 'graph' and
    window-replicated over 'data' (any index gathers locally);
    `constrain_batch` reshards each gathered batch to the training
    layout (B over 'data') so the step itself runs data-parallel.
    """
    step = make_train_step(loss_terms, optimizer)

    def multi(params, opt_state, x_all, y_all, idx, rngs, epoch,
              step_count):
        def body(carry, inp):
            p, o, s = carry
            sel, r = inp
            x = jnp.take(x_all, sel, axis=0)
            y = jnp.take(y_all, sel, axis=0)
            if constrain_batch is not None:
                x, y = constrain_batch(x), constrain_batch(y)
            p, o, total, flow = step(p, o, x, y, r, epoch, s)
            return (p, o, s + 1), (total, flow)

        (params, opt_state, step_count), (totals, flows) = jax.lax.scan(
            body, (params, opt_state, step_count), (idx, rngs))
        return params, opt_state, step_count, totals, flows

    return multi
