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
    """Returns loss_terms(params, x, y, rng, epoch) -> (total, flow)."""
    pretrain = cfg.mode == "pretrain"

    def loss_terms(params, x, y, rng, epoch, step):
        out = forward(params, x, y, rng, epoch, step)
        label = y if not pretrain else x
        flow_loss = loss_fn(
            out.pred, label[..., : cfg.output_dim], out.mask)
        if pretrain and out.probability is not None:
            kl = kl_div_sum(
                jnp.log(jnp.maximum(out.probability, 1e-38)), out.routing)
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
                            optimizer: optax.GradientTransformation) -> Callable:
    """K steps per dispatch gathering batches from a device-resident
    dataset — zero per-step host->device traffic.

    The reference keeps each split wholly on the GPU
    (`lib/dataloader.py:92-99`); this is the TPU equivalent: the train
    arrays live in HBM once, and each scanned step selects its batch
    with an on-device gather. Returns
    multi(params, opt_state, x_all, y_all, idx, rngs, epoch, step_count)
    with idx: (K, B) int32 window indices.
    """
    step = make_train_step(loss_terms, optimizer)

    def multi(params, opt_state, x_all, y_all, idx, rngs, epoch,
              step_count):
        def body(carry, inp):
            p, o, s = carry
            sel, r = inp
            x = jnp.take(x_all, sel, axis=0)
            y = jnp.take(y_all, sel, axis=0)
            p, o, total, flow = step(p, o, x, y, r, epoch, s)
            return (p, o, s + 1), (total, flow)

        (params, opt_state, step_count), (totals, flows) = jax.lax.scan(
            body, (params, opt_state, step_count), (idx, rngs))
        return params, opt_state, step_count, totals, flows

    return multi
