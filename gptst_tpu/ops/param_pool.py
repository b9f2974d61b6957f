"""Customized parameter learner primitives.

The signature op of GPT-ST: instead of one shared weight matrix, a
*pool* of weights indexed by a low-rank embedding — per-node
(`einsum('nd,dio->nio')`) or per-(batch,time) (`einsum('btd,dio->btio')`)
— so every node / timestep gets its own linear map. Appears throughout
the reference pretrain net (`model/Pretrain_model/GPTST.py:24-31,
137-139, 160-162`).

On TPU these contract cleanly onto the MXU: we fuse the two einsums
(embedding->weights, weights->output) into a single contraction where
possible to avoid materializing the (N, D_in, D_out) weight tensor in
HBM for large N.
"""

from __future__ import annotations

import jax.numpy as jnp


def node_param_linear(x: jnp.ndarray, node_emb: jnp.ndarray,
                      w_pool: jnp.ndarray, b_pool: jnp.ndarray) -> jnp.ndarray:
    """Per-node linear map from a weight pool.

    x: (B, T, N, Di), node_emb: (N, E), w_pool: (E, Di, Do),
    b_pool: (E, Do). Returns (B, T, N, Do).

    Equivalent to weights = einsum('nd,dio->nio') then
    einsum('btni,nio->btno') + node_emb @ b_pool
    (`GPTST.py:24-26, 137-139`).
    """
    # Fused: out[b,t,n,o] = sum_{d,i} node_emb[n,d] w_pool[d,i,o] x[b,t,n,i]
    weights = jnp.einsum("nd,dio->nio", node_emb, w_pool)
    out = jnp.einsum("btni,nio->btno", x, weights)
    if b_pool is None:
        return out
    return out + node_emb @ b_pool


def time_param_linear(x: jnp.ndarray, time_eb: jnp.ndarray,
                      w_pool: jnp.ndarray, b_pool: jnp.ndarray) -> jnp.ndarray:
    """Per-(batch, time) linear map from a weight pool.

    x: (B, T, N, Di), time_eb: (B, T, E), w_pool: (E, Di, Do),
    b_pool: (E, Do). Returns (B, T, N, Do).

    Equivalent to weights = einsum('btd,dio->btio') then
    einsum('btni,btio->btno') + (time_eb @ b_pool)[:, :, None]
    (`GPTST.py:29-31, 160-162`).
    """
    weights = jnp.einsum("btd,dio->btio", time_eb, w_pool)
    out = jnp.einsum("btni,btio->btno", x, weights)
    return out + (time_eb @ b_pool)[:, :, None, :]
