"""Capsule primitives: squash nonlinearity and dynamic routing.

Used by GPT-ST's hierarchical spatial pattern encoder
(`model/Pretrain_model/GPTST.py:36-39, 100-141`). The routing loop runs
a fixed `num_route` iterations on gradient-stopped tensors — the
reference `.detach()`es the primary capsules and routing inputs
(`GPTST.py:108-109`) so only the final posterior carries gradients.
That placement is load-bearing for training parity and is mirrored here
with `stop_gradient`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def squash(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Capsule squash: (|x|^2 / (1 + |x|^2)) * x / |x| (`GPTST.py:36-39`)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    scale = sq / (1.0 + sq)
    return scale * x / (jnp.sqrt(sq) + 1e-8)


def dynamic_routing(pcaps: jnp.ndarray, dadj: jnp.ndarray,
                    num_route: int = 2) -> jnp.ndarray:
    """Cluster-assignment routing (`GPTST.py:104-120`).

    pcaps: (B, T, N, D) squashed primary capsules.
    dadj:  (B, T, H, N) time-conditioned assignment prior.
    Returns posterior c: (B, T, H, N) = softmax over H of (b + dadj),
    where b accumulates agreement over `num_route` iterations computed
    on gradient-stopped tensors.

    The reference materializes u_hat = v_h p_n^T per (h, n) pair
    (`GPTST.py:106-107`) purely to take (c * u_hat).sum(-2) — which
    equals einsum('bthn,btnd->bthd', c, pcaps) directly; we skip the
    (B,T,H,N,D) intermediate (HBM win, identical math).
    """
    k = jax.lax.stop_gradient(pcaps)
    prior = jax.nn.softmax(dadj, axis=-2)
    s0 = jnp.einsum("bthn,btnd->bthd", prior, k)
    u_hat_seed = jax.lax.stop_gradient(squash(s0))  # (B,T,H,D)

    # u_hat[b,t,h,n,:] = u_hat_seed[b,t,h,:] * k[b,t,n,:] elementwise?
    # No: reference Dcaps_in[b,t,h,n,d] = squash(s0)[b,t,h,d] * k[b,t,n,d]
    # (outer product over the D axis realized via matmul of unsqueezed
    # tensors). (c * u_hat).sum(n) then contracts n with weights c.
    def body(_, b):
        c = jax.nn.softmax(b, axis=2)  # over H
        # s[b,t,h,d] = sum_n c[b,t,h,n] * u_hat[b,t,h,n,d]
        #            = u_hat_seed[b,t,h,d] * sum_n c[b,t,h,n] k[b,t,n,d]
        s = u_hat_seed * jnp.einsum("bthn,btnd->bthd", c, k)
        v = squash(s)
        # agreement uv[b,t,h,n] = sum_d v[b,t,h,d] * k[b,t,n,d]
        # (`GPTST.py:117`: matmul(v, k^T))
        uv = jnp.einsum("bthd,btnd->bthn", v, k)
        return b + uv

    b0 = jnp.zeros_like(dadj)
    b = jax.lax.fori_loop(0, num_route, body, b0)
    return jax.nn.softmax(b + dadj, axis=2)
