"""Graph convolution primitives.

All graph aggregation in the framework flows through these functions.
For reference-scale graphs (N <= 266) the supports are dense (K, N, N)
stacks and the contractions map directly onto the MXU.

Layout everywhere: x is (B, T, N, C) (or (B, N, C) for recurrent
cells), supports act on the N axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def graph_matmul(support: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """support @ x over the node axis.

    support: (N, N); x: (..., N, C). One MXU matmul per leading batch.
    """
    return jnp.einsum("nm,...mc->...nc", support, x)


def cheb_conv(x: jnp.ndarray, cheb_stack: jnp.ndarray,
              theta: jnp.ndarray, bias: jnp.ndarray | None = None
              ) -> jnp.ndarray:
    """Chebyshev spatial convolution with a precomputed polynomial stack.

    x: (B, T, N, Ci); cheb_stack: (K, N, N); theta: (Ci, Co, K);
    bias: (Co,) or None. Returns (B, T, N, Co).

    Matches STGCN's SpatioConvLayer (`model/STGCN/stgcn.py:76-77`):
      x_c  = einsum('knm,bitm->bitkn', Lk, x)
      x_gc = einsum('iok,bitkn->botn', theta, x_c) + b
    reshaped to channels-last.
    """
    xc = jnp.einsum("knm,btmi->btkni", cheb_stack, x)
    out = jnp.einsum("iok,btkni->btno", theta, xc)
    if bias is not None:
        out = out + bias
    return out


def diffusion_conv(x: jnp.ndarray, supports: list[jnp.ndarray],
                   weight: jnp.ndarray, bias: jnp.ndarray | None = None,
                   order: int = 2, include_self: bool = True) -> jnp.ndarray:
    """GWN-style diffusion convolution (`model/GWN/GWN.py:77-98`).

    Gathers [x, A1 x, A1^2 x, ..., Ak x, Ak^2 x, ...] along channels,
    then one dense projection. x: (..., N, Ci); each support (N, N);
    weight: ((1 + order*len(supports)) * Ci, Co).
    """
    feats = [x] if include_self else []
    for a in supports:
        h = x
        for _ in range(order):
            h = graph_matmul(a, h)
            feats.append(h)
    h = jnp.concatenate(feats, axis=-1)
    out = h @ weight
    if bias is not None:
        out = out + bias
    return out


def mixprop(x: jnp.ndarray, adj: jnp.ndarray, weight: jnp.ndarray,
            gdep: int, alpha: float) -> jnp.ndarray:
    """MTGNN MixProp propagation (`model/MTGNN/MTGNN.py:57-77`).

    h_{k} = alpha * x + (1 - alpha) * A_norm h_{k-1}; concatenate all
    hops then project. adj is row-normalized (A + I) / rowsum inside.
    x: (..., N, Ci); weight: ((gdep+1)*Ci, Co).
    """
    n = adj.shape[0]
    a = adj + jnp.eye(n, dtype=adj.dtype)
    d = a.sum(axis=1, keepdims=True)
    a = a / d
    h = x
    outs = [h]
    for _ in range(gdep):
        h = alpha * x + (1.0 - alpha) * graph_matmul(a, h)
        outs.append(h)
    return jnp.concatenate(outs, axis=-1) @ weight


def adaptive_adj(e1: jnp.ndarray, e2: jnp.ndarray) -> jnp.ndarray:
    """GWN adaptive adjacency softmax(relu(E1 @ E2)) (`GWN/GWN.py:238`).

    e1: (N, r), e2: (r, N). Returns (N, N) row-stochastic.
    """
    return jax.nn.softmax(jax.nn.relu(e1 @ e2), axis=1)


def mtgnn_graph(v1: jnp.ndarray, v2: jnp.ndarray,
                alpha: float, k: int) -> jnp.ndarray:
    """MTGNN learned directed graph with top-k sparsification
    (`model/MTGNN/MTGNN.py:149-202`).

    v1, v2: (N, d) linearly-transformed node embeddings.
    m_i = tanh(alpha * v_i); a = relu(tanh(alpha*(m1 m2^T - m2 m1^T))),
    keep top-k per row. Top-k is a static-shape threshold mask (XLA
    top_k), matching the reference's scatter-based mask.
    """
    m1 = jnp.tanh(alpha * v1)
    m2 = jnp.tanh(alpha * v2)
    a = jax.nn.relu(jnp.tanh(alpha * (m1 @ m2.T - m2 @ m1.T)))
    n = a.shape[0]
    if k >= n:
        return a
    # threshold at the k-th largest value per row (reference adds tiny
    # uniform noise to break ties; we rely on top_k's deterministic ties)
    kth = jax.lax.top_k(a, k)[0][:, -1:]
    return jnp.where(a >= kth, a, 0.0)
