"""CCRNN — coupled layer-wise convolutional recurrent network (demand).

TPU-native counterpart of `model/CCRNN_demand/CCRNN.py` (234 LoC):
a DCGRU seq2seq whose graph is *evolved* layer-wise — graph0 =
leaky_relu(E1 E2) from an SVD of a data-driven support, then
graph_{i+1} from affine-transformed embeddings (`CCRNN.py:170-192`) —
with Chebyshev diffusion GraphConv (`:198-233`), an attention merge
over gconv layers (`:29-36`), and scheduled-sampling teacher forcing
`cl/(cl+exp(step/cl))` in the decoder (`:125-126, 194-195`). Defaults
follow `conf/CCRNN_demand/*.conf` (hidden 25, n_dim 50, k_hop 3,
1 rnn layer, 1 gconv layer, cl_decay_steps 300).

The support graph is data-driven (`args.py:57-76`): SVD-compress the
training series to (N, h) factors, RBF of their pairwise distances,
random-walk normalize — see `gptst_tpu.graph.artifacts.svd_rbf_support`.
The reference's Python time loops (`:85-88, 120-127`) are `nn.scan`s;
teacher-forcing coin flips are PRNG-keyed bernoullis drawn per step.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

xavier_normal = nn.initializers.xavier_normal()


@dataclasses.dataclass(frozen=True)
class CCRNNConfig:
    num_nodes: int
    hidden_size: int = 25
    n_dim: int = 50
    n_supports: int = 1
    k_hop: int = 3
    n_rnn_layers: int = 1
    n_gconv_layers: int = 1
    cl_decay_steps: int = 300
    # activation remat for the scanned encoder/decoder steps:
    # auto|none|full|dots (`ops/recurrent.remat_cell`; "auto" resolves
    # by node count, `ops/recurrent.resolve_remat`)
    remat: str = "auto"


def svd_graph_embeddings(support: np.ndarray, n_dim: int):
    """SVD init of the coupled node embeddings (`CCRNN.py:155-159`)."""
    m, p, n = np.linalg.svd(support)
    e1 = m[:, :n_dim] @ np.diag(p[:n_dim] ** 0.5)
    e2 = np.diag(p[:n_dim] ** 0.5) @ n[:n_dim, :]
    return e1.astype(np.float32), e2.astype(np.float32)


def cheb_diffusion(z, support, k_hop):
    """[z, Sz, 2S(Sz)-z, ...] concat (`CCRNN.py:198-233`)."""
    mats = [z]
    if k_hop > 0:
        h1 = jnp.einsum("nm,bmc->bnc", support, z)
        mats.append(h1)
        h0 = z
        for _ in range(2, k_hop + 1):
            h2 = 2 * jnp.einsum("nm,bmc->bnc", support, h1) - h0
            mats.append(h2)
            h1, h0 = h2, h1
    return jnp.concatenate(mats, axis=-1)


class EvolutionCell(nn.Module):
    """Per-gconv-layer graph conv + attention merge (`CCRNN.py:9-36`)."""

    cfg: CCRNNConfig
    out_dim: int

    @nn.compact
    def __call__(self, z, graphs):  # z: (B,N,C); graphs: (G,N,N)
        c = self.cfg
        outs = []
        h = z
        for i in range(c.n_gconv_layers):
            cat = cheb_diffusion(h, graphs[i], c.k_hop)
            h = nn.Dense(self.out_dim, name=f"gconv{i}",
                         kernel_init=xavier_normal)(cat)
            outs.append(h)
        stack = jnp.stack(outs, axis=1)            # (B,G,N,F)
        B, G, N, F = stack.shape
        flat = stack.reshape(B, G, N * F)
        w = jax.nn.softmax(nn.Dense(1, name="attlinear")(flat), axis=1)
        return (flat * w).sum(axis=1).reshape(B, N, F)


class CCRNNGRUCell(nn.Module):
    """DCGRU cell with evolution-cell gates (`CCRNN.py:39-61`)."""

    cfg: CCRNNConfig

    @nn.compact
    def __call__(self, state, x, graphs):
        h = self.cfg.hidden_size
        ru = jax.nn.sigmoid(EvolutionCell(self.cfg, 2 * h, name="ru")(
            jnp.concatenate([x, state], -1), graphs))
        r, u = jnp.split(ru, 2, axis=-1)
        c = jnp.tanh(EvolutionCell(self.cfg, h, name="cand")(
            jnp.concatenate([x, r * state], -1), graphs))
        new = u * state + (1.0 - u) * c
        return new, new


class _DecoderStep(nn.Module):
    """One decoder step: layers -> head -> teacher-force select."""

    cfg: CCRNNConfig
    output_dim: int

    @nn.compact
    def __call__(self, carry, scanned, graphs):
        states, inputs = carry                    # states: (L,B,N,H)
        target_t, use_tf = scanned                # (B,N,D), () bool
        c = self.cfg
        out = inputs
        new_states = []
        for layer in range(c.n_rnn_layers):
            s, out = CCRNNGRUCell(c, name=f"cell{layer}")(
                states[layer], out, graphs)
            new_states.append(s)
        pred = nn.Dense(self.output_dim, name="out")(out)
        nxt = jnp.where(use_tf, target_t, pred)
        return (jnp.stack(new_states), nxt), pred


class _EncoderStep(nn.Module):
    cfg: CCRNNConfig

    @nn.compact
    def __call__(self, states, x_t, graphs):
        c = self.cfg
        out = x_t
        new_states = []
        for layer in range(c.n_rnn_layers):
            s, out = CCRNNGRUCell(c, name=f"cell{layer}")(
                states[layer], out, graphs)
            new_states.append(s)
        return jnp.stack(new_states), out


class CCRNN(nn.Module):
    """(x, targets?, rng?, step?) -> (B, horizon, N, dim_out)."""

    cfg: CCRNNConfig
    dim_in: int
    dim_out: int
    horizon: int
    emb1_init: np.ndarray
    emb2_init: np.ndarray

    @nn.compact
    def __call__(self, x, targets=None, rng=None, step=None):
        c = self.cfg
        B, T, N, _ = x.shape
        e1 = self.param("nodevec1", lambda k: jnp.asarray(self.emb1_init))
        e2 = self.param("nodevec2", lambda k: jnp.asarray(self.emb2_init))
        w1 = self.param("w1", lambda k: jnp.eye(c.n_dim))
        w2 = self.param("w2", lambda k: jnp.eye(c.n_dim))
        b1 = self.param("b1", nn.initializers.zeros, (c.n_dim,))
        b2 = self.param("b2", nn.initializers.zeros, (c.n_dim,))

        # coupled layer-wise graph evolution (`CCRNN.py:170-186`)
        graphs = [nn.leaky_relu(e1 @ e2)]
        v1, v2 = e1 @ w1 + b1, (e2.T @ w1 + b1).T
        graphs.append(nn.leaky_relu(v1 @ v2))
        v1, v2 = v1 @ w2 + b2, (v2.T @ w2 + b2).T
        graphs.append(nn.leaky_relu(v1 @ v2))
        graphs = jnp.stack(graphs)                # (3, N, N)

        from gptst_tpu.ops.recurrent import remat_cell, resolve_remat

        rm = resolve_remat(c.remat, N)
        h0 = jnp.zeros((c.n_rnn_layers, B, N, c.hidden_size), x.dtype)
        enc = nn.scan(remat_cell(_EncoderStep, rm),
                      variable_broadcast="params",
                      split_rngs={"params": False},
                      in_axes=(1, nn.broadcast), out_axes=1)(c)
        states, _ = enc(h0, x, graphs)

        # scheduled sampling (`CCRNN.py:125-126, 194-195`)
        if targets is not None and rng is not None and step is not None:
            thr = c.cl_decay_steps / (
                c.cl_decay_steps
                + jnp.exp(step.astype(jnp.float32) / c.cl_decay_steps))
            use_tf = jax.random.uniform(rng, (self.horizon,)) < thr
            tgt = jnp.moveaxis(targets[..., : self.dim_out], 1, 0)
        else:
            use_tf = jnp.zeros((self.horizon,), bool)
            tgt = jnp.zeros((self.horizon, B, N, self.dim_out), x.dtype)

        dec = nn.scan(remat_cell(_DecoderStep, rm),
                      variable_broadcast="params",
                      split_rngs={"params": False},
                      in_axes=(0, nn.broadcast), out_axes=0)(c, self.dim_out)
        dec_in0 = jnp.zeros((B, N, self.dim_out), x.dtype)
        _, preds = dec((states, dec_in0), (tgt, use_tf), graphs)
        return jnp.moveaxis(preds, 0, 1)          # (B, T_out, N, D)
