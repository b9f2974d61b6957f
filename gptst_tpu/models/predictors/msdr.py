"""MSDR — multi-step dependency relation networks (GMSDR).

TPU-native counterpart of `model/MSDR/gmsdr_model.py` + `gmsdr_cell.py`
(357 LoC): a seq2seq stack of GMSDR cells that keep a rolling window of
the last `pre_k`=4 hidden states. Per step (`gmsdr_cell.py:109-130`):

  preH      = concat of the last pre_v hidden states
  conv      = leaky_relu(gconv([x ‖ preH]))   # diffusion over dual
              random-walk supports + adaptive softmax(relu(E1 E2)),
              max_diffusion_step=1 -> [z, S1 z, S2 z, A z] concat
  output    = conv @ W + b + attention(hx_k + R)
  hx_k      <- shift-append(output)

W, b, R and the attention linear start at zero exactly as the
reference (`:96-99`); gconv bias starts at 1.0 (`:122`). The Python
loops over encoder/decoder time (`gmsdr_model.py:120,138`) are
`nn.scan`s; the pre_k window is a rolling buffer in the carry.
Defaults follow `conf/MSDR/*.conf` (rnn_units=64, 2 layers, pre_k=4,
pre_v=1, dual_random_walk).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gptst_tpu.graph.artifacts import asym_adj
from gptst_tpu.ops.graph_conv import graph_matmul

xavier_normal = nn.initializers.xavier_normal()


@dataclasses.dataclass(frozen=True)
class MSDRConfig:
    num_nodes: int
    rnn_units: int = 64
    num_rnn_layers: int = 2
    max_diffusion_step: int = 1
    pre_k: int = 4
    pre_v: int = 1
    adapt_rank: int = 10
    # activation remat for the scanned seq2seq step: auto|none|full|dots
    # (`ops/recurrent.remat_cell`); the K=4 multi-step carry x 2 layers
    # x 24 scanned steps is the worst residual blowup in the model zoo.
    # "auto" resolves by node count (`ops/recurrent.resolve_remat`).
    remat: str = "auto"


def dual_random_walk_supports(adj: np.ndarray) -> list[np.ndarray]:
    """[(D^-1 A)^T, (D^-1 A^T)^T] (`gmsdr_cell.py:86-89`)."""
    return [asym_adj(adj).T.copy(), asym_adj(adj.T).T.copy()]


class GMSDRCell(nn.Module):
    """One layer's step: (hx_k, x) -> (hx_k', output)."""

    cfg: MSDRConfig
    dim_in: int

    @nn.compact
    def __call__(self, hx_k, x, supports, adp):
        # hx_k: (B, K, N, U); x: (B, N, Din); supports: tuple of
        # (N, N) arrays or SparseSupport (block-CSR at large N).
        # adp: this layer's learned adaptive adjacency — computed ONCE
        # per forward by MSDR.__call__ (the reference recomputes
        # softmax(relu(E1 E2)) inside every cell step,
        # `gmsdr_cell.py:122`, but E1/E2 are constant within a forward,
        # so hoisting it out of the `nn.scan` is the same math at 1/T
        # the cost — and keeps the SDDMM sparse-adaptive variant out of
        # the scan body, which the tunneled TPU compiler rejects).
        c = self.cfg
        B, K, N, U = hx_k.shape

        pre_h = hx_k[:, -c.pre_v:]                       # (B, pre_v, N, U)
        pre_h = jnp.moveaxis(pre_h, 1, 2).reshape(B, N, c.pre_v * U)
        z = jnp.concatenate([x, pre_h], axis=-1)         # (B, N, Z)

        mats = [z]
        for sup in supports:
            h1 = graph_matmul(sup, z)
            mats.append(h1)
            h0 = z
            for _ in range(2, c.max_diffusion_step + 1):
                h2 = 2 * graph_matmul(sup, h1) - h0
                mats.append(h2)
                h1, h0 = h2, h1
        h1 = graph_matmul(adp, z)
        mats.append(h1)
        h0 = z
        for _ in range(2, c.max_diffusion_step + 1):
            h2 = graph_matmul(adp, h1) - h0
            mats.append(h2)
            h1, h0 = h2, h1
        # gconv as a sum of per-matrix dots instead of `concat @ W`:
        # the (B, N, num_mats*Z) concatenation materialized ~134 MB
        # per cell step at 16k/B=4 (write + read), measurable in the
        # ablation profile (`scripts/msdr_profile.py`); summing
        # z_i @ W[i*Z:(i+1)*Z] reads each diffusion output exactly once
        # and keeps the parameter layout identical (`gconv_w` stays one
        # (num_mats*Z, U) array — checkpoints and transplants unchanged,
        # same math, same `gmsdr_cell.py:109-130` semantics).
        zdim = z.shape[-1]
        gw = self.param("gconv_w", xavier_normal, (len(mats) * zdim, U))
        gb = self.param("gconv_b", nn.initializers.constant(1.0), (U,))
        pre = gb
        for i, m in enumerate(mats):
            pre = pre + m @ gw[i * zdim:(i + 1) * zdim]
        conv = nn.leaky_relu(pre)

        w = self.param("W", nn.initializers.zeros, (U, U))
        b = self.param("b", nn.initializers.zeros, (c.num_nodes, U))
        r = self.param("R", nn.initializers.zeros, (c.pre_k, c.num_nodes, U))
        att_w = self.param("att_w", nn.initializers.zeros,
                           (c.num_nodes * U, 1))
        att_b = self.param("att_b", nn.initializers.zeros, (1,))

        # pre_k attention without materializing (hx_k + R) twice
        # (`gmsdr_cell.py:131-140`): logits split into the hx_k term and
        # the constant R term; the weighted sum distributes the same
        # way. hx_k is read twice (logits, weighted sum — a true data
        # dependency), but the (B, K, N, U) intermediate round-trip is
        # gone.
        aw = att_w.reshape(N, U)
        r_dot = jnp.einsum("knu,nu->k", r, aw)           # (K,)
        logits = (jnp.einsum("bknu,nu->bk", hx_k, aw)
                  + r_dot[None] + att_b)
        weight = jax.nn.softmax(logits, axis=1)          # (B, K)
        att = (jnp.einsum("bk,bknu->bnu", weight, hx_k)
               + jnp.einsum("bk,knu->bnu", weight, r))

        output = conv @ w + b[None] + att
        hx_k = jnp.concatenate([hx_k[:, 1:], output[:, None]], axis=1)
        return hx_k, output


class _SeqStep(nn.Module):
    """One time step through the layer stack (scanned over T)."""

    cfg: MSDRConfig
    dim_in: int

    @nn.compact
    def __call__(self, carry, x_t, supports, adps):
        # carry: L-tuple of (B, K, N, U); x_t: (B, N, Din); adps:
        # per-layer adaptive adjacencies (broadcast through the scan).
        # The carry is a TUPLE, not a stacked (L, ...) array: the
        # profiler showed `jnp.stack` round-tripping the full 134 MB
        # carry through HBM on every scanned step (~13 GB per forward
        # at 16k/B=4) purely to re-split it next step.
        c = self.cfg
        out = x_t
        new_carry = []
        for layer in range(c.num_rnn_layers):
            din = self.dim_in if layer == 0 else c.rnn_units
            hx, out = GMSDRCell(c, din, name=f"cell{layer}")(
                carry[layer], out, supports, adps[layer])
            new_carry.append(hx)
        return tuple(new_carry), out


def _pick_chunk(t: int) -> int:
    """Largest divisor of t no bigger than ceil(t/2) — 2+ segments so
    boundary-carry storage drops by the segment count."""
    for chunk in range(-(-t // 2), 0, -1):
        if t % chunk == 0:
            return chunk
    return t


class _Segment(nn.Module):
    """A `chunk`-step run of the layer stack (the remat'd body of the
    outer segment scan — see MSDR.__call__)."""

    cfg: MSDRConfig
    dim_in: int

    @nn.compact
    def __call__(self, carry, x_chunk, supports, adps):
        inner = nn.scan(
            _SeqStep, variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(1, nn.broadcast, nn.broadcast), out_axes=1,
        )(self.cfg, self.dim_in, name="seg")
        return inner(carry, x_chunk, supports, adps)


class MSDR(nn.Module):
    """x: (B, T, N, dim_in) -> (B, T_out, N, dim_out)."""

    cfg: MSDRConfig
    dim_in: int
    dim_out: int
    horizon: int

    @nn.compact
    def __call__(self, x, supports, adapt_pattern=None):
        # adapt_pattern: None -> each layer's learned adjacency is the
        # reference's dense softmax(relu(E1 E2)) (`gmsdr_cell.py:122`),
        # O(N^2) memory; an SDDMMPattern -> the same graph restricted
        # to the pattern via the sparse SDDMM path (block-row softmax),
        # which is how the adaptive branch scales past ~8k nodes. The
        # nodevec pairs live here (one per encoder/decoder layer, as in
        # the reference's per-cell parameters) so each support builds
        # once per forward instead of once per scanned time step.
        c = self.cfg
        B, T, N, _ = x.shape

        def build_adp(tag, layer):
            e1 = self.param(f"nodevec1_{tag}{layer}",
                            nn.initializers.normal(1.0),
                            (c.num_nodes, c.adapt_rank))
            e2 = self.param(f"nodevec2_{tag}{layer}",
                            nn.initializers.normal(1.0),
                            (c.adapt_rank, c.num_nodes))
            if adapt_pattern is None:
                return jax.nn.softmax(jax.nn.relu(e1 @ e2), axis=1)
            from gptst_tpu.kernels.sddmm import adaptive_support

            return adaptive_support(adapt_pattern, e1, e2)

        enc_adps = tuple(build_adp("enc", i)
                         for i in range(c.num_rnn_layers))
        dec_adps = tuple(build_adp("dec", i)
                         for i in range(c.num_rnn_layers))

        from gptst_tpu.ops.recurrent import remat_cell, resolve_remat

        # MSDR's cell recompute is SpMM-heavy (3 support applications
        # per layer-step), so remat costs more than the residual
        # round-trips at 16k (measured 609 vs 415 ms/step, f32 B=4);
        # "auto" engages it only where the K=4 carry x 24-step stack
        # cannot fit HBM at all (>=32k nodes — the r4 bench had NO 64k
        # MSDR row for exactly that reason). At that scale per-CELL
        # remat is not enough either: the scan linearization stores the
        # full K-deep carry tuple EVERY step (268 MB/step at 64k B=1 —
        # ~6 GB per scan), so the scan itself runs CHUNKED two-level
        # checkpointing — an outer scan over T/chunk segments whose
        # remat'd body re-runs an inner scan of `chunk` steps; only
        # segment-boundary carries persist, in-segment carries are
        # recomputed during backward. Exact same step order/math. The
        # chunked tree nests the cells one level deeper
        # ("encoder/seg/cell{i}"); it only exists at >=32k nodes where
        # no checkpoint/transplant layout depends on it — small-N trees
        # (all parity suites, all shipped datasets) are untouched.
        rm = resolve_remat(c.remat, N, threshold=32768)
        x = nn.Dense(c.rnn_units, name="enc_mlp")(x)     # (B,T,N,U)
        h0 = tuple(jnp.zeros((B, c.pre_k, N, c.rnn_units), x.dtype)
                   for _ in range(c.num_rnn_layers))

        def make_scan(name):
            if rm == "none":
                return nn.scan(
                    _SeqStep, variable_broadcast="params",
                    split_rngs={"params": False},
                    in_axes=(1, nn.broadcast, nn.broadcast), out_axes=1,
                )(c, c.rnn_units, name=name)
            seg = remat_cell(_Segment, rm)
            return nn.scan(
                seg, variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=(1, nn.broadcast, nn.broadcast), out_axes=1,
            )(c, c.rnn_units, name=name)

        def run_scan(scanned, carry, xs, adps):
            if rm != "none":
                chunk = _pick_chunk(xs.shape[1])
                t = xs.shape[1]
                xs = xs.reshape(B, t // chunk, chunk, N, -1)
                carry, ys = scanned(carry, xs, supports, adps)
                return carry, ys.reshape(B, t, N, -1)
            return scanned(carry, xs, supports, adps)

        hx_k, enc_out = run_scan(make_scan("encoder"), h0, x, enc_adps)
        _, dec_out = run_scan(make_scan("decoder"), hx_k, enc_out,
                              dec_adps)
        return nn.Dense(self.dim_out, name="projection")(dec_out)
