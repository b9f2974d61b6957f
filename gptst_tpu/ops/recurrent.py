"""Recurrent graph cells as scanned XLA programs.

The reference's recurrent predictors loop over time in Python
(`model/TGCN/TGCN.py:168-169`, `model/MSDR/gmsdr_model.py:120,138`,
`model/CCRNN_demand/CCRNN.py:85-88`); here every cell is a flax module
whose `__call__(carry, x_t, *broadcast)` -> (carry', y_t) is lifted
over the time axis with `nn.scan` (params broadcast, one compiled
while-program, static shapes).

States are (B, N, H) node-feature maps; graph supports act on N.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gptst_tpu.ops.graph_conv import graph_matmul

xavier_normal = nn.initializers.xavier_normal()


class GraphGRUCell(nn.Module):
    """TGCN's GRU-with-graph-conv-gates (`model/TGCN/TGCN.py:71-129`).

    gates = sigmoid(W0 · A_norm [x ‖ h] + b0) -> r, u
    c     = tanh  (W1 · A_norm [x ‖ r*h] + b1)
    h'    = u * h + (1 - u) * c
    """

    num_units: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray,
                 support: jnp.ndarray):
        # h: (B, N, U), x: (B, N, D), support: (N, N)
        d = x.shape[-1]
        u_ = self.num_units
        w0 = self.param("weights_0", xavier_normal, (d + u_, 2 * u_))
        b0 = self.param("bias_0", nn.initializers.zeros, (2 * u_,))
        w1 = self.param("weights_1", xavier_normal, (d + u_, u_))
        b1 = self.param("bias_1", nn.initializers.zeros, (u_,))

        def gc(inp, state, w, b):
            z = jnp.concatenate([inp, state], axis=-1)
            return graph_matmul(support, z) @ w + b

        value = jax.nn.sigmoid(gc(x, h, w0, b0))
        r, u = jnp.split(value, 2, axis=-1)
        c = jnp.tanh(gc(x, r * h, w1, b1))
        h_new = u * h + (1.0 - u) * c
        return h_new, h_new


class GraphGRUCellNM(nn.Module):
    """Node-major, concat-free graph-GRU — same math and param tree as
    `GraphGRUCell`, laid out for the TPU sparse aggregation path.

    The batch-major cell pays, per aggregation, a (B,N,C)->(N,B*C)
    transpose plus a pad round-trip to the kernel's lane-aligned width
    (B*C = 8*65 = 520 -> 640) — measured at ~2.7x the kernel's own
    bytes (`scripts/tgcn_profile.py`: 0.814 ms/apply vs a ~0.25 ms
    kernel at 16k/B=8). This cell removes all of it:

    * states live node-major — h: (N, B, U), x_t: (N, B, D) — so the
      (N, B*F) view the kernel wants is a free reshape;
    * the reference's concat [x ‖ h] (`model/TGCN/TGCN.py:105,120`)
      never materializes: SpMM is columnwise, so
      A·[x ‖ h] == [A·x ‖ A·h] exactly, and the gate matmul splits as
      az @ W == (A·x) @ W[:D] + (A·h) @ W[D:];
    * A·x is shared by both gates (the reference computes it twice
      inside its two graph convs), so a step does aggregations of
      widths B*D, B*U, B*U — with B*U a lane multiple (512 at B=8,
      U=64) every wide application hits the kernels' zero-copy path.

    Values match `GraphGRUCell` to fp-association (the split matmul
    reassociates the K=D+U contraction as K=D plus K=U).
    """

    num_units: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray,
                 support) -> tuple:
        # h: (N, B, U), x: (N, B, D), support acting on N
        n, b, d = x.shape
        u_ = self.num_units
        w0 = self.param("weights_0", xavier_normal, (d + u_, 2 * u_))
        b0 = self.param("bias_0", nn.initializers.zeros, (2 * u_,))
        w1 = self.param("weights_1", xavier_normal, (d + u_, u_))
        b1 = self.param("bias_1", nn.initializers.zeros, (u_,))

        def agg(t):
            f = t.shape[-1]
            return graph_matmul(support, t.reshape(n, b * f)).reshape(
                n, b, f)

        ax = agg(x)
        ah = agg(h)
        gates = jax.nn.sigmoid(ax @ w0[:d] + ah @ w0[d:] + b0)
        r, u = jnp.split(gates, 2, axis=-1)
        arh = agg(r * h)
        c = jnp.tanh(ax @ w1[:d] + arh @ w1[d:] + b1)
        h_new = u * h + (1.0 - u) * c
        return h_new, h_new


# flax derives the scanned submodule's param path from the class
# __name__ ("ScanGraphGRUCell_0"); sharing the name keeps checkpoints
# and transplants layout-independent — the param TREE is identical,
# only the activation layout differs.
GraphGRUCellNM.__name__ = "GraphGRUCell"


def resolve_remat(remat: str, num_nodes: int,
                  threshold: int = 4096) -> str:
    """Resolve the "auto" policy: at >= `threshold` nodes the T-step
    residual stack dominates HBM and recomputing beats storing. The
    default fits the BATCH-MAJOR cells (CCRNN/STMGCN), whose recompute
    also skips the stored glue passes. Callers whose cells have
    cheaper residuals or pricier recomputes pass their own threshold:
    the node-major TGCN cell uses 131072 (with the concat and
    per-apply glue gone, its residual stack shrank enough that
    64k/batch-8 f32 fits stored — 296.0 ms vs 316.5 remat "full";
    16k: 41.0 vs 48.0 — remat's recomputed SpMM applications now cost
    more than the residual round-trips they replace); MSDR uses 32768
    (SpMM-heavy recompute, chunked two-level scan above it)."""
    if remat != "auto":
        return remat
    return "full" if num_nodes >= threshold else "none"


def remat_cell(cell_cls, remat: str = "none"):
    """Wrap a scan cell in activation rematerialization (`jax.checkpoint`
    lifted through flax). The backward pass of a T-step scan otherwise
    stores every cell's intermediate activations for all T steps —
    ~20 GB for TGCN at 64k nodes / batch 8 — which is what capped the
    round-4 driver bench at batch 4 (`bench.py` ladder). With remat the
    saved residuals shrink to the per-step carry (+ whatever the policy
    keeps) and the cell forward is recomputed during backward.

    remat: "none" (store everything), "full" (save only the policy-free
    minimum; ~1 extra forward of FLOPs in backward), or "dots" (save MXU
    dot outputs, recompute elementwise chains —
    `jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims`, the
    right trade for GRU-style cells whose residual bulk is elementwise
    gate activations). Values are bitwise-identical either way (same
    ops, recomputed): `tests/test_remat.py` asserts exact trajectory
    invariance.
    """
    if remat == "none":
        return cell_cls
    if remat == "full":
        policy = None
    elif remat == "dots":
        policy = jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
    else:
        raise ValueError(f"remat must be none|full|dots, got {remat!r}")
    # prevent_cse=False is safe (and faster) inside scan/while bodies,
    # which is the only place these cells run.
    wrapped = nn.remat(cell_cls, policy=policy, prevent_cse=False)
    # flax derives auto-names (and therefore param-tree paths and init
    # RNG folds) from the class __name__; restore the original so
    # remat on/off yields the SAME param tree — checkpoints stay
    # loadable and init is bitwise identical across modes.
    wrapped.__name__ = cell_cls.__name__
    return wrapped


def scan_over_time(cell_cls, n_broadcast: int = 1, remat: str = "none",
                   **cell_kwargs):
    """Lift a cell over the time axis of (B, T, N, D) inputs.

    cell_cls.__call__(carry, x_t, *broadcast_args) -> (carry', y_t).
    Returns a module called as m(h0, xs, *broadcast_args) ->
    (h_final, ys) with ys stacked on axis 1.
    """
    return nn.scan(
        remat_cell(cell_cls, remat),
        variable_broadcast="params",
        split_rngs={"params": False, "dropout": True},
        in_axes=tuple([1] + [nn.broadcast] * n_broadcast),
        out_axes=1,
    )(**cell_kwargs)
