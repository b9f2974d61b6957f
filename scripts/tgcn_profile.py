"""TGCN step breakdown (STATUS r5 "known limits": the 16k f32 step sits
at ~0.42 of measured-achievable; the named lever is a fused GRU-gate
cell). Before building a kernel, attribute the time.

Same ablation method as `scripts/msdr_profile.py` (the tunneled
profiler is unreliable for sub-ms attribution): each arm times a jitted
subset of the step through the anchored harness and differences
attribute cost:

  full_remat_full - the product train step (remat=full, the >=4096 default)
  full_remat_none - train step storing residuals (the r4 path)
  fwd             - forward only
  fwd_noagg       - forward, graph aggregation replaced by identity
  spmm_unit       - one aggregation application at the cell's width (65)
  readout_unit    - the horizon readout dense alone

  python scripts/tgcn_profile.py --n 16384 --batch 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import flax.linen as fnn
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gptst_tpu.models.predictors.tgcn import TGCN, TGCNConfig
    from gptst_tpu.ops.graph_conv import graph_matmul, make_support_coo
    from gptst_tpu.ops.recurrent import GraphGRUCell, scan_over_time
    from scripts.spmm_bench import road_graph_edges, time_chained

    n, batch = args.n, args.batch
    rows, cols = road_graph_edges(n, 16, 48)
    r = np.concatenate([rows, np.arange(n)])
    c = np.concatenate([cols, np.arange(n)])
    deg = np.bincount(r, minlength=n).astype(np.float64)
    vals = (1.0 / np.sqrt(deg[r] * deg[c])).astype(np.float32)
    sup = make_support_coo(r, c, vals, n, reorder=False,
                           vals_dtype=jnp.bfloat16)

    dt = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    xb = jax.random.normal(rng, (batch, 12, n, 1), jnp.float32)
    yb = jax.random.normal(jax.random.PRNGKey(1), (batch, 12, n, 1))
    out = {"n": n, "batch": batch, "dtype": args.dtype}

    def run(tag, fn, carry, operands, iters=None, donate=False):
        per, info = time_chained(fn, carry, iters=iters or args.iters,
                                 operands=operands, donate=donate)
        out[tag] = {"ms": round(per * 1e3, 3), "valid": info["valid"]}
        print(json.dumps({tag: out[tag]}), flush=True)

    bf16 = args.dtype == "bfloat16"

    def _cast(t):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)

    for tag, rm in (("full_remat_full", "full"), ("full_remat_none", "none")):
        model = TGCN(cfg=TGCNConfig(num_nodes=n, rnn_units=64, remat=rm),
                     dim_in=1, dim_out=1, horizon=12)
        params = model.init(jax.random.PRNGKey(2), xb, sup)
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
        opt_state = tx.init(params)

        def train_step(carry, x, y, s, model=model, tx=tx):
            p, o = carry

            def loss_fn(q):
                if bf16:
                    q, x_ = _cast(q), _cast(x)
                else:
                    x_ = x
                pred = model.apply(q, x_, s).astype(jnp.float32)
                return jnp.abs(pred - y).mean()

            _, g = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(g, o, p)
            return (optax.apply_updates(p, up), o)

        run(tag, train_step, (params, opt_state), (xb, yb, sup), donate=True)

    # forward only (perturbation rides the carry)
    model = TGCN(cfg=TGCNConfig(num_nodes=n, rnn_units=64, remat="none"),
                 dim_in=1, dim_out=1, horizon=12)
    params = model.init(jax.random.PRNGKey(2), xb, sup)
    pc = _cast(params) if bf16 else params

    def fwd(x, p, s):
        xi = x.astype(dt) if bf16 else x
        return x + 1e-6 * model.apply(p, xi, s).astype(jnp.float32)

    run("fwd", fwd, xb, (pc, sup))

    # forward, aggregation ablated to identity (same param names/shapes
    # as GraphGRUCell so the structure matches; fresh init is fine for
    # timing)
    class _CellNoAgg(GraphGRUCell):
        @fnn.compact
        def __call__(self, h, x, support):
            d = x.shape[-1]
            u_ = self.num_units
            xav = fnn.initializers.xavier_normal()
            w0 = self.param("weights_0", xav, (d + u_, 2 * u_))
            b0 = self.param("bias_0", fnn.initializers.zeros, (2 * u_,))
            w1 = self.param("weights_1", xav, (d + u_, u_))
            b1 = self.param("bias_1", fnn.initializers.zeros, (u_,))
            z = jnp.concatenate([x, h], axis=-1)
            value = jax.nn.sigmoid(z @ w0 + b0)
            rr, u = jnp.split(value, 2, axis=-1)
            z2 = jnp.concatenate([x, rr * h], axis=-1)
            cc = jnp.tanh(z2 @ w1 + b1)
            h_new = u * h + (1.0 - u) * cc
            return h_new, h_new

    class _TGCNNoAgg(fnn.Module):
        @fnn.compact
        def __call__(self, x, support):
            B, _, N, _ = x.shape
            scanned = scan_over_time(_CellNoAgg, num_units=64)
            h0 = jnp.zeros((B, N, 64), x.dtype)
            h, _ = scanned(h0, x, support)
            o = fnn.Dense(12)(h)
            return jnp.transpose(o.reshape(B, N, 12, 1), (0, 2, 1, 3))

    na = _TGCNNoAgg()
    pna = na.init(jax.random.PRNGKey(2), xb, sup)
    pna = _cast(pna) if bf16 else pna

    def fwd_na(x, p, s):
        xi = x.astype(dt) if bf16 else x
        return x + 1e-6 * na.apply(p, xi, s).astype(jnp.float32)

    run("fwd_noagg", fwd_na, xb, (pna, sup))

    # one aggregation at the cell's concat width (65 -> lane-padded 128)
    z = jax.random.normal(jax.random.PRNGKey(7), (batch, n, 65), dt)

    def spmm_unit(zc, s):
        return graph_matmul(s, zc)

    run("spmm_unit_65feat", spmm_unit, z, (sup,), iters=16)

    # the readout dense alone: (B,N,64) @ (64,12)
    h = jax.random.normal(jax.random.PRNGKey(8), (batch, n, 64), dt)
    wd = jax.random.normal(jax.random.PRNGKey(9), (64, 12), dt)

    def readout(hc, w):
        return hc.at[:, :, :12].add(1e-6 * (hc @ w))

    run("readout_unit", readout, h, (wd,), iters=16)

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
