"""MSDR step breakdown (VERDICT r4 weak #3/#4): where do the 502 ms at
16k nodes go?

The tunneled backend's profiler is unreliable for sub-ms attribution
(BASELINE.md "the axon tunnel lies four ways"), so the breakdown is by
ABLATION: each arm times a jitted program containing a subset of the
step's work through the anchored harness (`time_chained`), and the
differences attribute cost to components:

  full        - fwd+bwd+Adam train step (the product step)
  fwd         - forward only
  fwd_noatt   - forward, pre_k attention replaced by the last state
  fwd_nogconv - forward, diffusion gconv replaced by a plain linear
  supports    - the per-forward sparse-adaptive support builds alone
  spmm_unit   - one aggregation application at the step's feature width

  python scripts/msdr_profile.py --n 16384 --batch 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_case(n: int, batch: int, remat: str = "none"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gptst_tpu.kernels.sddmm import SDDMMPattern
    from gptst_tpu.kernels.spmm import BlockCSR, coo_split_mask
    from gptst_tpu.models.predictors.msdr import MSDR, MSDRConfig
    from gptst_tpu.ops.graph_conv import make_support_coo
    from scripts.spmm_bench import road_graph_edges

    rows, cols = road_graph_edges(n, 16, 48)
    r, c = rows, cols
    deg_out = np.maximum(np.bincount(r, minlength=n), 1)
    deg_in = np.maximum(np.bincount(c, minlength=n), 1)
    su1 = make_support_coo(c, r, (1.0 / deg_out[r]).astype(np.float32),
                           n, reorder=False, vals_dtype=jnp.bfloat16)
    su2 = make_support_coo(r, c, (1.0 / deg_in[c]).astype(np.float32),
                           n, reorder=False, vals_dtype=jnp.bfloat16)
    mk = coo_split_mask(c, r, n)
    pat = SDDMMPattern.from_bcsr(BlockCSR.from_coo(
        c[mk], r[mk], (1.0 / deg_out[r]).astype(np.float32)[mk], n))
    sup = ((su1, su2), pat)
    cfg = MSDRConfig(num_nodes=n, rnn_units=64, num_rnn_layers=2,
                     remat=remat)
    model = MSDR(cfg=cfg, dim_in=1, dim_out=1, horizon=12)
    rng = jax.random.PRNGKey(0)
    xb = jax.random.normal(rng, (batch, 12, n, 1), jnp.float32)
    yb = jax.random.normal(jax.random.PRNGKey(1), (batch, 12, n, 1))
    params = model.init(jax.random.PRNGKey(2), xb, *sup)
    return model, cfg, params, xb, yb, sup, (r, c)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--remat", default="none")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from gptst_tpu.models.predictors import msdr as msdr_mod
    from scripts.spmm_bench import time_chained

    model, cfg, params, xb, yb, sup, (r, c) = build_case(
        args.n, args.batch, args.remat)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    opt_state = tx.init(params)
    out = {"n": args.n, "batch": args.batch, "nnz": int(r.size),
           "remat": args.remat}

    def run(tag, fn, carry, operands, iters=None):
        per, info = time_chained(fn, carry, iters=iters or args.iters,
                                 operands=operands)
        out[tag] = {"ms": round(per * 1e3, 3), "valid": info["valid"]}
        print(json.dumps({tag: out[tag]}), flush=True)

    # full train step
    def train_step(carry, x, y, s):
        p, o = carry

        def loss_fn(q):
            pred = model.apply(q, x, *s)
            return jnp.abs(pred - y).mean()

        _, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return (optax.apply_updates(p, up), o)

    run("full", train_step, (params, opt_state), (xb, yb, sup))

    # forward only (carry the input, apply params as operand —
    # perturbation rides the carry so dispatches stay distinct)
    def fwd(x, p, s):
        return x + 1e-6 * model.apply(p, x[:, :12], *s).mean()

    x24 = jnp.concatenate([xb, xb], axis=1)

    def fwd_c(x, p, s):
        return x.at[:, :12].add(1e-6 * model.apply(p, x[:, :12], *s))

    run("fwd", fwd_c, xb, (params, sup))

    # ablation cells: proper GMSDRCell subclasses (monkeypatching a
    # flax Module's __call__ post-construction defeats the metaclass's
    # compact wrapping), swapped in via the module-global name that
    # _SeqStep resolves at trace time. Param names/shapes match the
    # real cell, so the trained `params` tree applies unchanged.
    import flax.linen as fnn

    class _CellNoAtt(msdr_mod.GMSDRCell):
        """pre_k attention replaced by the last state."""

        @fnn.compact
        def __call__(self, hx_k, x, supports, adp):
            c = self.cfg
            B, K, N, U = hx_k.shape
            pre_h = hx_k[:, -c.pre_v:]
            pre_h = jnp.moveaxis(pre_h, 1, 2).reshape(B, N, c.pre_v * U)
            z = jnp.concatenate([x, pre_h], axis=-1)
            from gptst_tpu.ops.graph_conv import graph_matmul
            mats = [z]
            for s_ in supports:
                mats.append(graph_matmul(s_, z))
            mats.append(graph_matmul(adp, z))
            zdim = z.shape[-1]
            gw = self.param("gconv_w", msdr_mod.xavier_normal,
                            (len(mats) * zdim, U))
            gb = self.param("gconv_b", fnn.initializers.constant(1.0),
                            (U,))
            pre = gb
            for i, m in enumerate(mats):
                pre = pre + m @ gw[i * zdim:(i + 1) * zdim]
            conv = fnn.leaky_relu(pre)
            w = self.param("W", fnn.initializers.zeros, (U, U))
            b = self.param("b", fnn.initializers.zeros,
                           (c.num_nodes, U))
            self.param("R", fnn.initializers.zeros,
                       (c.pre_k, c.num_nodes, U))
            self.param("att_w", fnn.initializers.zeros,
                       (c.num_nodes * U, 1))
            self.param("att_b", fnn.initializers.zeros, (1,))
            output = conv @ w + b[None] + hx_k[:, -1]
            hx_k = jnp.concatenate([hx_k[:, 1:], output[:, None]],
                                   axis=1)
            return hx_k, output

    class _CellNoGconv(msdr_mod.GMSDRCell):
        """diffusion gconv replaced by repeated-z dots (no SpMM)."""

        @fnn.compact
        def __call__(self, hx_k, x, supports, adp):
            c = self.cfg
            B, K, N, U = hx_k.shape
            pre_h = hx_k[:, -c.pre_v:]
            pre_h = jnp.moveaxis(pre_h, 1, 2).reshape(B, N, c.pre_v * U)
            z = jnp.concatenate([x, pre_h], axis=-1)
            nm = 2 + 2 * (c.max_diffusion_step - 1) + c.max_diffusion_step
            mats = [z] * (nm + 1)
            zdim = z.shape[-1]
            gw = self.param("gconv_w", msdr_mod.xavier_normal,
                            (len(mats) * zdim, U))
            gb = self.param("gconv_b", fnn.initializers.constant(1.0),
                            (U,))
            pre = gb
            for i, m in enumerate(mats):
                pre = pre + m @ gw[i * zdim:(i + 1) * zdim]
            conv = fnn.leaky_relu(pre)
            w = self.param("W", fnn.initializers.zeros, (U, U))
            b = self.param("b", fnn.initializers.zeros,
                           (c.num_nodes, U))
            r_ = self.param("R", fnn.initializers.zeros,
                            (c.pre_k, c.num_nodes, U))
            att_w = self.param("att_w", fnn.initializers.zeros,
                               (c.num_nodes * U, 1))
            att_b = self.param("att_b", fnn.initializers.zeros, (1,))
            aw = att_w.reshape(N, U)
            r_dot = jnp.einsum("knu,nu->k", r_, aw)
            logits = (jnp.einsum("bknu,nu->bk", hx_k, aw)
                      + r_dot[None] + att_b)
            weight = jax.nn.softmax(logits, axis=1)
            att = (jnp.einsum("bk,bknu->bnu", weight, hx_k)
                   + jnp.einsum("bk,knu->bnu", weight, r_))
            output = conv @ w + b[None] + att
            hx_k = jnp.concatenate([hx_k[:, 1:], output[:, None]],
                                   axis=1)
            return hx_k, output

    orig_cell = msdr_mod.GMSDRCell
    for tag, cell_cls in (("fwd_noatt", _CellNoAtt),
                          ("fwd_nogconv", _CellNoGconv)):
        msdr_mod.GMSDRCell = cell_cls
        try:
            run(tag, fwd_c, xb, (params, sup))
        except Exception as e:
            out[tag] = {"error": str(e)[:150]}
            print(json.dumps({tag: out[tag]}), flush=True)
        finally:
            msdr_mod.GMSDRCell = orig_cell

    # the 4 per-forward adaptive support builds alone
    from gptst_tpu.kernels.sddmm import adaptive_support

    pat = sup[1]
    e1 = jax.random.normal(jax.random.PRNGKey(5), (args.n, cfg.adapt_rank))
    e2 = jax.random.normal(jax.random.PRNGKey(6), (cfg.adapt_rank, args.n))

    def supports_only(e, pattern):
        a, b_ = e
        s = adaptive_support(pattern, a, b_)
        # consume the support so it isn't DCE'd; ride the carry
        return (a + 1e-9 * s.bcsr.block_vals.astype(jnp.float32).sum(), b_)

    run("adaptive_support_x1", supports_only, (e1, e2), (pat,), iters=8)

    # one aggregation at the step's feature width (z = U + pre_v*U=128)
    from gptst_tpu.ops.graph_conv import graph_matmul

    z = jax.random.normal(jax.random.PRNGKey(7),
                          (args.batch, args.n, 128), jnp.float32)

    def spmm_unit(zc, s):
        return graph_matmul(s[0][0], zc)

    run("spmm_unit_128feat", spmm_unit, z, (sup,), iters=16)

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
