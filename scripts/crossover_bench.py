"""Dense-vs-sparse aggregation crossover (VERDICT r2 #3a).

Times `A @ x` as (a) one dense MXU matmul and (b) the block-CSR Pallas
SpMM, over a grid of node counts on road-style graphs, and prints the
measured crossover — the evidence behind `ops/graph_conv.DENSE_THRESHOLD`.

Timing: chained inside one jit (`spmm_bench.time_chained`) — individual
dispatches on this backend pay a ~0.6-1 ms tunnel floor that would
swamp every sub-millisecond matmul in the sweep.

  python -c "import sys; sys.argv=['x','--feat','128']; \
             import runpy; runpy.run_path('scripts/crossover_bench.py', \
             run_name='__main__')"
  (run from the repo root; do NOT add the repo root to PYTHONPATH —
  shadowing breaks the axon TPU plugin discovery)
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--feat", type=int, default=128)
    p.add_argument("--degree", type=int, default=16)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--ns", type=str, default="512,1024,2048,4096,8192")
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from gptst_tpu.kernels.spmm import BlockCSR, spmm
    try:
        from scripts.spmm_bench import road_graph_edges, time_chained
    except ImportError:  # run via runpy from the repo root
        import sys
        sys.path.insert(0, "scripts")
        from spmm_bench import road_graph_edges, time_chained

    rows_out = []
    for n in (int(s) for s in args.ns.split(",")):
        rows, cols = road_graph_edges(n, args.degree)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(n, args.feat)).astype(np.float32))
        adj = np.zeros((n, n), np.float32)
        adj[rows, cols] = 1.0

        # row-normalize so chained products stay finite over `iters` hops
        deg = np.maximum(np.bincount(rows, minlength=n), 1)
        bcsr, bcsr_t = BlockCSR.pair_from_coo(
            rows, cols, (1.0 / deg[rows]).astype(np.float32), n)
        dense = jnp.asarray(adj / deg[:, None])
        sp_dt, sp_info = time_chained(
            lambda v, a, at: spmm(a, at, v), x,
            iters=args.iters, operands=(bcsr, bcsr_t))
        de_dt, de_info = time_chained(
            lambda v, a: a @ v, x, iters=args.iters, operands=(dense,))
        rows_out.append({
            "n": n, "feat": args.feat,
            "dense_ms": round(de_dt * 1e3, 4),
            "sparse_ms": round(sp_dt * 1e3, 4),
            "sparse_speedup": round(de_dt / sp_dt, 3),
            "valid": bool(sp_info["valid"] and de_info["valid"]),
        })
        print(json.dumps(rows_out[-1]), flush=True)


if __name__ == "__main__":
    main()
