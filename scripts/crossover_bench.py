"""Dense-vs-sparse aggregation crossover (VERDICT r2 #3a).

Times `A @ x` as (a) one dense MXU matmul and (b) the block-CSR Pallas
SpMM, over a grid of node counts on road-style graphs, and prints the
measured crossover — the evidence behind `ops/graph_conv.DENSE_THRESHOLD`.

  python scripts/crossover_bench.py --feat 128
  (do NOT add the repo root to PYTHONPATH — shadowing breaks the
  axon TPU plugin discovery; gptst_tpu is installed editable)
"""

from __future__ import annotations

import argparse
import json
import time


def _time_chained(fn, x, iters=50):
    """Time `x = fn(x)` chained — each dispatch consumes the previous
    output, so no layer (XLA, runtime, tunnel) can reuse a cached
    result for the repeated identical call (identical-arg loops
    measured impossibly fast on this backend)."""
    import jax

    jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(3):
        y = x
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(y)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--feat", type=int, default=128)
    p.add_argument("--degree", type=int, default=16)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--ns", type=str, default="512,1024,2048,4096,8192")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gptst_tpu.kernels.spmm import BlockCSR, spmm
    try:
        from scripts.spmm_bench import road_graph_edges
    except ImportError:  # run as `python scripts/crossover_bench.py`
        from spmm_bench import road_graph_edges

    rows_out = []
    for n in (int(s) for s in args.ns.split(",")):
        rows, cols = road_graph_edges(n, args.degree)
        nnz = rows.size
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(n, args.feat)).astype(np.float32))
        adj = np.zeros((n, n), np.float32)
        adj[rows, cols] = 1.0

        # row-normalize so chained products stay finite over `iters` hops
        deg = np.maximum(np.bincount(rows, minlength=n), 1)
        bcsr, bcsr_t = BlockCSR.pair_from_coo(
            rows, cols, (1.0 / deg[rows]).astype(np.float32), n)
        dense = jnp.asarray(adj / deg[:, None])
        sp_dt = _time_chained(
            jax.jit(lambda v: spmm(bcsr, bcsr_t, v)), x, iters=args.iters)
        de_dt = _time_chained(
            jax.jit(lambda v: dense @ v), x, iters=args.iters)
        rows_out.append({
            "n": n, "feat": args.feat,
            "dense_ms": round(de_dt * 1e3, 4),
            "sparse_ms": round(sp_dt * 1e3, 4),
            "sparse_speedup": round(de_dt / sp_dt, 3),
        })
        print(json.dumps(rows_out[-1]), flush=True)


if __name__ == "__main__":
    main()
