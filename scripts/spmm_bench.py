"""SpMM edges/s microbench (BASELINE.md throughput table).

Benchmarks the block-CSR Pallas SpMM (`gptst_tpu.kernels.spmm`) against
the dense einsum on synthetic sensor graphs, and reports edges/s plus
the achieved fraction of the HBM speed-of-light:

  bytes/step ~= nnz_blocks * TB^2 * 4   (block values, streamed)
              + 2 * N * C * 4           (x read + out write)
  SoL steps/s = HBM_BW / bytes ;  SoL edges/s = nnz * SoL steps/s

  python scripts/spmm_bench.py --n 16384 --degree 16 --feat 128
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--degree", type=int, default=16)
    p.add_argument("--feat", type=int, default=128)
    p.add_argument("--tile", type=int, default=128)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--hbm_gbps", type=float, default=819.0,
                   help="chip HBM bandwidth (v5e: 819 GB/s)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gptst_tpu.kernels.spmm import BlockCSR, spmm

    rng = np.random.default_rng(0)
    n, deg = args.n, args.degree
    # clustered graph: most edges near the diagonal (realistic sensor
    # locality -> nonzero block structure), plus random long-range ones
    rows = np.repeat(np.arange(n), deg)
    local = rng.integers(-64, 64, size=rows.shape)
    cols = np.where(rng.random(rows.shape) < 0.9,
                    np.clip(rows + local, 0, n - 1),
                    rng.integers(0, n, size=rows.shape))
    adj = np.zeros((n, n), np.float32)
    adj[rows, cols] = 1.0
    nnz = int(adj.sum())

    bcsr = BlockCSR.from_dense(adj, tile=args.tile)
    bcsr_t = bcsr.transpose()
    x = jnp.asarray(rng.normal(size=(n, args.feat)).astype(np.float32))

    fn = jax.jit(spmm)
    out = fn(bcsr, bcsr_t, x)
    # correctness probe vs the on-device dense matmul (both sides use
    # the MXU's bf16-multiply f32-accumulate path)
    want = jax.jit(lambda a, v: a @ v)(jnp.asarray(adj[:512]), x)
    np.testing.assert_allclose(np.asarray(out[:512]), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    jax.block_until_ready(fn(bcsr, bcsr_t, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(bcsr, bcsr_t, x)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / args.iters)

    nnzb = int(bcsr.block_vals.shape[0])
    bytes_step = nnzb * args.tile * args.tile * 4 + 2 * n * args.feat * 4
    sol_steps = args.hbm_gbps * 1e9 / bytes_step
    edges_s = nnz * args.feat / best  # edge-feature products per second

    # dense comparison (only viable while N^2 fits)
    dense = jnp.asarray(adj)
    dfn = jax.jit(lambda a, v: a @ v)
    jax.block_until_ready(dfn(dense, x))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = dfn(dense, x)
    jax.block_until_ready(out)
    dense_dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "n": n, "nnz": nnz, "feat": args.feat,
        "nnz_blocks": nnzb, "block_density": round(
            nnzb / (bcsr.row_tiles * bcsr.n_pad // args.tile), 4),
        "ms_per_spmm": round(best * 1e3, 3),
        "edge_feat_per_s": round(edges_s / 1e9, 2),
        "unit": "G edge-features/s",
        "dense_ms": round(dense_dt * 1e3, 3),
        "speedup_vs_dense": round(dense_dt / best, 2),
        "sol_fraction": round(1.0 / (best * sol_steps), 3),
    }))


if __name__ == "__main__":
    main()
