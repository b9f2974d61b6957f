"""SpMM / SDDMM edges/s microbench (BASELINE.md throughput table).

Benchmarks the block-CSR Pallas SpMM (`gptst_tpu.kernels.spmm`) and the
SDDMM kernel on synthetic road-style sensor graphs (banded locality +
a small long-range fraction), and reports edges/s plus the achieved
fraction of the HBM speed-of-light:

  bytes/step ~= nnz_blocks * TB^2 * 4   (block values, streamed)
              + 2 * N * C * 4           (x read + out write)
  SoL time = bytes / HBM_BW

  PYTHONPATH=$PYTHONPATH:. python scripts/spmm_bench.py --n 16384
"""

from __future__ import annotations

import argparse
import json
import time


def road_graph_edges(n: int, degree: int, band: int = 48,
                     p_far: float = 0.02, seed: int = 0):
    """Banded local edges (road-network locality) + a small long-range
    fraction. Returns (rows, cols) with ~n*degree edges."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), degree)
    local = rng.integers(-band, band + 1, size=rows.shape)
    cols = np.clip(rows + local, 0, n - 1)
    far = rng.random(rows.shape) < p_far
    cols[far] = rng.integers(0, n, size=int(far.sum()))
    keep = rows != cols
    rows, cols = rows[keep], cols[keep]
    # dedup (multi-edges would double-count in the COO build)
    key = np.unique(rows.astype(np.int64) * n + cols)
    return key // n, key % n


def _time(fn, *args, iters=50):
    import jax

    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--degree", type=int, default=16)
    p.add_argument("--band", type=int, default=48)
    p.add_argument("--feat", type=int, default=128)
    p.add_argument("--tile", type=int, default=128)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--rank", type=int, default=10,
                   help="embedding rank for the SDDMM bench")
    p.add_argument("--hbm_gbps", type=float, default=819.0,
                   help="chip HBM bandwidth (v5e: 819 GB/s)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gptst_tpu.kernels.sddmm import SDDMMPattern, sddmm
    from gptst_tpu.kernels.spmm import BlockCSR, spmm

    n = args.n
    rows, cols = road_graph_edges(n, args.degree, args.band)
    nnz = rows.size
    bcsr, bcsr_t = BlockCSR.pair_from_coo(
        rows, cols, np.ones(nnz, np.float32), n, tile=args.tile)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, args.feat)).astype(np.float32))

    fn = jax.jit(spmm)
    out = fn(bcsr, bcsr_t, x)
    # correctness probe vs on-device dense matmul on a row slice
    adj_head = np.zeros((512, n), np.float32)
    head = rows < 512
    adj_head[rows[head], cols[head]] = 1.0
    want = jax.jit(lambda a, v: a @ v)(jnp.asarray(adj_head), x)
    np.testing.assert_allclose(np.asarray(out[:512]), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    best = _time(fn, bcsr, bcsr_t, x, iters=args.iters)

    nnzb = int(bcsr.block_vals.shape[0])
    bytes_step = nnzb * args.tile * args.tile * 4 + 2 * n * args.feat * 4
    sol_time = bytes_step / (args.hbm_gbps * 1e9)

    result = {
        "n": n, "nnz": nnz, "feat": args.feat, "nnz_blocks": nnzb,
        "block_density": round(
            nnzb / ((bcsr.n_pad // args.tile) ** 2), 4),
        "ms_per_spmm": round(best * 1e3, 3),
        "edge_feat_per_s_G": round(nnz * args.feat / best / 1e9, 2),
        "edges_per_s_G": round(nnz / best / 1e9, 3),
        "sol_fraction": round(sol_time / best, 3),
    }

    # dense comparison while N^2 fits comfortably in HBM
    if n <= 8192:
        adj = np.zeros((n, n), np.float32)
        adj[rows, cols] = 1.0
        dense = jnp.asarray(adj)
        dense_dt = _time(jax.jit(lambda a, v: a @ v), dense, x,
                         iters=args.iters)
        result["dense_ms"] = round(dense_dt * 1e3, 3)
        result["speedup_vs_dense"] = round(dense_dt / best, 2)

    # SDDMM: sampled E1 @ E2 on the same pattern
    pattern = SDDMMPattern.from_bcsr(bcsr)
    e1 = jnp.asarray(rng.normal(size=(n, args.rank)).astype(np.float32))
    e2 = jnp.asarray(rng.normal(size=(args.rank, n)).astype(np.float32))
    sfn = jax.jit(sddmm)
    sd_best = _time(sfn, pattern, e1, e2, iters=args.iters)
    sd_bytes = (nnzb * args.tile * args.tile * 4          # block out
                + 2 * nnzb * args.tile * 128 * 4)          # e1/e2 tiles
    result["sddmm_ms"] = round(sd_best * 1e3, 3)
    result["sddmm_edges_per_s_G"] = round(nnz / sd_best / 1e9, 3)
    result["sddmm_sol_fraction"] = round(
        sd_bytes / (args.hbm_gbps * 1e9) / sd_best, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
