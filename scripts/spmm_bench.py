"""SpMM / SDDMM edges/s microbench (BASELINE.md throughput table).

Benchmarks the block-CSR Pallas SpMM (`gptst_tpu.kernels.spmm`) and the
SDDMM kernel on synthetic road-style sensor graphs (banded locality +
a small long-range fraction), and reports edges/s plus the achieved
fraction of the HBM speed-of-light:

  bytes/step ~= nnz_blocks * TB^2 * 4   (block values, streamed)
              + 2 * N * C * 4           (x read + out write)
  SoL time = bytes / HBM_BW

Timing methodology: `iters` kernel applications are CHAINED INSIDE ONE
jit (lax.fori_loop whose carry feeds the next call) and the total is
divided by `iters`. Per-dispatch timing is useless on this backend —
the axon tunnel has a ~0.6-1 ms dispatch floor that dominates any
sub-millisecond kernel (measured: a 0.27 GFLOP probe kernel and a
4096^2 dense matmul both "take" ~0.6-1 ms dispatched individually).
The adjacency is row-normalized so chained products stay finite.

  python -c "import sys; sys.argv=['x','--n','16384']; \
             import runpy; runpy.run_path('scripts/spmm_bench.py', \
             run_name='__main__')"
  (run from the repo root; do NOT add the repo root to PYTHONPATH —
  shadowing breaks the axon TPU plugin discovery)
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


def time_chained(step_fn, x0, iters=32, reps=3, operands=()):
    """Time x -> step_fn(x, *operands) chained `iters` times inside ONE
    jit, anchored by a host fetch of a scalar that depends on the whole
    chain.

    Every layer of this is load-bearing on the axon tunnel backend
    (each was added after a measured pathology):
      * in-jit chaining (fori_loop carry): amortizes the ~1 ms
        per-dispatch floor over `iters` kernel applications;
      * operands as jit ARGUMENTS, not closures: closure-captured jax
        Arrays are baked into the lowered module as literals — a 16k
        BlockCSR produced an HTTP 413 compile request;
      * cross-dispatch carry (y = fn(y)): repeated identical calls are
        served from a result cache (an 8192^2 dense matmul "measured"
        2 us re-dispatched verbatim);
      * the SCALAR FETCH anchor: `block_until_ready` does not reliably
        wait on this backend (32 chained 8192^2 matmuls "completed" in
        67 us under block_until_ready alone). float(jnp.sum(y)) cannot
        lie — the value depends on every chained application.
    The anchor's cost (~ms, variance-heavy d2h RTT) would swamp
    microsecond ops, so it is cancelled by GROUP DIFFERENCING: time a
    1-dispatch group and a 3-dispatch group of the same chained
    executable, each ending in one fetch; (t3 - t1)/2 leaves only the
    chained work plus a ~2 us enqueue per dispatch."""
    import jax
    import jax.numpy as jnp

    def run(x, *ops):
        return jax.lax.fori_loop(
            0, iters, lambda i, v: step_fn(v, *ops), x)

    fn = jax.jit(run)
    sum_fn = jax.jit(jnp.sum)
    y = fn(x0, *operands)
    s = float(sum_fn(y))
    assert s == s, "chain produced NaN"

    def group(m):
        nonlocal y
        t0 = time.perf_counter()
        for _ in range(m):
            y = fn(y, *operands)
        float(sum_fn(y))
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(reps):
        t1 = group(1)
        t3 = group(3)
        best = min(best, max(t3 - t1, 1e-9) / (2 * iters))
    return best


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--degree", type=int, default=16)
    p.add_argument("--band", type=int, default=48)
    p.add_argument("--feat", type=int, default=128)
    p.add_argument("--tile", type=int, default=128)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--rank", type=int, default=10,
                   help="embedding rank for the SDDMM bench")
    p.add_argument("--bf16_vals", action="store_true",
                   help="bf16 block values (halved adjacency traffic)")
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
    # row-normalize so chained products stay finite over `iters` hops
    deg = np.maximum(np.bincount(rows, minlength=n), 1)
    vals = (1.0 / deg[rows]).astype(np.float32)
    vdt = jnp.bfloat16 if args.bf16_vals else jnp.float32
    bcsr, bcsr_t = BlockCSR.pair_from_coo(rows, cols, vals, n,
                                          tile=args.tile, vals_dtype=vdt)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, args.feat)).astype(np.float32))

    out = jax.jit(spmm)(bcsr, bcsr_t, x)
    # correctness probe vs on-device dense matmul on a row slice
    adj_head = np.zeros((512, n), np.float32)
    head = rows < 512
    adj_head[rows[head], cols[head]] = vals[head]
    want = jax.jit(lambda a, v: a @ v)(jnp.asarray(adj_head), x)
    np.testing.assert_allclose(np.asarray(out[:512]), np.asarray(want),
                               rtol=2e-2 if args.bf16_vals else 1e-4,
                               atol=2e-2 if args.bf16_vals else 1e-4)

    best = time_chained(lambda v, a, at: spmm(a, at, v), x,
                        iters=args.iters, operands=(bcsr, bcsr_t))

    nnzb = int(bcsr.block_vals.shape[0])
    vb = bcsr.block_vals.dtype.itemsize
    bytes_step = nnzb * args.tile * args.tile * vb + 2 * n * args.feat * 4
    sol_time = bytes_step / (args.hbm_gbps * 1e9)

    result = {
        "n": n, "nnz": nnz, "feat": args.feat, "nnz_blocks": nnzb,
        "vals_dtype": "bfloat16" if args.bf16_vals else "float32",
        "block_density": round(
            nnzb / ((bcsr.n_pad // args.tile) ** 2), 4),
        "ms_per_spmm": round(best * 1e3, 4),
        "edge_feat_per_s_G": round(nnz * args.feat / best / 1e9, 2),
        "edges_per_s_G": round(nnz / best / 1e9, 3),
        "sol_fraction": round(sol_time / best, 3),
    }

    # dense comparison while N^2 fits comfortably in HBM
    if n <= 8192:
        adj = np.zeros((n, n), np.float32)
        adj[rows, cols] = vals
        dense = jnp.asarray(adj)
        dense_dt = time_chained(lambda v, a: a @ v, x, iters=args.iters,
                                operands=(dense,))
        result["dense_ms"] = round(dense_dt * 1e3, 4)
        result["speedup_vs_dense"] = round(dense_dt / best, 2)

    # SDDMM: sampled E1 @ E2 on the same pattern. Chained via a
    # magnitude-preserving carry: e1 * (1 + sum(vals)*1e-30) == e1
    # bit-exactly in f32 (1 + ~1e-27 rounds to 1) but keeps a real
    # data dependency, so no layer can CSE the repeated call.
    pattern = SDDMMPattern.from_bcsr(bcsr)
    e1 = jnp.asarray(rng.normal(size=(n, args.rank)).astype(np.float32))
    e2 = jnp.asarray(rng.normal(size=(args.rank, n)).astype(np.float32))

    def sddmm_step(e, pat, e2op):
        v = sddmm(pat, e, e2op)
        return e * (1.0 + v.sum() * 1e-30)

    sd_best = time_chained(sddmm_step, e1, iters=args.iters,
                           operands=(pattern, e2))
    sd_bytes = (nnzb * args.tile * args.tile * 4          # block out
                + 2 * nnzb * args.tile * 128 * 4)          # e1/e2 tiles
    result["sddmm_ms"] = round(sd_best * 1e3, 4)
    result["sddmm_edges_per_s_G"] = round(nnz / sd_best / 1e9, 3)
    result["sddmm_sol_fraction"] = round(
        sd_bytes / (args.hbm_gbps * 1e9) / sd_best, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
