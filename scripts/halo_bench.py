"""Ring-vs-fused halo SpMM bench (SURVEY §2.5 collective matmul row).

Compares the XLA-scheduled ppermute ring (`parallel/halo.py`) against
the Pallas fused ring collective-matmul kernel
(`kernels/halo_spmm.py`) on whatever mesh is available. On a CPU mesh
the fused kernel runs under the distributed interpreter — correctness
only, the timing is NOT meaningful; real timings need a multi-chip TPU
slice.

  PYTHONPATH=$PYTHONPATH:. python scripts/halo_bench.py --n 4096 --feat 128
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--feat", type=int, default=128)
    p.add_argument("--parts", type=int, default=None)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
    from gptst_tpu.kernels.halo_spmm import make_fused_ring_spmm
    from gptst_tpu.parallel.halo import make_ring_spmm
    from gptst_tpu.parallel.mesh import GRAPH_AXIS, make_mesh

    n_dev = len(jax.devices())
    parts = args.parts or n_dev
    on_cpu = jax.devices()[0].platform == "cpu"
    mesh = make_mesh(parts, graph_axis_size=parts)
    adj = sym_adj(random_sensor_graph(args.n, avg_degree=8, seed=0))

    ring, n_pad = make_ring_spmm(mesh, adj)
    fused, _ = make_fused_ring_spmm(mesh, adj, args.feat, interpret=on_cpu)

    x = np.random.default_rng(1).normal(
        size=(n_pad, args.feat)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P(GRAPH_AXIS, None)))
    want = adj @ x[: args.n]
    for name, fn in (("ring", ring), ("fused", fused)):
        got = np.asarray(fn(xs))[: args.n]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def timeit(fn):
        jax.block_until_ready(fn(xs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = fn(xs)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    result = {
        "n": args.n, "feat": args.feat, "parts": parts,
        "platform": jax.devices()[0].platform,
        "ring_ms": round(timeit(ring) * 1e3, 3),
        "fused_ms": round(timeit(fused) * 1e3, 3),
        "timing_meaningful": not on_cpu,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
