"""Weak-scaling sweep of the SPMD pretrain step (BASELINE.md table).

Runs the sharded training step on meshes of 1..N devices, holding the
per-device batch fixed (weak scaling), and reports samples/s and
efficiency vs the 1-device run. On a CPU host this exercises the
virtual-device path (`--cpu_devices 8`); on a pod slice, the real one.

  python scripts/scaling_bench.py --cpu_devices 8
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu_devices", type=int, default=0,
                   help="force N virtual CPU devices (0 = real backend)")
    p.add_argument("--per_device_batch", type=int, default=8)
    p.add_argument("--num_nodes", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}")
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from gptst_tpu.config import default_config
    from gptst_tpu.models.build import build_model
    from gptst_tpu.parallel import make_mesh, make_spmd_train_state, shard_batch

    results = []
    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    base = None
    for nd in sizes:
        g = 2 if nd % 2 == 0 and nd > 1 else 1
        cfg = default_config(
            "PEMS08", mode="pretrain", model="STGCN",
            num_nodes=args.num_nodes, change_epoch=1, log_dir=None,
            batch_size=args.per_device_batch * (nd // g))
        mesh = make_mesh(nd, graph_axis_size=g)
        init_fn, forward = build_model(cfg, scaler_zeros=0.0)
        params = init_fn(jax.random.PRNGKey(0))
        optimizer = optax.adam(1e-3)
        params, opt_state, step = make_spmd_train_state(
            cfg, mesh, forward, params, optimizer)
        x = jax.random.normal(
            jax.random.PRNGKey(1),
            (cfg.batch_size, cfg.lag, cfg.num_nodes, cfg.input_base_dim + 2))
        x, = shard_batch((x,), mesh)
        rng = jax.random.PRNGKey(2)
        ep = jnp.asarray(2, jnp.int32)
        sc = jnp.asarray(0, jnp.int32)
        for _ in range(2):
            params, opt_state, t, f = step(params, opt_state, x, x, rng, ep, sc)
        jax.block_until_ready(params)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, opt_state, t, f = step(params, opt_state, x, x, rng, ep, sc)
        jax.block_until_ready(params)
        dt = (time.perf_counter() - t0) / args.iters
        sps = cfg.batch_size / dt
        if base is None:
            base = sps / nd
        results.append({
            "devices": nd, "mesh": f"{nd // g}x{g}",
            "batch": cfg.batch_size, "ms_per_step": round(dt * 1e3, 2),
            "samples_per_s": round(sps, 1),
            "weak_scaling_eff": round(sps / (base * nd), 3),
        })
        print(json.dumps(results[-1]))


if __name__ == "__main__":
    main()
