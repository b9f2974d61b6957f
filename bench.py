"""Benchmark: GPT-ST pretrain train-step throughput on PEMS08 shapes.

Runs the full jitted training step (forward + masked-MAE + KL + grads +
Adam) at reference scale (N=170 nodes, B=64, T=12, hidden 64) on the
default JAX backend, in BOTH precision modes (f32 default and the
bfloat16 mixed-precision recipe, `train/step.py:make_loss_terms`), and
prints ONE JSON line:

  {"metric": ..., "value": samples/s, "unit": "samples/s",
   "vs_baseline": r, "f32_samples_per_s": ..., "bf16_samples_per_s": ...}

The headline value is the faster measured mode (`fast_mode` in the
output; bf16's drift vs f32 is bounded by `tests/test_bf16_drift.py`—
at reference scale the convert overhead can make f32 the faster). The
reference publishes no throughput numbers (BASELINE.md §Throughput);
`vs_baseline` divides the headline by
BASELINE.json["recorded"]["pretrain_samples_per_s"] when present (else
1.0) — currently the round-3 anchored bf16 figure, so when `fast_mode`
is float32 the ratio compares across precision modes.
"""

from __future__ import annotations

import json
import sys
import time


def measure(cfg, k: int = 32, iters: int = 10, windows: int = 6) -> float:
    """Best-window samples/s of the scan-fused train step under `cfg`."""
    import jax
    import jax.numpy as jnp
    import optax

    from gptst_tpu.models.build import build_model
    from gptst_tpu.train.loss import build_loss
    from gptst_tpu.train.step import make_loss_terms, make_scanned_train_step

    # throughput basis: TPU-default matmul precision (one-pass bf16
    # multiplies for f32 operands) — the same basis as every recorded
    # round's numbers. The CLI's f32 ACCURACY mode now resolves to
    # 'highest' (true-f32 contractions, reference parity — see
    # FrameworkConfig.matmul_precision); that mode trades throughput
    # for the torch-matching convergence the lift experiment measures.
    if cfg.compute_dtype == "bfloat16":
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    else:
        jax.config.update("jax_default_matmul_precision", "default")

    init_fn, forward = build_model(cfg, scaler_zeros=0.0)
    params = init_fn(jax.random.PRNGKey(0))
    optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr_init))
    opt_state = optimizer.init(params)
    loss_fn = build_loss(cfg.loss_func, 0.0, 1.0, cfg.mape_thresh, True)
    multi = jax.jit(make_scanned_train_step(
        make_loss_terms(forward, loss_fn, cfg), optimizer),
        donate_argnums=(0, 1))

    xs = jax.random.normal(
        jax.random.PRNGKey(1),
        (k, cfg.batch_size, cfg.lag, cfg.num_nodes, cfg.input_base_dim + 2))
    epoch = jnp.asarray(5, jnp.int32)
    sc = jnp.asarray(0, jnp.int32)
    rngs = jax.random.split(jax.random.PRNGKey(2), k)

    sum_fn = jax.jit(jnp.sum)
    for _ in range(3):  # warmup / compile
        params, opt_state, sc, totals, flows = multi(
            params, opt_state, xs, xs, rngs, epoch, sc)
    total0 = float(sum_fn(totals))
    assert total0 == total0, "train step produced NaN loss"

    # best-of-N windows: the benched chip is shared/tunneled and
    # window-to-window variance is large; best approximates the
    # uncontended rate. Three measures keep the axon tunnel honest:
    # k=32 scan-fused steps per dispatch amortize the ~1 ms dispatch
    # floor; the donated params/opt_state carry makes every dispatch's
    # arguments distinct (the backend serves repeated identical calls
    # from a result cache); and each window ends by FETCHING the last
    # step's loss — block_until_ready does not reliably wait on this
    # backend, but the fetched value depends on the entire window's
    # param chain. The anchor's own dispatch+fetch cost is subtracted.
    # Anchor cost = one sum dispatch + one d2h fetch, which is exactly
    # what ends each window. Measured on DISTINCT argument values
    # (totals + i): re-dispatching the identical sum_fn(totals) is
    # served by the backend's verbatim-repeat result cache and times
    # the cached RTT, not a real dispatch+fetch (ADVICE r3 #3). Median
    # of 5 tames the ms-scale d2h variance a single sample inherits.
    asum = jax.jit(lambda t, i: jnp.sum(t) + i)
    anchor_samples = []
    for i in range(5):
        off = jnp.asarray(float(i), jnp.float32)
        t0 = time.perf_counter()
        float(asum(totals, off))
        anchor_samples.append(time.perf_counter() - t0)
    anchor = sorted(anchor_samples)[len(anchor_samples) // 2]
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, sc, totals, flows = multi(
                params, opt_state, xs, xs, rngs, epoch, sc)
        float(sum_fn(totals))
        dt = max(time.perf_counter() - t0 - anchor, 1e-9)
        best = min(best, dt / (iters * k))
    return cfg.batch_size / best


def measure_sparse_model(n: int, batch: int = 8, iters: int = 8,
                         dtype: str = "float32",
                         model_name: str = "TGCN",
                         remat: str = "none") -> dict:
    """Full recurrent-model train step (fwd + MAE + grads + Adam) at
    large N through the hybrid sparse aggregation path on this backend
    (VERDICT r3 weak #2: every model-level number on record was N=170
    dense-path; this is the driver-captured sparse-path evidence).

    model_name: 'TGCN' (graph-GRU, sym (A+I) normalization) or 'MSDR'
    (multi-step dependency seq2seq, dual random-walk supports,
    `model/MSDR/gmsdr_cell.py:86-89`). Returns ms/step + samples/s +
    the harness validity info. The graph is the bench's banded road
    family (degree 16, band 48, 2% far links), bf16 block values.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gptst_tpu.ops.graph_conv import make_support_coo
    from scripts.spmm_bench import road_graph_edges, time_chained

    rows, cols = road_graph_edges(n, 16, 48)
    if model_name == "TGCN":
        from gptst_tpu.models.predictors.tgcn import TGCN, TGCNConfig

        r = np.concatenate([rows, np.arange(n)])
        c = np.concatenate([cols, np.arange(n)])
        deg = np.bincount(r, minlength=n).astype(np.float64)
        vals = (1.0 / np.sqrt(deg[r] * deg[c])).astype(np.float32)
        sup0 = make_support_coo(r, c, vals, n, reorder=False,
                                vals_dtype=jnp.bfloat16)
        sup = (sup0,)
        model = TGCN(cfg=TGCNConfig(num_nodes=n, rnn_units=64,
                                    remat=remat),
                     dim_in=1, dim_out=1, horizon=12)
    elif model_name == "MSDR":
        from gptst_tpu.models.predictors.msdr import MSDR, MSDRConfig

        r, c = rows, cols
        deg_out = np.maximum(np.bincount(r, minlength=n), 1)
        deg_in = np.maximum(np.bincount(c, minlength=n), 1)
        # [(D^-1 A)^T, (D^-1 A^T)^T] on edges (gmsdr_cell.py:86-89)
        su1 = make_support_coo(c, r, (1.0 / deg_out[r]).astype(np.float32),
                               n, reorder=False, vals_dtype=jnp.bfloat16)
        su2 = make_support_coo(r, c, (1.0 / deg_in[c]).astype(np.float32),
                               n, reorder=False, vals_dtype=jnp.bfloat16)
        from gptst_tpu.kernels.sddmm import SDDMMPattern
        from gptst_tpu.kernels.spmm import BlockCSR, coo_split_mask

        # the learned adaptive adjacency rides the sparse SDDMM path on
        # the static graph's block pattern (dense softmax is O(N^2));
        # built from the edge list — su1.bcsr is a placeholder when the
        # DIA band supersedes the block kernels
        mk = coo_split_mask(c, r, n)
        pat = SDDMMPattern.from_bcsr(BlockCSR.from_coo(
            c[mk], r[mk], (1.0 / deg_out[r]).astype(np.float32)[mk], n))
        sup0 = su1
        sup = ((su1, su2), pat)
        model = MSDR(cfg=MSDRConfig(num_nodes=n, rnn_units=64,
                                    num_rnn_layers=2, remat=remat),
                     dim_in=1, dim_out=1, horizon=12)
    else:
        raise ValueError(model_name)

    rng = jax.random.PRNGKey(0)
    xb = jax.random.normal(rng, (batch, 12, n, 1), jnp.float32)
    yb = jax.random.normal(jax.random.PRNGKey(1), (batch, 12, n, 1))
    params = model.init(jax.random.PRNGKey(2), xb, *sup)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    opt_state = tx.init(params)

    # dtype='bfloat16' applies the product mixed-precision recipe
    # (`train/step.py:make_loss_terms`): master params + Adam stay f32,
    # the forward runs on a bf16 cast of params + inputs. The step is
    # elementwise-GRU-bound, so halved activation traffic is the
    # relevant fast mode at scale.
    bf16 = dtype == "bfloat16"

    def _cast(t):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)

    def train_step(carry, x, y, s):
        p, o = carry

        def loss_fn(q):
            if bf16:
                q, x_, y_ = _cast(q), _cast(x), y
            else:
                x_, y_ = x, y
            pred = model.apply(q, x_, *s).astype(jnp.float32)
            return jnp.abs(pred - y_).mean()

        _, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, updates), o)

    per, info = time_chained(train_step, (params, opt_state),
                             iters=iters, operands=(xb, yb, sup),
                             donate=True)
    return {
        "n": n,
        "nnz": int(r.size),
        "coo_tail_edges": int(sup0.coo.nnz if sup0.coo is not None else 0),
        "ms_per_step": round(per * 1e3, 3),
        "samples_per_s": round(batch / per, 2),
        "edge_updates_per_s_G": round(r.size * batch / per / 1e9, 3),
        "valid": info["valid"],
    }


def measure_flagship_scale(n: int, batch: int = 8, iters: int = 6,
                           dtype: str = "float32",
                           remat: str = "none") -> dict:
    """GPT-ST pretrain FULL train step (forward + masked-MAE + KL +
    grads + Adam) at large N (VERDICT r4 weak #5: the flagship had no
    at-scale number — every large-N datum was TGCN/MSDR). The GPT-ST
    ops (cap routing, hyperTem, parameter pools,
    `model/Pretrain_model/GPTST.py:459-493`) are all linear in N, so
    synthetic data at N=16,384 exercises the real compute shape.
    Returns ms/step, samples/s and the step's flop context from XLA's
    cost model."""
    import jax
    import jax.numpy as jnp
    import optax

    from gptst_tpu.config import default_config
    from gptst_tpu.models.build import build_model
    from gptst_tpu.train.loss import build_loss
    from gptst_tpu.train.step import make_loss_terms, make_train_step
    from scripts.spmm_bench import time_chained

    cfg = default_config("PEMS08", mode="pretrain", model="STGCN")
    cfg = cfg.replace(num_nodes=n, batch_size=batch, change_epoch=1,
                      log_dir=None, compute_dtype=dtype,
                      pretrain_remat=remat)
    if dtype == "bfloat16":
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    else:
        jax.config.update("jax_default_matmul_precision", "default")

    init_fn, forward = build_model(cfg, scaler_zeros=0.0)
    params = init_fn(jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(cfg.lr_init))
    opt_state = tx.init(params)
    loss_fn = build_loss(cfg.loss_func, 0.0, 1.0, cfg.mape_thresh, True)
    step_fn = make_train_step(make_loss_terms(forward, loss_fn, cfg), tx)

    x = jax.random.normal(
        jax.random.PRNGKey(1),
        (batch, cfg.lag, n, cfg.input_base_dim + 2))
    rng = jax.random.PRNGKey(2)
    epoch = jnp.asarray(5, jnp.int32)
    sc = jnp.asarray(0, jnp.int32)

    def chained(carry, x, rng, epoch, sc):
        p, o = carry
        p, o, _, _ = step_fn(p, o, x, x, rng, epoch, sc)
        return (p, o)

    per, info = time_chained(chained, (params, opt_state), iters=iters,
                             operands=(x, rng, epoch, sc), donate=True)
    gflops = None
    try:
        ca = jax.jit(step_fn).lower(
            params, opt_state, x, x, rng, epoch, sc).compile(
        ).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        gflops = round(float(ca.get("flops", 0.0)) / 1e9, 2)
    except Exception:
        pass
    out = {
        "n": n, "batch": batch, "dtype": dtype, "remat": remat,
        "ms_per_step": round(per * 1e3, 3),
        "samples_per_s": round(batch / per, 2),
        "valid": info["valid"],
    }
    if gflops:
        out["step_gflops"] = gflops
        out["achieved_tflops"] = round(gflops / per / 1e3, 2)
    return out


def _subprocess_case(expr: str, timeout: int = 3000) -> dict:
    """Run one measurement in a FRESH process. The largest cases
    (MSDR 64k, GPT-ST pretrain at 16k) are individually within HBM but
    OOM when run after the 64k TGCN cases in the same process — the
    backend holds prior executables/buffers; a subprocess guarantees a
    clean 16 GB. `expr` must evaluate to a JSON-serializable dict using
    the `bench` module."""
    import os
    import subprocess

    code = ("import json, bench\n"
            f"r = {expr}\n"
            "print('RESULT::' + json.dumps(r))\n")
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, cwd=os.path.dirname(os.path.abspath(__file__)))
    for line in p.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    raise RuntimeError((p.stderr or p.stdout)[-300:])


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from gptst_tpu.config import default_config
    from gptst_tpu.models.build import build_model
    from gptst_tpu.train.loss import build_loss
    from gptst_tpu.train.step import make_loss_terms, make_train_step

    cfg = default_config("PEMS08", mode="pretrain", model="STGCN")
    cfg = cfg.replace(batch_size=64, change_epoch=1, log_dir=None)

    f32_sps = measure(cfg.replace(compute_dtype="float32"))
    bf16_sps = measure(cfg.replace(compute_dtype="bfloat16"))
    # headline = the faster measured mode. At reference scale (N=170)
    # the model is small enough that bf16's extra convert ops can cost
    # more than the halved MXU passes save; bf16 wins at larger N.
    samples_per_s = max(f32_sps, bf16_sps)
    fast_mode = "bfloat16" if bf16_sps >= f32_sps else "float32"
    steps_per_s = samples_per_s / cfg.batch_size

    # --- MFU context (VERDICT r1 weak item 3; ADVICE r2 high) ------------
    # Per-step flops come from lowering a SINGLE un-scanned train step:
    # XLA's cost model counts a lax.scan body once regardless of trip
    # count, so dividing the scanned executable's flops by k under-counts
    # ~k-fold. MFU is quoted against the bf16 MXU peak (TPU default
    # matmul precision runs f32 operands through bf16 MXU passes) and
    # omitted when the implied utilization exceeds 1.0 — on this
    # tunneled backend either the cost model or the timing would then be
    # unreliable, and a >1 "MFU" is worse than none.
    PEAKS = {  # device_kind -> bf16 TFLOP/s
        "TPU v5 lite": 197.0, "TPU v5e": 197.0,
        "TPU v4": 275.0, "TPU v6 lite": 918.0,
    }
    mfu = gflops_step = None
    try:
        bcfg = cfg.replace(compute_dtype="bfloat16")
        init_fn, forward = build_model(bcfg, scaler_zeros=0.0)
        params = init_fn(jax.random.PRNGKey(0))
        optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr_init))
        opt_state = optimizer.init(params)
        loss_fn = build_loss(cfg.loss_func, 0.0, 1.0, cfg.mape_thresh, True)
        single = jax.jit(make_train_step(
            make_loss_terms(forward, loss_fn, bcfg), optimizer))
        x1 = jnp.zeros((cfg.batch_size, cfg.lag, cfg.num_nodes,
                        cfg.input_base_dim + 2), jnp.float32)
        ca = single.lower(params, opt_state, x1, x1, jax.random.PRNGKey(2),
                          jnp.asarray(5, jnp.int32),
                          jnp.asarray(0, jnp.int32)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_step = float(ca.get("flops", 0.0))
        peak_tf = PEAKS.get(jax.devices()[0].device_kind)
        if peak_tf and flops_step > 0:
            implied_util = (flops_step * steps_per_s) / (peak_tf * 1e12)
            gflops_step = flops_step / 1e9
            if 0 < implied_util <= 1.0:
                mfu = implied_util
    except Exception:
        pass  # cost model unavailable on this backend; report throughput only

    baseline = None
    try:
        with open("BASELINE.json") as f:
            baseline = json.load(f).get("recorded", {}).get(
                "pretrain_samples_per_s")
    except Exception:
        pass
    vs = samples_per_s / baseline if baseline else 1.0

    out = {
        "metric": "gptst_pretrain_step_throughput_pems08_b64",
        "value": round(samples_per_s, 2),
        "unit": "samples/s",
        "vs_baseline": round(vs, 4),
        "fast_mode": fast_mode,
        "f32_samples_per_s": round(f32_sps, 2),
        "bf16_samples_per_s": round(bf16_sps, 2),
    }
    # the recorded baseline figure is the round-3 bf16 rate; when the
    # headline mode is float32 the ratio crosses precision modes —
    # carry both dtypes so downstream readers can't misread it
    # (ADVICE r4 #4)
    if baseline:
        out["baseline_dtype"] = "bfloat16"
        out["headline_dtype"] = fast_mode
    if gflops_step is not None:
        out["step_gflops"] = round(gflops_step, 2)
    if mfu is not None:
        out["mfu_bf16_peak"] = round(mfu, 4)

    # model-level sparse-path evidence (TGCN through the hybrid
    # block+COO aggregation at 16k/64k nodes) — nested so the output
    # stays ONE JSON line
    sparse = {}
    # the tunneled compile service rejects the largest modules (batch 8
    # at 64k nodes -> tpu_compile_helper crash); per-size batch ladders
    # fall back rather than losing the measurement. TGCN runs the
    # product "auto" remat policy: the node-major cell stores residuals
    # up to 128k nodes (64k/batch-8 fits and beats the recompute —
    # `TGCN_NM_r05.json`); MSDR keeps its measured per-size modes.
    cases = [("16384", 16384, (8, 4, 2), "float32", "TGCN", "auto"),
             ("16384_bf16", 16384, (8, 4, 2), "bfloat16", "TGCN", "auto"),
             ("65536", 65536, (8, 4, 2), "float32", "TGCN", "auto"),
             ("65536_bf16", 65536, (8, 4, 2), "bfloat16", "TGCN", "auto"),
             ("msdr_16384", 16384, (8, 4, 2), "float32", "MSDR", "none"),
             ("msdr_65536", 65536, (4, 2, 1), "float32", "MSDR", "full")]
    for key, nn_, ladder, dt, mdl, rm in cases:
        last_err = None
        # all 64k rows isolate in a fresh subprocess: earlier cases'
        # executables pin parent HBM, and the stored-residual TGCN
        # rows (auto policy) need the full clean 16 GB at batch 8
        iso = nn_ >= 65536                      # see _subprocess_case
        if iso:   # clean parent HBM before spawning (see below)
            import gc

            gc.collect()
            jax.clear_caches()
        for b in ladder:
            try:
                if iso:
                    r = _subprocess_case(
                        f"bench.measure_sparse_model({nn_}, batch={b}, "
                        f"dtype={dt!r}, model_name={mdl!r}, "
                        f"remat={rm!r})")
                else:
                    r = measure_sparse_model(nn_, batch=b, dtype=dt,
                                             model_name=mdl, remat=rm)
                sparse[key] = dict(r, batch=b, dtype=dt, model=mdl,
                                   remat=rm)
                break
            except Exception as e:
                last_err = f"{type(e).__name__}: {e}"[:200]
        else:
            sparse[key] = {"error": last_err}
    out["sparse_tgcn_train_step"] = sparse

    # free parent-held device state (compiled executables pin constant
    # buffers) so the isolated subprocesses see a clean HBM
    import gc

    gc.collect()
    jax.clear_caches()

    # flagship at scale: GPT-ST pretrain step at N=16,384, f32 + bf16
    # (fresh subprocess per case — individually fine, OOMs after the
    # 64k TGCN cases in-process)
    flagship = {}
    # (batch, remat) ladders. Trunk remat (pretrain_remat) is
    # equivalence-tested and available, but the TUNNELED compile
    # helper rejects the 16k flagship above batch 2 f32 with or
    # without it (consistent HTTP 500 at batch 4/8 in clean
    # subprocesses) — the binding constraint here is the compile
    # service, not HBM, so the ladders stay at the proven configs.
    for key, dt, ladder in (
            ("16384", "float32", ((2, "none"),)),
            ("16384_bf16", "bfloat16", ((4, "none"), (2, "none")))):
        last_err = None
        for b, rm in ladder:
            try:
                flagship[key] = _subprocess_case(
                    f"bench.measure_flagship_scale(16384, batch={b}, "
                    f"dtype={dt!r}, remat={rm!r})")
                break
            except Exception as e:
                last_err = f"{type(e).__name__}: {e}"[:200]
        else:
            flagship[key] = {"error": last_err}
    out["gptst_pretrain_at_scale"] = flagship
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
