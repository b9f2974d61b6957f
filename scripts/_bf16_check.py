import time, jax, jax.numpy as jnp, optax
from gptst_tpu.config import default_config
from gptst_tpu.models.build import build_model
from gptst_tpu.train.loss import build_loss
from gptst_tpu.train.step import make_loss_terms, make_scanned_train_step

def run(dtype):
    cfg = default_config("PEMS08", mode="pretrain", model="STGCN")
    cfg = cfg.replace(batch_size=64, change_epoch=1, log_dir=None,
                      compute_dtype=dtype)
    init_fn, forward = build_model(cfg, scaler_zeros=0.0)
    params = init_fn(jax.random.PRNGKey(0))
    optimizer = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                            optax.adam(cfg.lr_init))
    opt_state = optimizer.init(params)
    loss_fn = build_loss(cfg.loss_func, 0.0, 1.0, cfg.mape_thresh, True)
    k = 8
    multi = jax.jit(make_scanned_train_step(
        make_loss_terms(forward, loss_fn, cfg), optimizer),
        donate_argnums=(0, 1))
    xs = jax.random.normal(jax.random.PRNGKey(1),
        (k, cfg.batch_size, cfg.lag, cfg.num_nodes, cfg.input_base_dim + 2))
    epoch = jnp.asarray(5, jnp.int32); sc = jnp.asarray(0, jnp.int32)
    rngs = jax.random.split(jax.random.PRNGKey(2), k)
    for _ in range(3):
        params, opt_state, sc, totals, flows = multi(params, opt_state, xs, xs, rngs, epoch, sc)
    jax.block_until_ready(params)
    iters = 30; best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, sc, totals, flows = multi(params, opt_state, xs, xs, rngs, epoch, sc)
        jax.block_until_ready(params)
        best = min(best, (time.perf_counter()-t0)/(iters*k))
    print(dtype, "samples/s=", round(cfg.batch_size/best), "loss=", float(totals[-1]))

run("float32")
run("bfloat16")
