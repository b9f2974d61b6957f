import time, jax, jax.numpy as jnp, optax
jax.config.update("jax_log_compiles", True)
from gptst_tpu.config import default_config
from gptst_tpu.models.build import build_model
from gptst_tpu.train.loss import build_loss
from gptst_tpu.train.step import make_loss_terms, make_train_step

for dtype in ("float32", "bfloat16"):
    cfg = default_config("PEMS08", mode="pretrain", model="STGCN")
    cfg = cfg.replace(batch_size=64, change_epoch=1, log_dir=None, compute_dtype=dtype)
    init_fn, forward = build_model(cfg, scaler_zeros=0.0)
    params = init_fn(jax.random.PRNGKey(0))
    optimizer = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr_init))
    opt_state = optimizer.init(params)
    loss_fn = build_loss(cfg.loss_func, 0.0, 1.0, cfg.mape_thresh, True)
    step = jax.jit(make_train_step(make_loss_terms(forward, loss_fn, cfg), optimizer), donate_argnums=(0,1))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 12, 170, 3))
    rng = jax.random.PRNGKey(2); ep = jnp.asarray(5, jnp.int32); sc = jnp.asarray(0, jnp.int32)
    for _ in range(3):
        params, opt_state, total, flow = step(params, opt_state, x, x, rng, ep, sc)
    jax.block_until_ready(params)
    t0 = time.perf_counter(); iters = 50
    for _ in range(iters):
        params, opt_state, total, flow = step(params, opt_state, x, x, rng, ep, sc)
    jax.block_until_ready(params)
    print(dtype, "single-step ms:", (time.perf_counter()-t0)/iters*1e3)
