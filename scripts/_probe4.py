import time, jax, jax.numpy as jnp, optax
from gptst_tpu.config import default_config
from gptst_tpu.models.build import build_model
from gptst_tpu.models.gptst import GPTSTConfig, generate_mask
from gptst_tpu.train.loss import build_loss
from gptst_tpu.train.step import make_loss_terms, make_scanned_train_step

cfg = default_config("PEMS08", mode="pretrain", model="STGCN")
cfg = cfg.replace(batch_size=64, change_epoch=1, log_dir=None)
gc = GPTSTConfig.from_framework(cfg, 0.0)
guide = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (64,12,170,10)))
ep = jnp.asarray(5, jnp.int32)
mg = jax.jit(lambda r, g, e: generate_mask(gc, r, g, e, (64,12,170,1)))
r = jax.random.PRNGKey(1)
m = mg(r, guide, ep); jax.block_until_ready(m)
t0=time.perf_counter()
for _ in range(100): m = mg(r, guide, ep)
jax.block_until_ready(m)
print("generate_mask ms:", (time.perf_counter()-t0)/100*1e3)

# scan k sweep
init_fn, forward = build_model(cfg, scaler_zeros=0.0)
loss_fn = build_loss(cfg.loss_func, 0.0, 1.0, cfg.mape_thresh, True)
optimizer = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr_init))
for k in (16, 32):
    params = init_fn(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    multi = jax.jit(make_scanned_train_step(make_loss_terms(forward, loss_fn, cfg), optimizer), donate_argnums=(0,1))
    xs = jax.random.normal(jax.random.PRNGKey(1), (k, 64, 12, 170, 3))
    rngs = jax.random.split(jax.random.PRNGKey(2), k)
    sc = jnp.asarray(0, jnp.int32)
    for _ in range(3):
        params, opt_state, sc, t_, f_ = multi(params, opt_state, xs, xs, rngs, ep, sc)
    jax.block_until_ready(params)
    t0 = time.perf_counter(); iters = 15
    for _ in range(iters):
        params, opt_state, sc, t_, f_ = multi(params, opt_state, xs, xs, rngs, ep, sc)
    jax.block_until_ready(params)
    print("k=", k, "per-step ms:", (time.perf_counter()-t0)/iters/k*1e3)
