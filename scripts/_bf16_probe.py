import time, jax, jax.numpy as jnp
from gptst_tpu.config import default_config
from gptst_tpu.models.build import build_model

def bench_fn(f, *args, iters=20):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/iters*1e3  # ms

cfg = default_config("PEMS08", mode="pretrain", model="STGCN")
cfg = cfg.replace(batch_size=64, change_epoch=1, log_dir=None)
init_fn, forward = build_model(cfg, scaler_zeros=0.0)
params = init_fn(jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (64, 12, 170, 3))
rng = jax.random.PRNGKey(2); epoch = jnp.asarray(5, jnp.int32)

fwd = jax.jit(lambda p, x: forward(p, x, None, rng, epoch).pred.sum())
print("fwd f32 ms:", bench_fn(fwd, params, x))

cast = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
pb, xb = cast(params), cast(x)
fwd16 = jax.jit(lambda p, x: forward(p, x, None, rng, epoch).pred.astype(jnp.float32).sum())
print("fwd bf16 ms:", bench_fn(fwd16, pb, xb))

# grads
g32 = jax.jit(jax.grad(lambda p, x: forward(p, x, None, rng, epoch).pred.astype(jnp.float32).sum()))
print("grad f32 ms:", bench_fn(g32, params, x))
g16 = jax.jit(jax.grad(lambda p, x: forward(cast(p), cast(x), None, rng, epoch).pred.astype(jnp.float32).sum()))
print("grad bf16 ms:", bench_fn(g16, params, x))
