"""ST-WA — spatio-temporal aware window attention.

TPU-native counterpart of `model/ST_WA/ST_WA.py` + `attention.py`
(309 LoC): three layers of windowed attention over temporal cuts
(12 -> 3 -> 1) with learnable proxy queries carried across cuts, 8-head
temporal/spatial attention whose key/value projections are *generated*
per (batch, node) from stochastic latents (reparameterized
mu/logvar from both the input series and per-layer memories,
`ST_WA.py:51-75, 117-120`), a sigmoid aggregator pooling the proxies,
per-layer skip projections into a 256-wide stream, and an MLP head
emitting all horizons (`:44-47`). Defaults follow `conf/ST-WA/*.conf`
(channels=16, dynamic=True, memory_size=16).

Quirk preserved: layer 1 is built with cuts=12 x cut_size=6 over T=12
(`ST_WA.py:31-33`), so cuts >= 2 slice an empty window and attend over
the proxies (+ carried state) alone — exactly the reference behavior.
Sampling uses an explicit PRNG key (the reference samples in eval too;
we default to a fixed key when none is given).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

torch_linear = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


@dataclasses.dataclass(frozen=True)
class STWAConfig:
    num_nodes: int
    channels: int = 16
    dynamic: bool = True
    memory_size: int = 16
    heads: int = 8
    layer_cuts: tuple = ((12, 6), (3, 4), (1, 3))
    no_proxies: int = 2


def _mlp(sizes, name, act=jnp.tanh):
    layers = []
    for i, s in enumerate(sizes):
        layers.append(nn.Dense(s, name=f"{name}_{i}",
                                kernel_init=torch_linear))
    def apply(x):
        for i, lin in enumerate(layers):
            x = lin(x)
            if i < len(layers) - 1:
                x = act(x)
        return x
    return apply


class ParameterGenerator(nn.Module):
    """Latent -> per-(b, n) projection weights (`ST_WA.py:166-202`)."""

    cfg: STWAConfig

    @nn.compact
    def __call__(self, z):  # z: (B, N, M)
        c = self.cfg
        d = c.channels
        if c.dynamic:
            w = _mlp([32, 5, d * d], "wgen", act=jax.nn.relu)(z)
            b = _mlp([32, 5, d], "bgen", act=jax.nn.relu)(z)
            return w.reshape(z.shape[0], c.num_nodes, d, d), b
        w = self.param("weights", nn.initializers.uniform(1.0), (d, d))
        b = self.param("biases", nn.initializers.uniform(1.0), (d,))
        return w, b


def custom_linear(x, wb):
    """x: (B, T, N, C); weights (B,N,C,C) + bias (B,N,C), or static
    (C,C)/(C,) (`attention.py:99-107`)."""
    w, b = wb
    if w.ndim > 2:
        return jnp.einsum("btni,bnio->btno", x, w) + b[:, None]
    return x @ w + b


def _split_heads(x, k):
    # (B, T, N, C) -> (B, K, T, N, hs) via concat-along-batch semantics
    b, t, n, c = x.shape
    return jnp.moveaxis(x.reshape(b, t, n, k, c // k), 3, 1)


def _merge_heads(x):
    b, k, t, n, hs = x.shape
    return jnp.moveaxis(x, 1, 3).reshape(b, t, n, k * hs)


class TemporalAttention(nn.Module):
    """Proxy-query attention over a cut (`attention.py:5-55`)."""

    cfg: STWAConfig

    @nn.compact
    def __call__(self, query, key, value, params):
        k_heads = self.cfg.heads
        key = custom_linear(key, params[0])
        value = custom_linear(value, params[1])
        q = _split_heads(query, k_heads)           # (B,K,Tq,N,hs)
        kk = _split_heads(key, k_heads)
        vv = _split_heads(value, k_heads)
        hs = q.shape[-1]
        att = jnp.einsum("bkqnh,bksnh->bknqs", q, kk) / (hs ** 0.5)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bknqs,bksnh->bkqnh", att, vv)
        out = _merge_heads(out)
        out = nn.Dense(self.cfg.channels, name="projection1", kernel_init=torch_linear)(out)
        out = jnp.tanh(out)
        return nn.Dense(self.cfg.channels, name="projection2", kernel_init=torch_linear)(out)


class SpatialAttention(nn.Module):
    """Node-axis attention over the proxies (`attention.py:58-96`)."""

    cfg: STWAConfig

    @nn.compact
    def __call__(self, x, params):
        k_heads = self.cfg.heads
        key = custom_linear(x, params[0])
        value = custom_linear(x, params[1])
        q = _split_heads(x, k_heads)               # (B,K,P,N,hs)
        kk = _split_heads(key, k_heads)
        vv = _split_heads(value, k_heads)
        hs = q.shape[-1]
        att = jnp.einsum("bkpnh,bkpmh->bkpnm", q, kk) / (hs ** 0.5)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bkpnm,bkpmh->bkpnh", att, vv)
        out = _merge_heads(out)
        out = nn.Dense(self.cfg.channels, name="projection1", kernel_init=torch_linear)(out)
        out = jax.nn.relu(out)
        return nn.Dense(self.cfg.channels, name="projection2", kernel_init=torch_linear)(out)


class WindowLayer(nn.Module):
    """One cuts x cut_size window-attention layer (`ST_WA.py:101-164`)."""

    cfg: STWAConfig
    cuts: int
    cut_size: int

    @nn.compact
    def __call__(self, x, z_data, rng):
        c = self.cfg
        B = x.shape[0]
        proxies = self.param(
            "proxies", nn.initializers.normal(1.0),
            (1, self.cuts * c.no_proxies, c.num_nodes, c.channels))

        if c.dynamic:
            mu = self.param("mu", nn.initializers.normal(1.0),
                            (c.num_nodes, c.memory_size))
            logvar = self.param("logvar", nn.initializers.normal(1.0),
                                (c.num_nodes, c.memory_size))
            eps = jax.random.normal(rng, logvar.shape)
            z_data = z_data + (mu + eps * jnp.exp(0.5 * logvar))

        t_params = [ParameterGenerator(c, name=f"tpg{i}")(z_data)
                    for i in range(2)]
        s_params = [ParameterGenerator(c, name=f"spg{i}")(z_data)
                    for i in range(2)]
        t_att = TemporalAttention(c, name="temporal_att")
        s_att = SpatialAttention(c, name="spatial_att")
        agg = _mlp([c.channels, c.channels], "aggregator", act=jax.nn.relu)

        out = jnp.zeros((B, c.no_proxies, c.num_nodes, c.channels), x.dtype)
        pieces = []
        for i in range(self.cuts):
            t = x[:, i * self.cut_size:(i + 1) * self.cut_size]
            prox = jnp.broadcast_to(
                proxies[:, i * c.no_proxies:(i + 1) * c.no_proxies],
                out.shape) + out
            t = jnp.concatenate([prox, t], axis=1)
            out = t_att(t[:, : c.no_proxies], t, t, t_params)
            out = s_att(out, s_params)
            gate = jax.nn.sigmoid(agg(out))
            pooled = (gate * out).sum(axis=1, keepdims=True)
            pieces.append(pooled)
            out = jnp.broadcast_to(pooled, out.shape)
        return jnp.concatenate(pieces, axis=1)      # (B, cuts, N, C)


class STWA(nn.Module):
    """x: (B, T, N, dim_in) -> (B, horizon, N, dim_out)."""

    cfg: STWAConfig
    dim_in: int
    dim_out: int
    horizon: int
    lag: int

    @nn.compact
    def __call__(self, x, rng=None):
        c = self.cfg
        B = x.shape[0]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if c.dynamic:
            x_dm = nn.Dense(1, name="eval_dimin", kernel_init=torch_linear)(x) if self.dim_in != 1 else x
            series = jnp.swapaxes(x_dm[..., 0], 1, 2)       # (B, N, T)
            mu = _mlp([32, 32, c.memory_size], "mu_est")(series)
            logvar = _mlp([32, 32, c.memory_size], "logvar_est")(series)
            rng, r = jax.random.split(rng)
            eps = jax.random.normal(r, mu.shape)
            z_data = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z_data = 0.0

        h = nn.Dense(c.channels, name="start_fc", kernel_init=torch_linear)(x)
        skip = 0.0
        for li, (cuts, cut_size) in enumerate(c.layer_cuts):
            rng, r = jax.random.split(rng)
            h = WindowLayer(c, cuts, cut_size, name=f"layer{li}")(
                h, z_data, r)
            flat = jnp.swapaxes(h, 1, 2).reshape(B, c.num_nodes, -1)
            skip = skip + nn.Dense(256, name=f"skip{li}", kernel_init=torch_linear)(flat)
        h = jax.nn.relu(skip)
        h = jax.nn.relu(nn.Dense(512, name="proj1", kernel_init=torch_linear)(h))
        out = nn.Dense(self.horizon * self.dim_out, name="proj2",
                       kernel_init=torch_linear)(h)
        out = out.reshape(B, c.num_nodes, self.horizon, self.dim_out)
        return jnp.swapaxes(out, 1, 2)
