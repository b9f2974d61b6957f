"""GPT-ST: generative pretraining network for spatio-temporal graphs.

TPU-native re-design of `model/Pretrain_model/GPTST.py` (492 LoC torch).
Architecture: masked autoencoder with symmetric STHCN encoder/decoder
trunks — temporal hypergraph convolutions interleaved with hierarchical
capsule cluster encoders — plus an adaptive-mask curriculum driven by a
mask-policy network (`MLP_RL`).

Key re-designs for XLA:
  * the mask curriculum's data-dependent while-loops over cluster lists
    (`GPTST.py:357-413`) become fixed-shape rank/permutation arithmetic
    (same distribution, one compiled program — see `generate_mask`);
  * dynamic routing runs as a `fori_loop` with `stop_gradient` exactly
    where the reference `.detach()`es (`gptst_tpu/ops/capsule.py`);
  * the (B,T,H,N,D) routing outer-product intermediate is factored out
    analytically (HBM saving);
  * everything is (B, T, N, D) channels-last and the epoch index is a
    traced scalar, so the random->adaptive switch (`lax.cond`) and the
    curriculum ramp compile once.

Initialization mirrors the reference's effective init: pretrain configs
set `xavier=True`, so `Run.py:79-85` overwrites every >1-D parameter
with xavier-uniform and every 1-D parameter with uniform[0,1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gptst_tpu.config.config import FrameworkConfig
from gptst_tpu.ops.capsule import dynamic_routing, squash
from gptst_tpu.ops.param_pool import node_param_linear, time_param_linear

# Effective reference init after the xavier sweep (`model/Run.py:79-85`).
xavier = nn.initializers.xavier_uniform()
vec_uniform = nn.initializers.uniform(scale=1.0)


def _dense(feat: int, name: str | None = None) -> nn.Dense:
    return nn.Dense(feat, kernel_init=xavier, bias_init=vec_uniform, name=name)


@dataclasses.dataclass(frozen=True)
class GPTSTConfig:
    num_nodes: int
    input_base_dim: int = 1
    hidden_dim: int = 64
    horizon: int = 12           # == lag; both are 12 in every config
    embed_dim: int = 16
    embed_dim_spa: int = 4
    HS: int = 10
    HT: int = 16
    HT_Tem: int = 8
    num_route: int = 2
    mask_ratio: float = 0.25
    ada_mask_ratio: float = 0.5
    ada_type: str = "all"
    change_epoch: int = 10
    epochs: int = 300
    scaler_zeros: float = 0.0
    # activation remat for the STHCN trunk sub-layers (none|full|dots,
    # `ops/recurrent.remat_cell`): the feedforward trunks store every
    # HyperTem/Cap intermediate for backward — at N=16,384 that is what
    # caps the f32 train-step batch at 2; remat trades ~1 recomputed
    # trunk forward for those residuals. Off by default (reference
    # parity surfaces never need it).
    remat: str = "none"

    @staticmethod
    def from_framework(cfg: FrameworkConfig, scaler_zeros: float) -> "GPTSTConfig":
        return GPTSTConfig(
            num_nodes=cfg.num_nodes, input_base_dim=cfg.input_base_dim,
            hidden_dim=cfg.hidden_dim, horizon=cfg.horizon,
            embed_dim=cfg.embed_dim, embed_dim_spa=cfg.embed_dim_spa,
            HS=cfg.HS, HT=cfg.HT, HT_Tem=cfg.HT_Tem,
            num_route=cfg.num_route, mask_ratio=cfg.mask_ratio,
            ada_mask_ratio=cfg.ada_mask_ratio, ada_type=cfg.ada_type,
            change_epoch=cfg.change_epoch, epochs=cfg.epochs,
            scaler_zeros=scaler_zeros, remat=cfg.pretrain_remat)


class TimeFeature(nn.Module):
    """Per-(b,t) embedding of (day-slot, weekday) scalars
    (`GPTST.py:187-202`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, eb: jnp.ndarray) -> jnp.ndarray:  # (B, T, 2)
        day = _dense(self.embed_dim)(eb[:, :, 0:1])
        week = _dense(self.embed_dim)(eb[:, :, 1:2])
        h = nn.relu(_dense(self.embed_dim)(day + week))
        h = nn.relu(_dense(self.embed_dim)(h))
        return _dense(self.embed_dim)(h)  # (B, T, E)


class TimeFeatureSPG(nn.Module):
    """Whole-window time embedding: Linear over the 12 steps
    (`GPTST.py:204-219`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, eb: jnp.ndarray) -> jnp.ndarray:  # (B, T, 2)
        day = _dense(self.embed_dim)(eb[:, :, 0])
        week = _dense(self.embed_dim)(eb[:, :, 1])
        h = nn.relu(_dense(self.embed_dim)(day + week))
        h = nn.relu(_dense(self.embed_dim)(h))
        return _dense(self.embed_dim)(h)  # (B, E)


class HyperTem(nn.Module):
    """Temporal hypergraph conv (`GPTST.py:144-163`).

    Node-conditioned incidence over time (HT_Tem hyperedges x T steps):
    aggregate along time, broadcast back, then a time-conditioned
    parameter-pool linear, residual + LeakyReLU.
    """

    timesteps: int
    dim_in: int
    dim_out: int
    embed_dim: int
    ht_tem: int

    @nn.compact
    def __call__(self, eb, node_emb, time_eb):
        adj = self.param("adj", xavier,
                         (self.embed_dim, self.ht_tem, self.timesteps))
        w_pool = self.param("weights_pool", xavier,
                            (self.embed_dim, self.dim_in, self.dim_out))
        b_pool = self.param("bias_pool", xavier,
                            (self.embed_dim, self.dim_out))
        # (N, E) x (E, H, T) -> (N, H, T) -> (H, T, N)
        adj_dyn = jnp.transpose(
            jnp.einsum("nk,kht->nht", node_emb, adj), (1, 2, 0))
        hyper = jnp.einsum("htn,btnd->bhnd", adj_dyn, eb)
        ret = jnp.einsum("thn,bhnd->btnd",
                         jnp.transpose(adj_dyn, (1, 0, 2)), hyper)
        out = time_param_linear(ret, time_eb, w_pool, b_pool)
        return nn.leaky_relu(out + eb)


class Cap(nn.Module):
    """Hierarchical spatial pattern encoder (`GPTST.py:79-141`).

    Primary capsules -> time-conditioned cluster routing (intra-cluster)
    -> per-timestep positional offset -> inter-cluster hypergraph
    message passing over HT hyperedges -> reconstruction to nodes ->
    per-node parameter-pool output, residual + LeakyReLU.

    Returns (out, routing c, dynamic inter-cluster incidence), the
    latter two gradient-stopped as in the reference (`GPTST.py:141`).
    """

    dim: int
    num_nodes: int
    timesteps: int
    embed_dim: int
    embed_dim_spa: int
    hs: int
    ht: int
    num_route: int

    @nn.compact
    def __call__(self, x, node_emb, time_eb_spg, teb):
        B = x.shape[0]
        tt = self.hs * self.timesteps
        t_adj = self.param("t_adj", xavier,
                           (self.embed_dim_spa, self.ht, tt))
        adj = self.param("adj", xavier,
                         (self.embed_dim_spa, self.hs, self.num_nodes))
        w_spa = self.param("weights_spa", xavier,
                           (self.embed_dim, self.dim, self.dim))
        b_spa = self.param("bias_spa", xavier, (self.embed_dim, self.dim))

        pcaps = squash(_dense(self.dim)(x))                 # (B,T,N,D)
        dadj = jnp.einsum("btd,dhn->bthn", teb, adj)        # (B,T,HS,N)
        c = dynamic_routing(pcaps, dadj, self.num_route)    # (B,T,HS,N)

        s = jnp.einsum("bthn,btnd->bthd", c, pcaps)         # (B,T,HS,D)
        # per-timestep positional offset (`GPTST.py:97-98,125-127`)
        time_index = (jnp.arange(1, self.timesteps + 1, dtype=x.dtype)
                      / 12.0)[None, :, None, None]
        hyper_spa = (s + time_index).reshape(B, tt, self.dim)

        dyn = jnp.einsum("bd,dhk->bhk", time_eb_spg, t_adj)  # (B,HT,TT)
        hyper_tem = nn.leaky_relu(jnp.einsum("bhk,bkd->bhd", dyn, hyper_spa))
        ret_tem = nn.leaky_relu(
            jnp.einsum("bkh,bhd->bkd", jnp.transpose(dyn, (0, 2, 1)),
                       hyper_tem))
        ret = ret_tem.reshape(B, self.timesteps, self.hs, self.dim) + s

        v = squash(ret)
        recon = jnp.einsum("bthn,bthd->btnd", c, v)
        out = node_param_linear(recon, node_emb, w_spa, b_spa)
        return (nn.leaky_relu(out + x),
                jax.lax.stop_gradient(c),
                jax.lax.stop_gradient(dyn))


class MLPRL(nn.Module):
    """Mask-policy network (`GPTST.py:6-34`): per-node then per-(b,t)
    parameter-pool MLPs producing HS-way cluster logits per (b,t,n)."""

    dim_in: int
    dim_out: int
    hidden_dim: int
    embed_dim: int

    @nn.compact
    def __call__(self, eb, time_eb, node_eb):
        wp_spa = self.param("weights_pool_spa", xavier,
                            (self.embed_dim, self.hidden_dim, self.hidden_dim))
        bp_spa = self.param("bias_pool_spa", xavier,
                            (self.embed_dim, self.hidden_dim))
        wp_tem = self.param("weights_pool_tem", xavier,
                            (self.embed_dim, self.hidden_dim, self.hidden_dim))
        bp_tem = self.param("bias_pool_tem", xavier,
                            (self.embed_dim, self.hidden_dim))
        h = _dense(self.hidden_dim)(eb)
        h = nn.leaky_relu(node_param_linear(h, node_eb, wp_spa, bp_spa))
        h = nn.leaky_relu(time_param_linear(h, time_eb, wp_tem, bp_tem))
        return _dense(self.dim_out)(h)


class STHCN(nn.Module):
    """Encoder/decoder trunk (`GPTST.py:221-273`):
    hyperTem1 -> cap1 -> hyperTem2 -> hyperTem3 -> cap2 -> hyperTem4,
    with time embeddings computed once from node 0's calendar channels.
    """

    cfg: GPTSTConfig

    @nn.compact
    def __call__(self, source, x_in):
        c = self.cfg
        node_emb = self.param("node_embeddings", xavier,
                              (c.num_nodes, c.embed_dim))
        node_emb_spg = self.param("node_embeddings_spg", xavier,
                                  (c.num_nodes, c.embed_dim))
        b = c.input_base_dim
        day = source[:, :, 0, b:b + 1]
        week = source[:, :, 0, b + 1:b + 2]
        tcat = jnp.concatenate([day, week], axis=-1)
        time_eb = TimeFeature(c.embed_dim)(tcat)
        teb = TimeFeature(c.embed_dim_spa)(tcat)
        time_eb_spg = TimeFeatureSPG(c.embed_dim_spa)(tcat)

        ht = dict(timesteps=c.horizon, dim_in=c.hidden_dim,
                  dim_out=c.hidden_dim, embed_dim=c.embed_dim,
                  ht_tem=c.HT_Tem)
        cap = dict(dim=c.hidden_dim, num_nodes=c.num_nodes,
                   timesteps=c.horizon, embed_dim=c.embed_dim,
                   embed_dim_spa=c.embed_dim_spa, hs=c.HS, ht=c.HT,
                   num_route=c.num_route)

        from gptst_tpu.ops.recurrent import remat_cell

        HT = remat_cell(HyperTem, c.remat)
        CP = remat_cell(Cap, c.remat)
        xt1 = HT(**ht)(x_in, node_emb, time_eb)
        xg1, hs1, _ = CP(**cap)(xt1, node_emb_spg, time_eb_spg, teb)
        xt2 = HT(**ht)(xg1, node_emb, time_eb)
        xt3 = HT(**ht)(xt2, node_emb, time_eb)
        xg3, hs3, _ = CP(**cap)(xt3, node_emb_spg, time_eb_spg, teb)
        xt4 = HT(**ht)(xg3, node_emb, time_eb)
        return xt4, hs1, hs3


def _rank_desc(score: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = position of element i in descending sort of `score`."""
    order = jnp.argsort(-score)
    return jnp.argsort(order)


def generate_mask(cfg: GPTSTConfig, rng: jax.Array, guide: jnp.ndarray,
                  epoch: jnp.ndarray, shape: tuple[int, ...]) -> jnp.ndarray:
    """Mask curriculum (`GPTST.py:314-417`), fixed-shape reformulation.

    guide: (B, T, N, HS) mask-policy softmax; epoch: traced int scalar;
    shape: (B, T, N, base). Returns final_mask in {0., 1.}, 0 = masked.

    epoch <= change_epoch: uniform-random mask of exactly
    `mask_ratio * numel` entries over all (b,t,n,channel) positions.

    epoch > change_epoch: clusters (argmax of guide) are shuffled; whole
    clusters are masked until the adaptive budget is crossed; the
    boundary cluster is sampled to exactly fill the budget
    (ada_type='all'; 'half' samples the budget from the union instead);
    the remaining budget is filled by uniform-random masking of
    still-unmasked positions; the (B,T,N) mask repeats across channels.
    """
    B, T, N, base = shape
    r_perm, r_ada, r_rand, r_rand0 = jax.random.split(rng, 4)

    def random_branch(_):
        numel = B * T * N * base
        k = int(numel * cfg.mask_ratio)
        u = jax.random.uniform(r_rand0, (numel,))
        mask = (_rank_desc(u) >= k).astype(jnp.float32)
        return mask.reshape(B, T, N, base)

    def adaptive_branch(_):
        label_c = jnp.argmax(guide, axis=-1).reshape(-1)  # (B*T*N,)
        m = B * T * N
        mask_num_sum = int(m * cfg.mask_ratio)
        ramp = ((epoch - cfg.change_epoch).astype(jnp.float32)
                / float(cfg.epochs - cfg.change_epoch)) * cfg.ada_mask_ratio
        ramp = jnp.minimum(ramp, 1.0)
        a_num = jnp.floor(mask_num_sum * ramp).astype(jnp.int32)
        rand_num = mask_num_sum - a_num

        perm = jax.random.permutation(r_perm, cfg.HS)
        inv_perm = jnp.argsort(perm)           # cluster id -> visit rank
        elem_rank = inv_perm[label_c]          # (m,)
        counts = jnp.sum(
            elem_rank[:, None] == jnp.arange(cfg.HS)[None, :], axis=0)
        cum = jnp.cumsum(counts)
        # i = number of clusters visited until budget crossed
        idx = jnp.searchsorted(cum, a_num, side="left")
        i = jnp.where(a_num > 0, idx + 1, 0)

        if cfg.ada_type == "all":
            select_d = (elem_rank <= i - 2).astype(jnp.float32)
            select_f = (elem_rank == i - 1).astype(jnp.float32)
        else:  # 'half'
            select_d = jnp.zeros((m,), jnp.float32)
            select_f = (elem_rank <= i - 1).astype(jnp.float32)
        dnum = jnp.sum(select_d).astype(jnp.int32)

        # sample exactly (a_num - dnum) positions inside the boundary set
        u1 = jax.random.uniform(r_ada, (m,))
        score1 = select_f * u1
        masked1 = (_rank_desc(score1) < (a_num - dnum)).astype(jnp.float32)
        mask_adaptive = (1.0 - masked1) * (1.0 - select_d)

        # random completion over still-unmasked positions
        u2 = jax.random.uniform(r_rand, (m,))
        score2 = mask_adaptive * u2
        masked2 = (_rank_desc(score2) < rand_num).astype(jnp.float32)
        mask_random = 1.0 - masked2

        final = (mask_adaptive * mask_random).reshape(B, T, N, 1)
        return jnp.broadcast_to(final, (B, T, N, base))

    return jax.lax.cond(
        epoch <= cfg.change_epoch, random_branch, adaptive_branch, None)


class GPTST(nn.Module):
    """Full pretrain network (`GPTST.py:276-493`)."""

    cfg: GPTSTConfig

    def setup(self):
        c = self.cfg
        self.dim_in_flow = _dense(c.hidden_dim, name="dim_in_flow")
        self.encoder_trunk = STHCN(c, name="encoder")
        self.decoder_trunk = STHCN(c, name="decoder")
        self.dim_flow_out = _dense(c.input_base_dim, name="dim_flow_out")
        self.mlp_rl = MLPRL(
            dim_in=c.input_base_dim, dim_out=c.HS, hidden_dim=c.hidden_dim,
            embed_dim=c.embed_dim, name="mlp_rl")
        self.teb4mask = TimeFeature(c.embed_dim, name="teb4mask")
        self.neb4mask = self.param(
            "neb4mask", xavier,
            (c.num_nodes, c.embed_dim))

    def _policy(self, source):
        c = self.cfg
        b = c.input_base_dim
        tcat = jnp.concatenate(
            [source[:, :, 0, b:b + 1], source[:, :, 0, b + 1:b + 2]], axis=-1)
        time_eb = self.teb4mask(tcat)
        logits = self.mlp_rl(source[..., :b], time_eb, self.neb4mask)
        return jax.nn.softmax(logits, axis=-1)  # (B,T,N,HS)

    def pretrain(self, source, rng, epoch):
        """forward_pretrain (`GPTST.py:480-483`): returns
        (flow_out, flow_decode, 1-mask, probability, HS_cat)."""
        c = self.cfg
        b = c.input_base_dim
        guide = self._policy(source)
        mask = generate_mask(
            c, rng, jax.lax.stop_gradient(guide), epoch,
            (source.shape[0], c.horizon, c.num_nodes, b))
        # cast to the compute dtype so a bf16 forward stays bf16 (the
        # mask itself is built in f32 for exact budget arithmetic)
        mask = jax.lax.stop_gradient(mask).astype(source.dtype)
        masked_src = jnp.where(mask == 0, c.scaler_zeros,
                               mask * source[..., :b])
        x_flow = self.dim_in_flow(masked_src)
        enc, hs1, _ = self.encoder_trunk(source, x_flow)
        dec, _, _ = self.decoder_trunk(source, enc)
        flow_out = self.dim_flow_out(dec)
        # HS_cat: routing posterior as per-(b,t,n) cluster distribution
        hs_cat = jnp.transpose(hs1, (0, 1, 3, 2))  # (B,T,N,HS)
        return flow_out, dec, 1.0 - mask, guide, hs_cat

    def encode(self, source):
        """forward_fune (`GPTST.py:485-487`): frozen-encoder embedding."""
        c = self.cfg
        x_flow = self.dim_in_flow(source[..., : c.input_base_dim])
        enc, _, _ = self.encoder_trunk(source, x_flow)
        return enc

    def __call__(self, source, rng: Optional[jax.Array] = None,
                 epoch: Optional[jnp.ndarray] = None):
        if rng is None:
            return self.encode(source)
        return self.pretrain(source, rng, epoch)
