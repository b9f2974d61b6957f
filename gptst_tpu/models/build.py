"""Model factory: wires configs + graph artifacts into ForwardFns.

The counterpart of `model/Model.py`'s predictor mux plus the per-model
`args.py` graph builders, as one explicit registry. Each entry returns
`(init_fn, forward_fn)` where

  init_fn(rng)                          -> params
  forward_fn(params, x, y, rng, epoch)  -> ModelOutput

`x` is the full (B, T, N, base+2) input with calendar channels; ori
mode slices the base channels (`model/Model.py:119-127`), eval mode
fuses the frozen pretrain embedding (`:106-117`).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from gptst_tpu.config.config import FrameworkConfig
from gptst_tpu.graph.artifacts import (
    cheb_poly_stack, random_sensor_graph, scaled_laplacian,
)
from gptst_tpu.models.api import ModelOutput
from gptst_tpu.ops.graph_conv import SparseSupport, make_support


def load_base_adjacency(cfg: FrameworkConfig, seed: int = 0) -> np.ndarray:
    """The raw sensor graph: real files under `cfg.data_root` when
    present (per-dataset dispatch of `model/STGCN/args.py:78-86` —
    METR_LA adj_mx.pkl / NYC dense CSV / edge-list CSV), otherwise a
    synthetic sparse sensor graph with matching node count."""
    from gptst_tpu.graph.io import resolve_adjacency

    real = resolve_adjacency(cfg.data_root, cfg.dataset, cfg.num_nodes)
    if real is not None:
        return real
    return random_sensor_graph(cfg.num_nodes, avg_degree=6, seed=seed)


_PREDICTOR_CONFIGS = {
    "STGCN": ("stgcn", "STGCNConfig"), "TGCN": ("tgcn", "TGCNConfig"),
    "GWN": ("gwn", "GWNConfig"), "MTGNN": ("mtgnn", "MTGNNConfig"),
    "ASTGCN": ("astgcn", "ASTGCNConfig"),
    "STSGCN": ("stsgcn", "STSGCNConfig"),
    "STFGNN": ("stfgnn", "STFGNNConfig"),
    "STGODE": ("stgode", "STGODEConfig"), "ST_WA": ("stwa", "STWAConfig"),
    "MSDR": ("msdr", "MSDRConfig"), "CCRNN": ("ccrnn", "CCRNNConfig"),
    "STMGCN": ("stmgcn", "STMGCNConfig"),
    "DMVSTNET": ("dmvstnet", "DMVSTNetConfig"),
}


def predictor_config_class(model: str):
    """The config dataclass for a predictor, without building it (used
    by the CLI to expose every field as a `--flag`,
    `lib/Params_predictor.py:10` / `readme.md:78-82`)."""
    import importlib

    if model not in _PREDICTOR_CONFIGS:
        return None
    mod, cls = _PREDICTOR_CONFIGS[model]
    return getattr(
        importlib.import_module(f"gptst_tpu.models.predictors.{mod}"), cls)


def make_predictor_config(cls, cfg: FrameworkConfig, **kw):
    """Predictor config: built-in defaults (mirroring conf/<MODEL>/*)
    optionally overridden by reference-format INI files when
    cfg.predictor_conf_root is set (`lib/Params_predictor.py`), then by
    CLI `--flag` overrides (`cfg.predictor_overrides`, the reference's
    double-hyphen surface, `readme.md:78-82`)."""
    import dataclasses as _dc

    c = cls(**kw)
    if cfg.predictor_conf_root:
        from gptst_tpu.config.predictor_ini import load_predictor_overrides

        ov = load_predictor_overrides(
            cfg.model, cfg.dataset, cfg.predictor_conf_root, cls)
        if ov:
            c = _dc.replace(c, **ov)
    if cfg.predictor_overrides:
        from gptst_tpu.config.predictor_ini import _coerce

        fields = {f.name for f in _dc.fields(cls)}
        ov = {k: _coerce(v, getattr(c, k))
              for k, v in cfg.predictor_overrides if k in fields}
        if ov:
            c = _dc.replace(c, **ov)
    return c


ModelBuilder = Callable[..., tuple[Callable, Callable]]
_REGISTRY: dict[str, ModelBuilder] = {}


def register_model(name: str):
    def deco(fn: ModelBuilder) -> ModelBuilder:
        _REGISTRY[name] = fn
        return fn
    return deco


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def build_predictor(cfg: FrameworkConfig, dim_in: int | None = None,
                    adj: np.ndarray | None = None):
    """Build the bare predictor for `cfg.model` (ori-mode input width by
    default). Returns (init_fn, apply_fn) where apply_fn(params, x_base)
    -> (B, horizon, N, dim_out)."""
    # Import predictors lazily (mirrors `model/Model.py:52-93`) to keep
    # module import cheap and dependency edges one-directional.
    import gptst_tpu.models.predictors  # noqa: F401  (registration)

    if cfg.model not in _REGISTRY:
        raise ValueError(
            f"unknown model {cfg.model!r}; available: {available_models()}")
    if dim_in is None:
        dim_in = cfg.input_base_dim if cfg.mode == "ori" else cfg.hidden_dim
    if adj is None:
        adj = load_base_adjacency(cfg)
    return _REGISTRY[cfg.model](cfg, dim_in, adj)


def predictor_forward(cfg: FrameworkConfig, apply_fn) -> Callable:
    """Wrap a bare predictor into the ModelOutput contract (ori mode).

    `rng` (when given, i.e. during training) drives dropout."""

    def forward(params, x, y=None, rng=None, epoch=None, step=None) -> ModelOutput:
        pred = apply_fn(params, x[..., : cfg.input_base_dim], rng,
                        y=y, step=step)
        return ModelOutput(pred=pred)

    return forward


# --- top-level mode dispatch (`model/Run.py:72-77`) -------------------------

def build_pretrain(cfg: FrameworkConfig, scaler_zeros: float):
    """GPT-ST masked-autoencoder pretraining model.

    Returns (init_fn, forward_fn) in the ModelOutput contract.
    """
    from gptst_tpu.models.gptst import GPTST, GPTSTConfig

    gcfg = GPTSTConfig.from_framework(cfg, scaler_zeros)
    model = GPTST(gcfg)

    def init_fn(rng):
        rng, mask_rng = jax.random.split(rng)
        x0 = jnp.zeros(
            (2, cfg.lag, cfg.num_nodes, cfg.input_base_dim + 2), jnp.float32)
        return model.init(rng, x0, mask_rng, jnp.asarray(1, jnp.int32))

    def forward(params, x, y=None, rng=None, epoch=None, step=None) -> ModelOutput:
        if rng is None:  # encoder-only (enhance / no-mask path)
            emb = model.apply(params, x)
            return ModelOutput(pred=emb)
        flow_out, dec, inv_mask, prob, hs_cat = model.apply(
            params, x, rng, epoch)
        return ModelOutput(pred=flow_out, out_time=dec, mask=inv_mask,
                           probability=prob, routing=hs_cat)

    return init_fn, forward


def build_enhanced(cfg: FrameworkConfig, scaler_zeros: float,
                   pretrain_params: Any, adj: np.ndarray | None = None):
    """Eval mode: frozen encoder + fusion head + predictor
    (`model/Model.py:106-117`)."""
    from gptst_tpu.models.enhance import build_enhance_apply
    from gptst_tpu.models.gptst import GPTSTConfig

    gcfg = GPTSTConfig.from_framework(cfg, scaler_zeros)
    pred_init, pred_apply = build_predictor(cfg, dim_in=cfg.hidden_dim, adj=adj)
    head_init, apply_fn = build_enhance_apply(gcfg, pretrain_params, pred_apply)

    def init_fn(rng):
        r1, r2 = jax.random.split(rng)
        x0 = jnp.zeros(
            (2, cfg.lag, cfg.num_nodes, cfg.input_base_dim + 2), jnp.float32)
        return {"head": head_init(r1, x0), "predictor": pred_init(r2)}

    def forward(params, x, y=None, rng=None, epoch=None, step=None) -> ModelOutput:
        return ModelOutput(pred=apply_fn(params, x, rng, y=y, step=step))

    return init_fn, forward


def build_model(cfg: FrameworkConfig, scaler_zeros: float = 0.0,
                pretrain_params: Any = None,
                adj: np.ndarray | None = None, mesh=None):
    """Mode dispatch: pretrain -> GPTST; eval -> enhanced; ori -> bare
    predictor. Returns (init_fn, forward_fn) in the ModelOutput contract.

    With `mesh` (a ('data','graph') Mesh, graph axis > 1), predictor
    graph supports are built node-sharded with explicit collectives
    (`ops/graph_conv.make_sharded_support`); everything else relies on
    GSPMD propagation from the operands' shardings."""
    from gptst_tpu.ops.graph_conv import use_sharding_mesh

    with use_sharding_mesh(mesh):
        if cfg.mode == "pretrain":
            return build_pretrain(cfg, scaler_zeros)
        if cfg.mode == "eval":
            if pretrain_params is None:
                raise ValueError("eval mode requires pretrain_params")
            return build_enhanced(cfg, scaler_zeros, pretrain_params, adj)
        init_fn, apply_fn = build_predictor(cfg, adj=adj)
        return init_fn, predictor_forward(cfg, apply_fn)


# --- registrations ----------------------------------------------------------

@register_model("STGCN")
def _build_stgcn(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.models.predictors.stgcn import STGCN, STGCNConfig

    pcfg = make_predictor_config(STGCNConfig, cfg, num_nodes=cfg.num_nodes)
    cheb = jnp.asarray(cheb_poly_stack(scaled_laplacian(adj), pcfg.ks))
    model = STGCN(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0, cheb)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        if rng is not None and pcfg.drop_prob > 0:
            return model.apply(params, x_base, cheb, deterministic=False,
                               rngs={"dropout": rng})
        return model.apply(params, x_base, cheb)

    return init_fn, apply_fn


@register_model("TGCN")
def _build_tgcn(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.graph.artifacts import sym_adj
    from gptst_tpu.models.predictors.tgcn import TGCN, TGCNConfig

    pcfg = make_predictor_config(TGCNConfig, cfg, num_nodes=cfg.num_nodes)
    support = make_support(sym_adj(adj))
    model = TGCN(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim,
                 horizon=cfg.horizon)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0, support)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        return model.apply(params, x_base, support)

    return init_fn, apply_fn


@register_model("STGODE")
def _build_stgode(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.config.datasets import get_dataset_spec
    from gptst_tpu.data.pipeline import load_raw_series
    from gptst_tpu.graph.dtw import cached_artifact, stgode_dtw_graph
    from gptst_tpu.models.predictors.stgode import (
        STGODE, STGODEConfig, stgode_normalized_adj,
    )

    pcfg = make_predictor_config(STGODEConfig, cfg, num_nodes=cfg.num_nodes)
    # prefer the shipped distance prefabs
    # (`data/STGODE/<ds>/<ds>_{dtw,spatial}_distance.npy`,
    # `model/STGODE/args.py:57-125`); synthesize via banded DTW when absent
    from gptst_tpu.graph.io import load_stgode_prefabs

    prefab = load_stgode_prefabs(cfg.data_root, cfg.dataset)
    if prefab is not None:
        a_se, a_sp = prefab
    else:
        spec = get_dataset_spec(cfg.dataset)
        spd = (24 * 60) // spec.interval
        raw = load_raw_series(cfg.dataset)[:, : cfg.num_nodes, 0]
        mean, std = raw.mean(), max(raw.std(), 1e-8)
        a_se = cached_artifact(
            "./.gptst_cache", f"stgode_dtw_{cfg.dataset}_{cfg.num_nodes}",
            [raw[:1000]],
            lambda: stgode_dtw_graph((raw - mean) / std, steps_per_day=spd))
        a_sp = adj
    adj_sp = jnp.asarray(stgode_normalized_adj(a_sp))
    adj_se = jnp.asarray(stgode_normalized_adj(a_se))
    model = STGODE(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim,
                   horizon=cfg.horizon, lag=cfg.lag)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0, adj_sp, adj_se)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        return model.apply(params, x_base, adj_sp, adj_se)

    return init_fn, apply_fn


@register_model("STFGNN")
def _build_stfgnn(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.config.datasets import get_dataset_spec
    from gptst_tpu.data.pipeline import load_raw_series
    from gptst_tpu.graph.dtw import cached_artifact, stfgnn_dtw_graph
    from gptst_tpu.models.predictors.stfgnn import (
        STFGNN, STFGNNConfig, construct_adj_fusion,
    )

    pcfg = make_predictor_config(STFGNNConfig, cfg, num_nodes=cfg.num_nodes)
    # prefer the shipped fusion-graph cache — the reference caches the
    # FINAL 4N x 4N fusion adjacency, not the N x N DTW graph
    # (`data/STFGNN/<ds>/<ds>_adj_mx.npy`, `model/STFGNN/args.py:196-207`)
    from gptst_tpu.graph.io import load_stfgnn_fusion_prefab

    fusion_np = load_stfgnn_fusion_prefab(cfg.data_root, cfg.dataset)
    if fusion_np is None or fusion_np.shape[0] != pcfg.strides * cfg.num_nodes:
        spec = get_dataset_spec(cfg.dataset)
        spd = (24 * 60) // spec.interval
        raw = load_raw_series(cfg.dataset)[:, : cfg.num_nodes, 0]
        train_days = int((raw.shape[0] // spd) * 0.6)
        train = raw[: max(train_days, 1) * spd]
        a_dtw = cached_artifact(
            "./.gptst_cache", f"stfgnn_dtw_{cfg.dataset}_{cfg.num_nodes}",
            [raw[:1000]],
            lambda: stfgnn_dtw_graph(train, steps_per_day=spd))
        fusion_np = construct_adj_fusion(adj, a_dtw, pcfg.strides)
    fusion = jnp.asarray(fusion_np)
    model = STFGNN(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim,
                   horizon=cfg.horizon, lag=cfg.lag)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0, fusion)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        return model.apply(params, x_base, fusion)

    return init_fn, apply_fn


@register_model("ST_WA")
def _build_stwa(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.models.predictors.stwa import STWA, STWAConfig

    pcfg = make_predictor_config(STWAConfig, cfg, num_nodes=cfg.num_nodes)
    model = STWA(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim,
                 horizon=cfg.horizon, lag=cfg.lag)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        return model.apply(params, x_base, rng)

    return init_fn, apply_fn


@register_model("CCRNN")
def _build_ccrnn(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.data.pipeline import load_raw_series, split_by_ratio
    from gptst_tpu.graph.artifacts import svd_rbf_support
    from gptst_tpu.models.predictors.ccrnn import (
        CCRNN, CCRNNConfig, svd_graph_embeddings,
    )

    pcfg = make_predictor_config(CCRNNConfig, cfg,
                                 num_nodes=cfg.num_nodes,
                                 n_dim=min(50, cfg.num_nodes))
    # data-driven support from the training period (`args.py:57-76`)
    raw = load_raw_series(cfg.dataset)[:, : cfg.num_nodes]
    train, _, _ = split_by_ratio(raw, cfg.val_ratio, cfg.test_ratio)
    support = svd_rbf_support(train, hidden_size=20)
    e1, e2 = svd_graph_embeddings(support, pcfg.n_dim)
    model = CCRNN(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim,
                  horizon=cfg.horizon, emb1_init=e1, emb2_init=e2)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        return model.apply(params, x_base, y, rng, step)

    return init_fn, apply_fn


@register_model("STMGCN")
def _build_stmgcn(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.data.pipeline import load_raw_series, split_by_ratio
    from gptst_tpu.graph.artifacts import cheb_poly_stack_rescaled, pearson_graph
    from gptst_tpu.models.predictors.stmgcn import STMGCN, STMGCNConfig

    pcfg = make_predictor_config(STMGCNConfig, cfg, num_nodes=cfg.num_nodes)
    # prefer the shipped dis/pcc prefab graphs
    # (`data/STMGCN_demand/{dis,pcc}_{bb,tt}.csv`,
    # `model/STMGCN_demand/args.py:35-53`)
    from gptst_tpu.graph.io import load_stmgcn_prefabs

    prefab = load_stmgcn_prefabs(cfg.data_root, cfg.dataset)
    if prefab is not None:
        dis_graph, pcc_graph = prefab
    else:
        raw = load_raw_series(cfg.dataset)[:, : cfg.num_nodes]
        train, _, _ = split_by_ratio(raw, cfg.val_ratio, cfg.test_ratio)
        dis_graph, pcc_graph = adj, pearson_graph(train)
    stacks = jnp.asarray(np.nan_to_num(np.stack([
        cheb_poly_stack_rescaled(dis_graph, pcfg.cheb_k),
        cheb_poly_stack_rescaled(pcc_graph, pcfg.cheb_k),
    ])))
    model = STMGCN(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0, stacks)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        return model.apply(params, x_base, stacks)

    return init_fn, apply_fn


def msdr_adapt_pattern(mat0: np.ndarray, num_nodes: int):
    """SDDMM pattern for MSDR's learned adjacency, from the first
    static support's edge list in ORIGINAL node order. The static
    supports may carry an internal RCM permutation, but the model's
    activations are in dataset order and `adaptive_support` returns an
    unpermuted SparseSupport — a pattern lifted from a permuted
    `supports[0].bcsr` would connect the wrong node pairs (and that
    bcsr may be a placeholder when the DIA band supersedes it).
    Straggler-block edges are excluded, matching the hybrid split."""
    from gptst_tpu.kernels.sddmm import SDDMMPattern
    from gptst_tpu.kernels.spmm import BlockCSR, coo_split_mask

    m0 = np.asarray(mat0)
    rows, cols = np.nonzero(m0)
    mk = coo_split_mask(rows, cols, num_nodes)
    return SDDMMPattern.from_bcsr(BlockCSR.from_coo(
        rows[mk], cols[mk], m0[rows, cols][mk], num_nodes))


@register_model("MSDR")
def _build_msdr(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.models.predictors.msdr import (
        MSDR, MSDRConfig, dual_random_walk_supports,
    )

    pcfg = make_predictor_config(MSDRConfig, cfg, num_nodes=cfg.num_nodes)
    mats = dual_random_walk_supports(adj)
    supports = tuple(make_support(s) for s in mats)
    # at large N the learned adaptive adjacency cannot be dense
    # (softmax(relu(E1 E2)) is O(N^2) memory, `gmsdr_cell.py:122`);
    # restrict it to the static graph's block pattern via the sparse
    # SDDMM path (`kernels/sddmm.py:adaptive_support`). The pattern is
    # built from the raw edge list in ORIGINAL node order — the static
    # supports may carry an internal RCM permutation, but the model's
    # activations are in dataset order and `adaptive_support` returns
    # an unpermuted SparseSupport, so a permuted pattern would connect
    # the wrong node pairs (and `supports[0].bcsr` may be a placeholder
    # when the DIA band supersedes it).
    adapt_pattern = None
    if isinstance(supports[0], SparseSupport):
        adapt_pattern = msdr_adapt_pattern(mats[0], cfg.num_nodes)
    model = MSDR(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim,
                 horizon=cfg.horizon)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0, supports, adapt_pattern)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        return model.apply(params, x_base, supports, adapt_pattern)

    return init_fn, apply_fn


@register_model("STSGCN")
def _build_stsgcn(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.models.predictors.stsgcn import (
        STSGCN, STSGCNConfig, construct_sync_adj,
    )

    pcfg = make_predictor_config(STSGCNConfig, cfg, num_nodes=cfg.num_nodes)
    sync_adj = jnp.asarray(construct_sync_adj(adj, pcfg.steps))
    model = STSGCN(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim,
                   horizon=cfg.horizon, lag=cfg.lag)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0, sync_adj)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        return model.apply(params, x_base, sync_adj)

    return init_fn, apply_fn


@register_model("DMVSTNET")
def _build_dmvstnet(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.models.predictors.dmvstnet import DMVSTNet, DMVSTNetConfig

    pcfg = make_predictor_config(DMVSTNetConfig, cfg, num_nodes=cfg.num_nodes)
    adj_j = jnp.asarray(adj)
    model = DMVSTNet(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0, adj_j)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        return model.apply(params, x_base, adj_j)

    return init_fn, apply_fn


@register_model("ASTGCN")
def _build_astgcn(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.models.predictors.astgcn import ASTGCN, ASTGCNConfig

    pcfg = make_predictor_config(ASTGCNConfig, cfg, num_nodes=cfg.num_nodes)
    cheb = jnp.asarray(cheb_poly_stack(scaled_laplacian(adj), pcfg.K))
    model = ASTGCN(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim,
                   horizon=cfg.horizon, lag=cfg.lag)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0, cheb)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        return model.apply(params, x_base, cheb)

    return init_fn, apply_fn


@register_model("MTGNN")
def _build_mtgnn(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.models.predictors.mtgnn import MTGNN, MTGNNConfig

    pcfg = make_predictor_config(MTGNNConfig, cfg, num_nodes=cfg.num_nodes)
    model = MTGNN(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim,
                  horizon=cfg.horizon, lag=cfg.lag)
    pre_adj = jnp.asarray(adj - np.eye(cfg.num_nodes, dtype=adj.dtype))

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0, pre_adj)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        if rng is not None and pcfg.dropout > 0:
            return model.apply(params, x_base, pre_adj, deterministic=False,
                               rngs={"dropout": rng})
        return model.apply(params, x_base, pre_adj)

    return init_fn, apply_fn


@register_model("GWN")
def _build_gwn(cfg: FrameworkConfig, dim_in: int, adj: np.ndarray):
    from gptst_tpu.models.predictors.gwn import GWN, GWNConfig

    pcfg = make_predictor_config(GWNConfig, cfg, num_nodes=cfg.num_nodes)
    # adjtype preprocessing (`GWN.py:299-313`); shipped confs use
    # doubletransition. aptonly=True then DROPS the static supports for
    # the forward pass, but `aptinit = supports[0]` is taken first
    # (`GWN.py:143-149`) — so the matrices are built whenever either
    # consumer needs them.
    from gptst_tpu.graph.artifacts import (
        asym_adj, scaled_laplacian, sym_adj, sym_norm_laplacian,
    )

    def adj_mats():
        t = pcfg.adjtype
        if t == "doubletransition":
            return [asym_adj(adj), asym_adj(adj.T)]
        if t == "transition":
            return [asym_adj(adj)]
        if t == "symnadj":
            return [sym_adj(adj)]
        if t == "scalap":
            return [np.asarray(scaled_laplacian(adj), np.float32)]
        if t == "normlap":
            return [np.asarray(sym_norm_laplacian(adj), np.float32)]
        if t == "identity":
            return [np.eye(adj.shape[0], dtype=np.float32)]
        raise ValueError(f"adj type not defined: {t}")

    mats = None
    if pcfg.aptonly:
        supports = ()
    else:
        mats = adj_mats()
        supports = tuple(make_support(m) for m in mats)
    nodevec_init = None
    if pcfg.gcn_bool and pcfg.addaptadj and not pcfg.randomadj:
        # SVD-seeded nodevecs (`GWN.py:159-175`): E1 = U_k sqrt(S_k),
        # E2 = sqrt(S_k) V_k^T of supports[0]
        if mats is None:
            mats = adj_mats()
        u, s, vh = np.linalg.svd(mats[0].astype(np.float64))
        k = pcfg.adapt_rank
        emb1 = (u[:, :k] * np.sqrt(s[:k])).astype(np.float32)
        emb2 = (np.sqrt(s[:k])[:, None] * vh[:k]).astype(np.float32)
        nodevec_init = (
            lambda rng, shape, dtype=jnp.float32: jnp.asarray(emb1, dtype),
            lambda rng, shape, dtype=jnp.float32: jnp.asarray(emb2, dtype),
        )
    model = GWN(cfg=pcfg, dim_in=dim_in, dim_out=cfg.output_dim,
                horizon=cfg.horizon, nodevec_init=nodevec_init)

    def init_fn(rng):
        x0 = jnp.zeros((2, cfg.lag, cfg.num_nodes, dim_in), jnp.float32)
        return model.init(rng, x0, supports)

    def apply_fn(params, x_base, rng=None, y=None, step=None):
        if rng is not None and pcfg.dropout > 0:
            return model.apply(params, x_base, supports, deterministic=False,
                               rngs={"dropout": rng})
        return model.apply(params, x_base, supports)

    return init_fn, apply_fn
