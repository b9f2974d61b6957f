"""Hybrid block + COO aggregation (the 64k straggler-edge fix,
VERDICT r3 weak #3): edges landing in nearly-empty blocks ride an XLA
gather/segment-sum tail instead of streaming full TB^2 value blocks.

Guarantees tested:
  * the split partitions edges exactly (block part + tail == graph);
  * `graph_matmul` on a hybrid SparseSupport == dense einsum, forward
    and gradient, including the transposed support (`.T`);
  * `make_support_coo` builds without a dense (N, N) and matches;
  * RCM from COO == RCM from dense on the same graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptst_tpu.graph.artifacts import random_sensor_graph, sym_adj
from gptst_tpu.kernels import spmm as spmm_mod
from gptst_tpu.kernels.spmm import coo_matmul, split_coo_hybrid
from gptst_tpu.ops.graph_conv import (
    SparseSupport, graph_matmul, make_support, make_support_coo,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        spmm_mod.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


def _banded_plus_far(n, band, far, seed=0):
    """Dense-banded core + `far` isolated long-range edges — the road
    graph shape whose straggler blocks motivate the hybrid split."""
    rng = np.random.default_rng(seed)
    adj = np.zeros((n, n), np.float32)
    for off in range(1, band + 1):
        idx = np.arange(n - off)
        adj[idx, idx + off] = rng.uniform(0.5, 1.0, size=idx.size)
        adj[idx + off, idx] = rng.uniform(0.5, 1.0, size=idx.size)
    fr = rng.integers(0, n, size=far)
    fc = (fr + n // 2 + rng.integers(0, n // 4, size=far)) % n
    keep = fr != fc
    adj[fr[keep], fc[keep]] = 1.0
    return adj


def test_split_partitions_edges_exactly():
    n, tile = 320, 64
    adj = _banded_plus_far(n, band=12, far=40)
    rows, cols = np.nonzero(adj)
    vals = adj[rows, cols]
    a, at, coo, coo_t = split_coo_hybrid(rows, cols, vals, n, tile=tile)
    assert coo is not None and coo_t is not None
    # tail holds only straggler edges; counts add up
    nb_edges = int(np.count_nonzero(np.asarray(a.block_vals)))
    assert nb_edges + coo.nnz == rows.size
    assert coo_t.nnz == coo.nnz
    # reassemble the dense matrix from both parts
    dense = np.zeros((a.n_pad, a.n_pad), np.float32)
    ptr = np.asarray(a.block_ptr)
    bc = np.asarray(a.block_cols)
    bv = np.asarray(a.block_vals)
    for i in range(len(ptr) - 1):
        for b in range(ptr[i], ptr[i + 1]):
            dense[i * tile:(i + 1) * tile,
                  bc[b] * tile:(bc[b] + 1) * tile] += bv[b]
    dense = dense[:n, :n]
    dense[np.asarray(coo.rows), np.asarray(coo.cols)] += np.asarray(
        coo.vals)
    np.testing.assert_allclose(dense, adj, rtol=1e-6)


def test_coo_matmul_matches_dense():
    n = 96
    rng = np.random.default_rng(3)
    rows = np.sort(rng.integers(0, n, size=50))
    cols = rng.integers(0, n, size=50)
    vals = rng.normal(size=50).astype(np.float32)
    from gptst_tpu.kernels.spmm import COOTail

    coo = COOTail(jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32),
                  jnp.asarray(vals), n)
    o = np.lexsort((rows, cols))
    coo_t = COOTail(jnp.asarray(cols[o], jnp.int32),
                    jnp.asarray(rows[o], jnp.int32),
                    jnp.asarray(vals[o]), n)
    adj = np.zeros((n, n), np.float32)
    np.add.at(adj, (rows, cols), vals)
    x = np.asarray(rng.normal(size=(2, 5, n, 4)), np.float32)
    got = coo_matmul(coo, coo_t, jnp.asarray(x))
    want = jnp.einsum("nm,btmc->btnc", jnp.asarray(adj), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # the custom VJP's dx must match dense AD (gather+segment-sum on
    # the transposed tail, not a scatter)
    gs = jax.grad(lambda v: (coo_matmul(coo, coo_t, v) ** 2).sum())(
        jnp.asarray(x))
    gd = jax.grad(lambda v: (jnp.einsum(
        "nm,btmc->btnc", jnp.asarray(adj), v) ** 2).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reorder", [False, True])
def test_hybrid_matmul_and_grad_match_dense(reorder):
    n, tile = 320, 64
    adj = _banded_plus_far(n, band=12, far=40, seed=5)
    sup = make_support(adj, dense_threshold=1, tile=tile, reorder=reorder)
    assert isinstance(sup, SparseSupport)
    assert sup.coo is not None  # the far edges must actually split

    x = np.asarray(
        np.random.default_rng(0).normal(size=(2, n, 8)), np.float32)
    xd = jnp.asarray(x)
    dense = jnp.asarray(adj)

    got = graph_matmul(sup, xd)
    want = jnp.einsum("nm,bmc->bnc", dense, xd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    got_t = graph_matmul(sup.T, xd)
    want_t = jnp.einsum("mn,bmc->bnc", dense, xd)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=2e-4, atol=2e-4)

    def f_sparse(v):
        return (graph_matmul(sup, v) ** 2).sum()

    def f_dense(v):
        return (jnp.einsum("nm,bmc->bnc", dense, v) ** 2).sum()

    gs = jax.grad(f_sparse)(xd)
    gd = jax.grad(f_dense)(xd)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                               rtol=2e-3, atol=2e-3)


def test_make_support_coo_matches_dense_build():
    n, tile = 320, 64
    adj = _banded_plus_far(n, band=12, far=40, seed=7)
    rows, cols = np.nonzero(adj)
    sup = make_support_coo(rows, cols, adj[rows, cols], n, tile=tile)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(n, 8)), jnp.float32)
    want = jnp.asarray(adj) @ x
    np.testing.assert_allclose(np.asarray(graph_matmul(sup, x)),
                               np.asarray(want), rtol=2e-4, atol=2e-4)


def test_rcm_coo_matches_dense():
    from gptst_tpu.graph.partition import rcm_order, rcm_order_coo

    adj = sym_adj(random_sensor_graph(60, avg_degree=4, seed=2))
    rows, cols = np.nonzero(adj)
    np.testing.assert_array_equal(rcm_order(adj),
                                  rcm_order_coo(rows, cols, 60))


def test_dia_band_matmul_matches_dense():
    """DIA fast path: banded core routes through dia_matmul (fwd + the
    transposed band in the VJP) with dense-einsum numerics."""
    from gptst_tpu.kernels.spmm import dia_pair_from_coo

    n, tile = 320, 64
    adj = _banded_plus_far(n, band=12, far=0, seed=11)  # pure band
    rows, cols = np.nonzero(adj)
    pair = dia_pair_from_coo(rows, cols, adj[rows, cols], n, tile=tile)
    assert pair is not None
    dia, dia_t = pair
    assert dia.w == 1

    from gptst_tpu.kernels.spmm import dia_matmul

    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, n, 8)), jnp.float32)
    dense = jnp.asarray(adj)
    got = dia_matmul(dia, dia_t, x)
    want = jnp.einsum("nm,bmc->bnc", dense, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # transpose path == dense transpose
    got_t = dia_matmul(dia_t, dia, x)
    want_t = jnp.einsum("mn,bmc->bnc", dense, x)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=2e-4, atol=2e-4)
    # gradient flows through the transposed band
    g = jax.grad(lambda v: (dia_matmul(dia, dia_t, v) ** 2).sum())(x)
    gd = jax.grad(lambda v: (
        jnp.einsum("nm,bmc->bnc", dense, v) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd),
                               rtol=2e-3, atol=2e-3)


def test_make_support_coo_selects_dia_and_matches():
    """Banded + far edges: the support carries a DIA band for the core
    AND the COO tail for stragglers; graph_matmul == dense einsum."""
    n, tile = 320, 64
    adj = _banded_plus_far(n, band=12, far=40, seed=13)
    rows, cols = np.nonzero(adj)
    sup = make_support_coo(rows, cols, adj[rows, cols], n, tile=tile,
                           reorder=False)
    assert sup.dia is not None and sup.coo is not None

    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, n, 8)), jnp.float32)
    dense = jnp.asarray(adj)
    got = graph_matmul(sup, x)
    want = jnp.einsum("nm,bmc->bnc", dense, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    got_t = graph_matmul(sup.T, x)
    want_t = jnp.einsum("mn,bmc->bnc", dense, x)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=2e-4, atol=2e-4)


def test_dia_rejects_wide_or_sparse_bands():
    from gptst_tpu.kernels.spmm import dia_pair_from_coo

    n, tile = 640, 64
    # wide band: blocks at distance 8 tiles
    rows = np.arange(n - 512)
    cols = rows + 512
    assert dia_pair_from_coo(rows, cols, np.ones(rows.size), n,
                             tile=tile) is None


def test_msdr_adapt_pattern_is_in_original_coordinates():
    """The MSDR builder's learned-adjacency pattern must live in
    dataset node order even when make_support RCM-permutes the static
    supports internally (a pattern lifted from the permuted bcsr would
    connect the wrong node pairs — the adaptive support is applied to
    unpermuted activations)."""
    from gptst_tpu.kernels.sddmm import adaptive_support
    from gptst_tpu.models.build import msdr_adapt_pattern

    n, tile = 256, 64
    banded = _banded_plus_far(n, band=20, far=0, seed=3)
    # scramble the node order so RCM finds a better one
    perm = np.random.default_rng(0).permutation(n)
    adj = banded[perm][:, perm]

    sup = make_support_coo(*np.nonzero(adj),
                           adj[np.nonzero(adj)], n, tile=tile,
                           reorder=True)
    assert sup.perm is not None  # the hazard is live in this setup

    pat = msdr_adapt_pattern(adj, n)
    pt = pat.tile  # the pattern's own tile (builder default), not the
    # support's — the coordinate system is what's under test
    # every dense-block original edge lands inside the pattern
    rows, cols = np.nonzero(adj)
    from gptst_tpu.kernels.spmm import coo_split_mask

    mk = coo_split_mask(rows, cols, n, pt)
    blocks = {(int(r), int(c)) for r, c in zip(
        np.asarray(pat.row_ids)[: int(np.asarray(pat.ptr)[-1])],
        np.asarray(pat.cols)[: int(np.asarray(pat.ptr)[-1])])}
    assert all((r // pt, c // pt) in blocks
               for r, c in zip(rows[mk], cols[mk]))

    # and the adaptive support computes in original coordinates:
    # restrict a dense reference to the pattern's support
    rng = np.random.default_rng(1)
    e1 = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    e2 = jnp.asarray(rng.normal(size=(6, n)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, n, 4)).astype(np.float32))
    adp = adaptive_support(pat, e1, e2)
    got = graph_matmul(adp, x)

    # the pattern mask zeroes non-edges within stored blocks
    pr = np.asarray(pat.row_ids)[: int(np.asarray(pat.ptr)[-1])]
    pc = np.asarray(pat.cols)[: int(np.asarray(pat.ptr)[-1])]
    pm = np.zeros((pat.n_pad, pat.n_pad), np.float32)
    mv = np.asarray(pat.mask)
    for b, (r, c) in enumerate(zip(pr, pc)):
        pm[r * pt:(r + 1) * pt, c * pt:(c + 1) * pt] = mv[b]
    pm = pm[:n, :n]
    scores = np.exp(np.maximum(np.asarray(e1 @ e2), 0.0)) * pm
    denom = np.maximum(scores.sum(axis=1, keepdims=True), 1e-38)
    want = jnp.einsum("nm,bmc->bnc", jnp.asarray(scores / denom), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_dia_ring_variant_matches(monkeypatch):
    """The opt-in ring-buffered DIA kernel (x blocks DMA once each,
    GPTST_DIA_RING=1) must reproduce the BlockSpec variant exactly."""
    from gptst_tpu.kernels.spmm import dia_matmul, dia_pair_from_coo

    n, tile = 448, 64
    adj = _banded_plus_far(n, band=20, far=0, seed=17)
    rows, cols = np.nonzero(adj)
    pair = dia_pair_from_coo(rows, cols, adj[rows, cols], n, tile=tile)
    assert pair is not None
    dia, dia_t = pair

    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, n, 20)), jnp.float32)
    base = np.asarray(dia_matmul(dia, dia_t, x))
    # selection is process-stable (read once at import, ADVICE r4);
    # patch the resolved flag, not the env var
    from gptst_tpu.kernels import spmm as spmm_mod

    monkeypatch.setattr(spmm_mod, "_DIA_USE_RING", True)
    ring = np.asarray(dia_matmul(dia, dia_t, x))
    np.testing.assert_allclose(ring, base, rtol=1e-5, atol=1e-5)
    want = jnp.einsum("nm,bmc->bnc", jnp.asarray(adj), x)
    np.testing.assert_allclose(ring, np.asarray(want), rtol=2e-4,
                               atol=2e-4)
