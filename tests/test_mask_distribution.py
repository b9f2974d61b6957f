"""Joint-distribution parity of the adaptive mask curriculum vs the
reference generator (`model/Pretrain_model/GPTST.py:337-413`).

The distributional tests in test_gptst.py pin exact counts, cluster
structure and the ramp; this file pins the *joint* law: with matched
guide inputs (the reference's own softmax_guide_weight fed to both
generators), the distribution over which clusters end up fully masked
must agree. Both generators are sampled K times under independent
seeds and compared with a two-sample chi-square over the
fully-masked-cluster bitmask categories, plus a marginal per-position
mask-frequency check.

The reference's STHCN trunk is stubbed out (the mask is produced
before `STHCN_encode` runs, `GPTST.py:416-421`), so each trial costs
only the mask branch itself — the generator under test is the real
reference code path.
"""

import random
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/model")

import jax
import jax.numpy as jnp

B, T, N, HS = 2, 4, 12, 4
EPOCHS, CHANGE, EPOCH = 20, 10, 15
MASK_RATIO, ADA_MASK_RATIO = 0.5, 1.0
K = 600


@pytest.fixture(autouse=True)
def _cpu_shim(monkeypatch):
    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        if args and isinstance(args[0], (str, torch.device)) \
                and "cuda" in str(args[0]):
            return orig_to(self, "cpu")
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", to)


class _StubTrunk(torch.nn.Module):
    """Identity stand-in for STHCN_encode — the mask never depends on it."""

    def forward(self, source, x_in):
        hs = torch.zeros(x_in.shape[0], T, HS, N, 1)
        return x_in, hs, hs


def _build_reference(ada_type: str, seed: int):
    import argparse

    from Pretrain_model.GPTST import Hypergraph_encoder

    ns = argparse.Namespace(
        num_nodes=N, input_base_dim=1, input_extra_dim=2, hidden_dim=8,
        output_dim=1, horizon=T, lag=T, embed_dim=8, embed_dim_spa=4,
        HS=HS, HT=6, HT_Tem=4, num_route=2, mode="pretrain",
        device=torch.device("cpu"), scaler_zeros=0.0, interval=288,
        week_day=7, mask_ratio=MASK_RATIO, ada_mask_ratio=ADA_MASK_RATIO,
        ada_type=ada_type, change_epoch=CHANGE, epochs=EPOCHS)
    torch.manual_seed(seed)
    ref = Hypergraph_encoder(ns)
    g = torch.Generator().manual_seed(seed)
    for p in ref.parameters():
        p.data = torch.randn(p.shape, generator=g) * 0.5
    ref.STHCN_encode = _StubTrunk()
    return ref


def _source(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    flow = rng.normal(size=(B, T, N, 1))
    day = np.broadcast_to(rng.normal(size=(B, T, 1, 1)), (B, T, N, 1))
    week = np.broadcast_to(rng.normal(size=(B, T, 1, 1)), (B, T, N, 1))
    return np.concatenate([flow, day, week], axis=-1).astype(np.float32)


def _fully_masked_bitmask(mask_flat, label_c, cluster_sizes):
    """Bitmask over clusters that are 100% masked in this trial."""
    bits = 0
    for c in range(HS):
        sel = label_c == c
        if cluster_sizes[c] and not mask_flat[sel].any():
            bits |= 1 << c
    return bits


@pytest.mark.parametrize("ada_type", ["all", "half"])
def test_mask_curriculum_joint_distribution(ada_type):
    from gptst_tpu.models.gptst import GPTSTConfig, generate_mask

    ref = _build_reference(ada_type, seed=7)
    src = _source(11)
    src_t = torch.tensor(src)

    # one deterministic forward captures the matched guide input
    with torch.no_grad():
        torch.manual_seed(0)
        random.seed(0)
        _, _, guide, _ = ref(src_t, src_t, epoch=EPOCH)
    guide = guide.numpy()                      # (B, T, N, HS)
    label_c = np.argmax(guide.reshape(-1, HS), axis=-1)
    sizes = np.bincount(label_c, minlength=HS)
    assert (sizes > 0).sum() >= 3, f"degenerate clustering: {sizes}"

    m = B * T * N
    mask_num = int(m * MASK_RATIO)

    ref_cats, ref_freq = [], np.zeros(m)
    with torch.no_grad():
        for k in range(K):
            torch.manual_seed(1000 + k)
            random.seed(1000 + k)
            _, mask, _, _ = ref(src_t, src_t, epoch=EPOCH)
            flat = mask.numpy().reshape(-1) > 0.5   # True = kept
            assert (~flat).sum() == mask_num
            ref_freq += ~flat
            ref_cats.append(_fully_masked_bitmask(flat, label_c, sizes))

    cfg = GPTSTConfig(
        num_nodes=N, input_base_dim=1, hidden_dim=8, horizon=T,
        embed_dim=8, embed_dim_spa=4, HS=HS, HT=6, HT_Tem=4,
        mask_ratio=MASK_RATIO, ada_mask_ratio=ADA_MASK_RATIO,
        ada_type=ada_type, change_epoch=CHANGE, epochs=EPOCHS)
    gm = jax.jit(lambda r, g, e: generate_mask(cfg, r, g, e, (B, T, N, 1)))
    guide_j = jnp.asarray(guide)
    epoch_j = jnp.asarray(EPOCH, jnp.int32)

    our_cats, our_freq = [], np.zeros(m)
    for k in range(K):
        flat = np.asarray(
            gm(jax.random.PRNGKey(k), guide_j, epoch_j)).reshape(-1) > 0.5
        assert (~flat).sum() == mask_num
        our_freq += ~flat
        our_cats.append(_fully_masked_bitmask(flat, label_c, sizes))

    # --- two-sample chi-square over fully-masked-cluster patterns ------
    cats = sorted(set(ref_cats) | set(our_cats))
    a = np.array([ref_cats.count(c) for c in cats], float)
    b = np.array([our_cats.count(c) for c in cats], float)
    # merge sparse categories so the chi-square approximation holds
    keep = (a + b) >= 10
    if (~keep).any():
        a = np.append(a[keep], a[~keep].sum())
        b = np.append(b[keep], b[~keep].sum())
    stat = float((((a - b) ** 2) / np.maximum(a + b, 1)).sum())
    df = max(len(a) - 1, 1)
    from scipy.stats import chi2

    crit = float(chi2.ppf(0.999, df))
    assert stat < crit, (
        f"joint cluster-mask distributions differ: chi2={stat:.2f} "
        f"> {crit:.2f} (df={df})\nref={a}\nours={b}")

    # --- marginal per-position mask frequency --------------------------
    p_ref, p_our = ref_freq / K, our_freq / K
    se = np.sqrt(2 * p_ref * (1 - p_ref) / K) + 1e-3
    worst = np.max(np.abs(p_ref - p_our) / se)
    assert worst < 5.0, f"marginal mask frequency off by {worst:.1f} sigma"
