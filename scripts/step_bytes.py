"""Activation byte model for the TGCN train step (VERDICT r4 weak #3:
model-level rows were bare timings; the kernel table's discipline —
byte model + achieved fraction — applied to the full step).

The model walks the graph-GRU cell (`models/predictors/tgcn.py`,
reference `model/TGCN/TGCN.py:93-129`) as XLA fusion groups: each
group reads its HBM inputs once and writes its outputs once; the
per-step aggregation traffic comes from the same DIA+COO byte model
the SpMM table uses. Quantities in B*N float units per scan step
(U=64 hidden, D=1 input, Z=D+U):

  forward                      reads   writes
  concat z1=[x,h]              Z       Z
  SpMM(z1)  (band accounted)   Z       Z
  gates=sigmoid(g1@W0+b0)      Z       2U
  rh=r*h, z2=[x,rh]            2U+D    Z
  SpMM(z2)                     Z       Z
  c=tanh(g2@W1+b1)             Z       U
  h'=u*h+(1-u)*c               3U      U

Backward of each fusion group re-reads its saved forward inputs and
writes input-cotangents of the same shapes (~2x the forward traffic),
plus the transposed-support SpMM applications (2 per step). With scan
remat="full" the per-step residual load is replaced by a recomputed
forward (traffic ~= forward instead of stored-residual reads — about
the same bytes, minus the one-time residual WRITES, at ~1 forward of
extra FLOPs, which this elementwise-bound step has slack for).

  python scripts/step_bytes.py --n 16384 --batch 8
prints the model; bench rows quote measured ms against it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_NOMINAL_GBS = 819.0   # v5e paper number — same basis as the SpMM table


def spmm_bytes_per_apply(n: int, feats: int, itemsize: int,
                         band: int = 48, degree: int = 16,
                         far_frac: float = 0.02,
                         vals_itemsize: int = 2) -> float:
    """Hybrid DIA+COO traffic for one support application on the bench
    road graph (mirrors the SoL model in BASELINE.md: band value bytes
    + (2w+2) x-and-out passes + COO gather tail + fused epilogue)."""
    tile = 128
    w = 1                                   # measured band fit at +-48
    rt = -(-n // tile)
    ndiag = 2 * w + 1
    band_vals = rt * ndiag * tile * tile * vals_itemsize
    x_out = (2 * w + 2) * n * feats * itemsize
    far_edges = far_frac * n * degree
    coo = far_edges * (2 * feats * itemsize + 8)
    return band_vals + x_out + coo


def tgcn_step_bytes(n: int, batch: int, t: int = 12, u: int = 64,
                    d: int = 1, itemsize: int = 4,
                    remat: str = "none",
                    layout: str = "node_major") -> dict:
    z = d + u
    unit = batch * n * itemsize             # one B*N float plane
    if layout == "node_major":
        # concat-free node-major cell (`ops/recurrent.GraphGRUCellNM`,
        # round 5): no concat materialization, no per-apply
        # transpose/pad glue (the kernel operand passes live entirely
        # in `spmm_bytes_per_apply`), A·x shared across both gates.
        # Fusion groups (reads + writes, B*N-plane units):
        fwd_planes = (
            2 * d                # once-per-scan (T,N,B,D) transpose,
                                 # amortized over the T steps
            + (d + u + 2 * u)    # gate matmuls + sigmoid -> r, u
            + (2 * u + u)        # rh = r * h
            + (d + 3 * u + u)    # candidate matmul + state update
        )
        # three aggregations per step: x at the 128-lane pad floor,
        # h and r*h at B*U (lane-aligned at the bench shapes)
        agg_feats = [max(batch * d, 128), batch * u, batch * u]
    else:
        # batch-major layout (pre-round-5 — kept for the record): the
        # concats materialize and every application pays its own
        # transpose + pad round-trip, counted as SpMM in/out passes
        fwd_planes = (
            (z + z)              # concat z1
            + (z + z)            # SpMM operand in/out passes
            + (z + 2 * u)        # gate matmul + sigmoid
            + (2 * u + d + z)    # rh + concat z2
            + (z + z)            # SpMM 2 in/out
            + (z + u)            # candidate matmul + tanh
            + (3 * u + u)        # state update
        )
        agg_feats = [batch * z, batch * z]
    # backward: each group re-reads saved inputs and writes cotangents
    # of the same shapes; transposed SpMM operand passes included below
    bwd_planes = 2 * fwd_planes
    if remat == "full":
        # residual loads replaced by a recomputed forward; the stored-
        # residual round trip (write fwd + read bwd) collapses to the
        # recompute's reads/writes — net ~= fwd_planes saved
        bwd_planes = 2 * fwd_planes - fwd_planes // 2

    act = t * (fwd_planes + bwd_planes) * unit
    # aggregation: forward + transposed-backward applications per step
    # at each aggregation's own width; remat "full" re-runs the forward
    # applications during the recompute
    spmm_fwd = sum(spmm_bytes_per_apply(n, fw, itemsize)
                   for fw in agg_feats)
    spmm = t * (3 if remat == "full" else 2) * spmm_fwd
    # readout: Dense (B,N,U)->(B,N,T*D) fwd+bwd
    readout = (batch * n * (u + t * d) * itemsize) * 3
    # params + Adam state: |theta| ~ (Z*2U + Z*U + T*U) — negligible
    params = (z * 2 * u + z * u + u * t) * itemsize
    opt = params * 6    # grads + m + v read/write
    total = act + spmm + readout + opt
    return {
        "n": n, "batch": batch, "t": t, "u": u, "dtype_bytes": itemsize,
        "remat": remat,
        "activation_GB": round(act / 1e9, 3),
        "aggregation_GB": round(spmm / 1e9, 3),
        "readout_GB": round(readout / 1e9, 4),
        "params_opt_MB": round(opt / 1e6, 3),
        "total_GB": round(total / 1e9, 3),
        "floor_ms_at_819GBs": round(total / HBM_NOMINAL_GBS / 1e6, 2),
    }


def msdr_step_bytes(n: int, batch: int, t: int = 12, u: int = 64,
                    layers: int = 2, pre_k: int = 4, pre_v: int = 1,
                    itemsize: int = 4, remat: str = "none") -> dict:
    """MSDR seq2seq train step (`models/predictors/msdr.py`, reference
    `gmsdr_cell.py:109-140`): 2*t scanned steps (encoder + decoder)
    x `layers` cells. Per cell step, in B*N-plane units (Z = u*(1+pre_v)
    concat width, 3 support applications incl. the sparse-adaptive one,
    gconv as sum-of-dots over 4 diffusion outputs, pre_k attention
    reading the (K, N, U) carry twice):"""
    z = u * (1 + pre_v)
    unit = batch * n * itemsize
    fwd_planes = (
        (u + pre_v * u + z)          # pre_h gather + concat z
        + 3 * (z + z)                # 3 support applications in/out
        + (4 * z + u)                # gconv sum-of-dots + leaky_relu
        + (2 * pre_k * u + u)        # attention: carry read twice + att
        + (u + u)                    # output = conv@W + b + att
        + (pre_k * u + pre_k * u)    # hx_k shift-append (read + write)
    )
    bwd_planes = 2 * fwd_planes
    if remat == "full":
        bwd_planes = 2 * fwd_planes - fwd_planes // 2
    steps = 2 * t * layers
    act = steps * (fwd_planes + bwd_planes) * unit
    spmm = steps * 3 * 2 * spmm_bytes_per_apply(n, batch * z, itemsize)
    total = act + spmm
    return {
        "model": "MSDR", "n": n, "batch": batch,
        "dtype_bytes": itemsize, "remat": remat,
        "activation_GB": round(act / 1e9, 3),
        "aggregation_GB": round(spmm / 1e9, 3),
        "total_GB": round(total / 1e9, 3),
        "floor_ms_at_819GBs": round(total / HBM_NOMINAL_GBS / 1e6, 2),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="TGCN", choices=["TGCN", "MSDR"])
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--itemsize", type=int, default=4)
    p.add_argument("--remat", default="none")
    p.add_argument("--measured-ms", type=float, default=None)
    args = p.parse_args()
    fn = tgcn_step_bytes if args.model == "TGCN" else msdr_step_bytes
    m = fn(args.n, args.batch, itemsize=args.itemsize, remat=args.remat)
    if args.measured_ms:
        m["measured_ms"] = args.measured_ms
        m["achieved_fraction_819"] = round(
            m["floor_ms_at_819GBs"] / args.measured_ms, 3)
    print(json.dumps(m))


if __name__ == "__main__":
    main()
