"""Enhancement-lift experiment (VERDICT r3 #1): prove that GPT-ST
pretraining IMPROVES a downstream predictor — the reference's reason to
exist (`readme.md:86-96`) — and that our framework reproduces the same
lift as the torch reference on identical data.

Protocol, run independently through BOTH frameworks:
  1. pretrain: GPT-ST masked pretraining (mask curriculum crosses
     `change_epoch` into the adaptive + KL regime, conf change_epoch=10)
  2. ori:  predictor alone on raw flow windows
     (`model/Model.py:121-128` — NO calendar features reach it)
  3. eval: frozen pretrained encoder + gated Fusion + predictor
     (`model/Model.py:106-117`)
  lift = (ori_mae - eval_mae) / ori_mae

Shared inputs (written to a sandbox both sides read):
  * `data/PEMS08/PEMS08.npz` — synthetic diurnal traffic
    (`gptst_tpu.data.synthetic`), reference npz layout
    (`lib/load_dataset.py:44-48` slices channel 0)
  * `data/PEMS08/PEMS08.csv` — "from,to,cost" edge list of one shared
    sensor graph (read by `lib/predifineGraph.py:6-62` on the torch
    side and `gptst_tpu.graph.io.read_edge_csv` on ours)
  * `conf/` — the reference's own conf tree with only num_nodes
    patched (all hyperparameters stay at shipped values)

The torch side replicates `model/Run.py` verbatim (args from the
reference's own parsers, `lib.dataloader.get_dataloader`, reference
models, reference `BasicTrainer`); the JAX side goes through the real
CLI (`gptst_tpu.run.main`). Neither side sees the other's predictions.

  python scripts/lift_experiment.py --out LIFT.json
  python scripts/lift_experiment.py --skip-ref   # JAX side only
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_sandbox(root: str, n: int, steps: int, data_seed: int,
                  avg_degree: int = 6, model: str = "STGCN") -> None:
    """Write the shared dataset + graph + patched conf tree. Idempotent
    per (root, n, steps, data_seed): when the sandbox already exists it
    is left untouched (so a jax-side run can share a sandbox with a
    torch-side run already in flight) apart from ensuring the selected
    predictor's conf is patched."""
    import dataclasses

    import numpy as np

    from gptst_tpu.config.datasets import get_dataset_spec
    from gptst_tpu.data.synthetic import synthesize_raw_series
    from gptst_tpu.graph.artifacts import random_sensor_graph

    def _patch_conf(rel):
        p = os.path.join(root, "conf", rel)
        with open(p) as f:
            txt = f.read()
        patched = txt.replace("num_nodes = 170", f"num_nodes = {n}")
        if patched != txt:
            with open(p, "w") as f:
                f.write(patched)

    ddir = os.path.join(root, "data", "PEMS08")
    if os.path.exists(os.path.join(ddir, "PEMS08.npz")):
        _patch_conf(f"{model}/PEMS08.conf")
        return

    spec = dataclasses.replace(get_dataset_spec("PEMS08"), num_nodes=n)
    series = synthesize_raw_series(spec, num_steps=steps, seed=data_seed)
    os.makedirs(ddir, exist_ok=True)
    np.savez_compressed(os.path.join(ddir, "PEMS08.npz"),
                        data=series.astype(np.float32))

    a = random_sensor_graph(n, avg_degree=avg_degree, seed=0)
    rows, cols = np.nonzero(a)
    with open(os.path.join(ddir, "PEMS08.csv"), "w") as f:
        f.write("from,to,cost\n")
        for i, j in zip(rows, cols):
            f.write(f"{i},{j},1.0\n")

    # conf tree: shipped values, only num_nodes patched to n
    cdir = os.path.join(root, "conf")
    if os.path.isdir(cdir):
        shutil.rmtree(cdir)
    shutil.copytree("/root/reference/conf", cdir)
    for rel in ("GPTST_pretrain/PEMS08.conf", f"{model}/PEMS08.conf"):
        _patch_conf(rel)
    os.makedirs(os.path.join(root, "run"), exist_ok=True)


# --------------------------------------------------------------------------
# JAX side: through the real CLI
# --------------------------------------------------------------------------

def run_jax_side(root: str, n: int, pre_epochs: int, epochs: int,
                 model: str = "STGCN", save_name: str = "jax_save",
                 skip_pretrain: bool = False) -> dict:
    from gptst_tpu import run as gt_run

    log_dir = os.path.join(root, save_name)
    os.makedirs(log_dir, exist_ok=True)

    def flags(mode, extra=()):
        return ["-dataset", "PEMS08", "-mode", mode, "-model", model,
                "-num_nodes", str(n), "-data_root",
                os.path.join(root, "data"), "-log_dir", log_dir,
                "-log_step", "100000", *extra]

    out = {}
    pre_mpath = os.path.join(log_dir, "metrics_pretrain.json")
    pretrain_best = None
    if not skip_pretrain:
        rc = gt_run.main(flags("pretrain", ["-epochs", str(pre_epochs),
                                            "-metrics_out", pre_mpath]))
        assert rc == 0, "jax pretrain failed"
        with open(pre_mpath) as f:
            pretrain_best = json.load(f).get("best_loss")
    elif os.path.exists(pre_mpath):
        with open(pre_mpath) as f:
            pretrain_best = json.load(f).get("best_loss")
    for mode in ("ori", "eval"):
        mpath = os.path.join(log_dir, f"metrics_{mode}.json")
        rc = gt_run.main(flags(mode, ["-epochs", str(epochs),
                                      "-metrics_out", mpath]))
        assert rc == 0, f"jax {mode} failed"
        with open(mpath) as f:
            out[mode] = json.load(f)["average"]
    return {
        "ori_mae": out["ori"][0], "eval_mae": out["eval"][0],
        "ori_rmse": out["ori"][1], "eval_rmse": out["eval"][1],
        "lift_pct": 100.0 * (out["ori"][0] - out["eval"][0])
        / out["ori"][0],
        "pretrain_best_loss": pretrain_best,
    }


def run_jax_transplant_eval(root: str, n: int, epochs: int,
                            model: str = "STGCN") -> dict:
    """Bisection arm (VERDICT r4 weak #1): run OUR eval mode with the
    TORCH-pretrained encoder transplanted in. Isolates encoder quality
    from the eval head/training path: if this arm's MAE matches the
    torch eval MAE, our eval path is fine and the deficit is pretrain
    quality; if it matches our own eval MAE instead, the encoder is
    interchangeable and the deficit is in the head/predictor training."""
    import numpy as np

    if not hasattr(np, "mat"):
        np.mat = np.asmatrix
    import jax
    import orbax.checkpoint as ocp
    import torch

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests"))
    from parity_utils import as_numpy_tree, transplant_gptst

    from gptst_tpu import run as gt_run
    from gptst_tpu.config.config import default_config
    from gptst_tpu.models.build import build_pretrain

    pth = os.path.join(root, "ref_save", "pretrain.pth")
    state = torch.load(pth, map_location="cpu")

    # instantiate the reference module as a weight container
    with _ref_env(root):
        orig_to = torch.Tensor.to

        def _to(self, *a, **kw):
            if a and isinstance(a[0], (str, torch.device)) \
                    and "cuda" in str(a[0]):
                return orig_to(self, "cpu")
            return orig_to(self, *a, **kw)

        torch.Tensor.to = _to
        try:
            from model.Pretrain_model.GPTST import GPTST_Model

            args, _ = _ref_args("pretrain", 1, 1,
                                os.path.join(root, "ref_save"))
            # set during data loading in the real flow (`Run.py:66-68`,
            # `lib/load_dataset.py:50-53`); irrelevant for a weight
            # container — stored on self but unused by state_dict
            args.scaler_zeros = 0.0
            args.scaler_zeros_day = 0.0
            args.scaler_zeros_week = 0.0
            args.interval = 5
            args.week_day = 7
            ref = GPTST_Model(args)
            ref.load_state_dict(state)
        finally:
            torch.Tensor.to = orig_to

    # our template tree (cfg must mirror the jax-side pretrain run)
    cfg = default_config("PEMS08", mode="pretrain", model=model).replace(
        num_nodes=n, data_root=os.path.join(root, "data"))
    init_fn, _ = build_pretrain(cfg, scaler_zeros=0.0)
    tree = as_numpy_tree(init_fn(jax.random.PRNGKey(0)))
    tree["params"] = transplant_gptst(dict(tree["params"]), ref)

    log_dir = os.path.join(root, "jax_save_T")
    ckpt = os.path.join(log_dir, "PEMS08", cfg.load_pretrain_path)
    os.makedirs(os.path.dirname(ckpt), exist_ok=True)
    if os.path.isdir(ckpt):
        shutil.rmtree(ckpt)
    ocp.PyTreeCheckpointer().save(os.path.abspath(ckpt), tree)

    mpath = os.path.join(log_dir, "metrics_evalT.json")
    rc = gt_run.main([
        "-dataset", "PEMS08", "-mode", "eval", "-model", model,
        "-num_nodes", str(n), "-data_root", os.path.join(root, "data"),
        "-log_dir", log_dir, "-log_step", "100000",
        "-epochs", str(epochs), "-metrics_out", mpath])
    assert rc == 0, "jax transplant eval failed"
    with open(mpath) as f:
        avg = json.load(f)["average"]
    return {"evalT_mae": avg[0], "evalT_rmse": avg[1]}


# --------------------------------------------------------------------------
# Torch reference side: model/Run.py replicated with controllable paths
# --------------------------------------------------------------------------

@contextlib.contextmanager
def _ref_env(root: str):
    """cwd=<root>/run so the reference's relative '../data' and
    '../conf' paths resolve inside the sandbox."""
    old = os.getcwd()
    os.chdir(os.path.join(root, "run"))
    for p in ("/root/reference", "/root/reference/model"):
        if p not in sys.path:
            sys.path.insert(0, p)
    try:
        yield
    finally:
        os.chdir(old)


def _ref_args(mode: str, pre_epochs: int, epochs: int, log_dir: str,
              model: str = "STGCN"):
    """Reference arg surface via the reference's own parsers
    (`model/Run.py:35-44` including the predictor-attr merge)."""
    import torch

    from lib.Params_pretrain import parse_args

    argv, sys.argv = sys.argv, ["Run.py", "-dataset", "PEMS08",
                                "-mode", mode, "-model", model]
    try:
        args = parse_args(torch.device("cpu"))
        args_predictor = None
        if mode != "pretrain":
            from lib.Params_predictor import get_predictor_params

            args_predictor = get_predictor_params(args)
            for attr in list(vars(args)):
                if hasattr(args_predictor, attr):
                    setattr(args, attr, getattr(args_predictor, attr))
    finally:
        sys.argv = argv
    args.device = torch.device("cpu")
    args.log_dir = log_dir
    args.epochs = pre_epochs if mode == "pretrain" else epochs
    args.save_pretrain_path = ("pretrain.pth" if mode == "pretrain"
                               else f"best_{mode}.pth")
    args.load_pretrain_path = "/pretrain.pth"  # log_dir + path concat
    args.debug = True  # debug-gated best-model save (BasicTrainer:188)
    args.log_step = 100000
    return args, args_predictor


def _ref_avg_metrics(model, args, loader, scaler):
    """`BasicTrainer.test` body (`model/BasicTrainer.py:210-248`),
    returning the average-horizon numbers instead of only logging."""
    import torch

    from lib.metrics import All_Metrics

    model.eval()
    y_pred, y_true = [], []
    with torch.no_grad():
        for data, target in loader:
            data = data[..., :args.input_base_dim + args.input_extra_dim]
            output, _, _, _, _ = model(data, label=None)
            y_true.append(target[..., :args.output_dim])
            y_pred.append(output)
    y_true = scaler.inverse_transform(torch.cat(y_true, dim=0))
    y_pred = scaler.inverse_transform(torch.cat(y_pred, dim=0))
    mae, rmse, mape, _, corr = All_Metrics(
        y_pred, y_true, args.mae_thresh, args.mape_thresh)
    return float(mae), float(rmse)


def _ref_one_mode(root: str, mode: str, pre_epochs: int, epochs: int,
                  model_name: str = "STGCN"):
    import numpy as np

    if not hasattr(np, "mat"):
        np.mat = np.asmatrix
    import torch
    import torch.nn as nn

    # route any stray .to('cuda') onto cpu (reference hardcodes cuda in
    # places); same shim as the parity suites
    orig_to = torch.Tensor.to

    def _to(self, *a, **kw):
        if a and isinstance(a[0], (str, torch.device)) \
                and "cuda" in str(a[0]):
            return orig_to(self, "cpu")
        return orig_to(self, *a, **kw)

    torch.Tensor.to = _to
    try:
        from lib.dataloader import get_dataloader
        from lib.metrics import MAE_torch
        from lib.TrainInits import init_seed
        from model.BasicTrainer import Trainer
        from model.Model import Enhance_model as Network_Predict
        from model.Pretrain_model.GPTST import GPTST_Model as \
            Network_Pretrain

        log_dir = os.path.join(root, "ref_save")
        os.makedirs(log_dir, exist_ok=True)
        args, args_predictor = _ref_args(mode, pre_epochs, epochs, log_dir,
                                         model=model_name)
        init_seed(args.seed, args.seed_mode)

        (train_loader, val_loader, test_loader, scaler_data, scaler_day,
         scaler_week, _) = get_dataloader(
            args, normalizer=args.normalizer, tod=args.tod, dow=False,
            weather=False, single=False)
        args.scaler_zeros = scaler_data.transform(0)
        args.scaler_zeros_day = scaler_day.transform(0)
        args.scaler_zeros_week = scaler_week.transform(0)

        if mode == "pretrain":
            model = Network_Pretrain(args)
        else:
            model = Network_Predict(args, args_predictor)
        if args.xavier:
            for p in model.parameters():
                if p.requires_grad:
                    if p.dim() > 1:
                        nn.init.xavier_uniform_(p)
                    else:
                        nn.init.uniform_(p)

        def scaler_mae_loss(scaler, mask_value):
            def loss(preds, labels, mask=None):
                preds = scaler.inverse_transform(preds)
                labels = scaler.inverse_transform(labels)
                if args.mode == "pretrain" and mask is not None:
                    preds = preds * mask
                    labels = labels * mask
                return MAE_torch(pred=preds, true=labels,
                                 mask_value=mask_value)
            return loss

        loss = scaler_mae_loss(scaler_data, mask_value=args.mape_thresh)
        loss_kl = nn.KLDivLoss(reduction="sum")
        optimizer = torch.optim.Adam(model.parameters(), lr=args.lr_init,
                                     eps=1e-8, weight_decay=0,
                                     amsgrad=False)
        lr_scheduler = None
        if args.lr_decay:
            steps = [int(i) for i in args.lr_decay_step.split(",")]
            lr_scheduler = torch.optim.lr_scheduler.MultiStepLR(
                optimizer, milestones=steps, gamma=args.lr_decay_rate)

        trainer = Trainer(model, loss, loss_kl, optimizer, train_loader,
                          val_loader, test_loader, scaler_data, args,
                          lr_scheduler=lr_scheduler)

        # capture the trainer's "best loss:" line (BasicTrainer.py:183)
        # for the pretrain-quality control (VERDICT r4 weak #1a)
        import logging
        import re

        best_losses = []

        class _Capture(logging.Handler):
            def emit(self, record):
                m = re.search(r"best loss: ([0-9.eE+-]+)",
                              record.getMessage())
                if m:
                    best_losses.append(float(m.group(1)))

        cap = _Capture()
        trainer.logger.addHandler(cap)
        try:
            trainer.train()
        finally:
            trainer.logger.removeHandler(cap)

        if mode == "pretrain":
            return best_losses[-1] if best_losses else None
        # best state was saved to best_path (debug=True); score it
        model.load_state_dict(torch.load(trainer.best_path))
        mae, rmse = _ref_avg_metrics(model, args, test_loader, scaler_data)
        return mae, rmse
    finally:
        torch.Tensor.to = orig_to


def run_ref_side(root: str, pre_epochs: int, epochs: int,
                 model: str = "STGCN",
                 skip_pretrain: bool = False) -> dict:
    """skip_pretrain reuses an existing <root>/ref_save/pretrain.pth —
    sound across predictor families because the reference's pretrain
    phase is predictor-independent (`Run.py:35-43` merges predictor
    args only when mode != 'pretrain')."""
    with _ref_env(root):
        pretrain_best = None
        if not skip_pretrain:
            pretrain_best = _ref_one_mode(root, "pretrain", pre_epochs,
                                          epochs, model_name=model)
        ori_mae, ori_rmse = _ref_one_mode(root, "ori", pre_epochs, epochs,
                                          model_name=model)
        eval_mae, eval_rmse = _ref_one_mode(root, "eval", pre_epochs,
                                            epochs, model_name=model)
    return {
        "ori_mae": ori_mae, "eval_mae": eval_mae,
        "ori_rmse": ori_rmse, "eval_rmse": eval_rmse,
        "lift_pct": 100.0 * (ori_mae - eval_mae) / ori_mae,
        "pretrain_best_loss": pretrain_best,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=48)
    p.add_argument("--steps", type=int, default=5760,
                   help="series length (5760 = 20 days at 5-min)")
    p.add_argument("--pre-epochs", type=int, default=20)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--data-seed", type=int, default=0)
    p.add_argument("--model", default="STGCN",
                   help="predictor family (STGCN or TGCN; the lift "
                        "claim quantifies over `model/Model.py:55-93`)")
    p.add_argument("--workdir", default=None,
                   help="sandbox dir (default: a fresh tempdir)")
    p.add_argument("--skip-ref", action="store_true")
    p.add_argument("--skip-jax", action="store_true")
    p.add_argument("--skip-ref-pretrain", action="store_true",
                   help="reuse <workdir>/ref_save/pretrain.pth (the "
                        "pretrain phase is predictor-independent)")
    p.add_argument("--skip-jax-pretrain", action="store_true",
                   help="reuse <workdir>/jax_save's pretrain checkpoint")
    p.add_argument("--transplant", action="store_true",
                   help="extra bisection arm: our eval run with the "
                        "torch-pretrained encoder (needs the ref side's "
                        "pretrain.pth in <workdir>/ref_save)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    root = args.workdir or tempfile.mkdtemp(prefix="lift_")
    os.makedirs(root, exist_ok=True)
    build_sandbox(root, args.n, args.steps, args.data_seed,
                  model=args.model)

    result = {"n": args.n, "steps": args.steps,
              "pre_epochs": args.pre_epochs, "epochs": args.epochs,
              "data_seed": args.data_seed, "model": args.model,
              "workdir": root}
    if not args.skip_jax:
        result["jax"] = run_jax_side(
            root, args.n, args.pre_epochs, args.epochs, model=args.model,
            skip_pretrain=args.skip_jax_pretrain)
        print(json.dumps({"jax": result["jax"]}))
    if not args.skip_ref:
        result["ref"] = run_ref_side(root, args.pre_epochs, args.epochs,
                                     model=args.model,
                                     skip_pretrain=args.skip_ref_pretrain)
        print(json.dumps({"ref": result["ref"]}))
    if args.transplant:
        result["jax_transplant"] = run_jax_transplant_eval(
            root, args.n, args.epochs, model=args.model)
        print(json.dumps({"jax_transplant": result["jax_transplant"]}))

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
