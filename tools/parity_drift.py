#!/usr/bin/env python
"""Exact-vs-AMP eval accuracy-drift gate.

The throughput headline rides AMP approximations — bf16x3 3-pass distance
scores, packed-v2 / class-walk-v3 extraction, bf16 feature selection and
bf16 inter-stage activations (ops/pallas_knn.py) — whose neighbour
semantics differ slightly from the exact torch-parity path.  This tool
quantifies that drift at bench scale: the SAME batch and weights run
through the default AMP path and the exact path
(``DGCNN_TPU_PALLAS_EXACT=1``), each in its own subprocess (trace-time env
flags; see tools/_drift_child.py), and the report gates on prediction
agreement.

Drift semantics match the reference's own numerics: the reference TRAINS
under fp16 autocast (main_partseg_dist.py:221) and its f32 score form
(-2 x'x + |x|^2 + |x|^2', models/dgcnn.py:6-12) already carries ~2^-22
relative cancellation noise, the same error class the AMP path introduces.

Usage: python tools/parity_drift.py [--model cls|partseg|semseg|all]
       [--gate 0.995] [--batch 64] [--train]
Prints one JSON line per model; exits 1 if any agreement < gate.
``--train`` gates the TRAINING path instead: one fwd+grad per mode
(dropout 0), compared on loss and full-gradient cosine (>= gate).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(ROOT, "tools", "_drift_child.py")


def run_mode(model: str, out: str, exact: bool, batch: int,
             train: bool = False) -> None:
    env = dict(os.environ)
    if exact:
        env["DGCNN_TPU_PALLAS_EXACT"] = "1"
        env.pop("DGCNN_TPU_EXTRACT", None)
        # the exact side never prunes candidates — an inherited
        # DGCNN_TPU_FAST_EXTRACT (gating the banded fast path) applies to
        # the AMP side only
        env.pop("DGCNN_TPU_FAST_EXTRACT", None)
    else:
        env.pop("DGCNN_TPU_PALLAS_EXACT", None)
        if model == "semseg":
            # the semseg CLI's duplicate-safe pin (cli/semseg.py)
            env.setdefault("DGCNN_TPU_EXTRACT", "v2")
    cmd = [sys.executable, CHILD, model, out, f"--batch={batch}"]
    if train:
        cmd.append("--train")
    subprocess.run(cmd, env=env, check=True, cwd=ROOT)


def measure(model: str, batch: int) -> dict:
    with tempfile.TemporaryDirectory() as td:
        amp_path = os.path.join(td, "amp.npy")
        exact_path = os.path.join(td, "exact.npy")
        run_mode(model, amp_path, exact=False, batch=batch)
        run_mode(model, exact_path, exact=True, batch=batch)
        amp = np.load(amp_path)
        exact = np.load(exact_path)
    # cls logits are (B, 40); seg logits (B, N, C): argmax over the last axis
    pred_amp = amp.argmax(-1)
    pred_exact = exact.argmax(-1)
    agree = float((pred_amp == pred_exact).mean())
    return {
        "model": model,
        "argmax_agreement": round(agree, 6),
        "n_predictions": int(pred_amp.size),
        "max_abs_logit_delta": round(float(np.abs(amp - exact).max()), 5),
        "mean_abs_logit_delta": round(float(np.abs(amp - exact).mean()), 6),
        "logit_scale": round(float(np.abs(exact).mean()), 4),
    }


def measure_train(model: str, batch: int) -> dict:
    """TRAIN-path drift: same weights+batch through exact and AMP training
    kernels (dropout 0), compared on loss and full-gradient direction.
    The reference itself trains under fp16 autocast
    (main_partseg_dist.py:221), so AMP training numerics match its error
    class; this quantifies ours against the f32-exact path."""
    with tempfile.TemporaryDirectory() as td:
        amp_path = os.path.join(td, "amp.npz")
        exact_path = os.path.join(td, "exact.npz")
        run_mode(model, amp_path, exact=False, batch=batch, train=True)
        run_mode(model, exact_path, exact=True, batch=batch, train=True)
        amp = np.load(amp_path)
        exact = np.load(exact_path)
        ga, ge = amp["grad"].astype(np.float64), exact["grad"].astype(
            np.float64)
        la, le = float(amp["loss"]), float(exact["loss"])
    cos = float(np.dot(ga, ge) / (np.linalg.norm(ga) * np.linalg.norm(ge)))
    return {
        "model": model,
        "mode": "train",
        "loss_amp": round(la, 6),
        "loss_exact": round(le, 6),
        "loss_rel_delta": round(abs(la - le) / max(abs(le), 1e-12), 6),
        "grad_cosine": round(cos, 6),
        "grad_norm_ratio": round(
            float(np.linalg.norm(ga) / np.linalg.norm(ge)), 6),
        "n_grad_elems": int(ga.size),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="cls",
                   choices=["cls", "partseg", "semseg", "all"])
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--gate", type=float, default=0.995)
    p.add_argument("--train", action="store_true",
                   help="gate the TRAIN path (grad cosine >= gate) instead "
                        "of eval argmax agreement")
    args = p.parse_args()

    models = (["cls", "partseg", "semseg"] if args.model == "all"
              else [args.model])
    ok = True
    for m in models:
        if args.train:
            r = measure_train(m, args.batch)
            r["gate"] = args.gate
            r["pass"] = r["grad_cosine"] >= args.gate
        else:
            r = measure(m, args.batch)
            r["gate"] = args.gate
            r["pass"] = r["argmax_agreement"] >= args.gate
        ok = ok and r["pass"]
        print(json.dumps(r), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
