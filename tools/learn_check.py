#!/usr/bin/env python
"""On-chip generalization gate: do the benched TRAIN paths actually LEARN?

Trains all three model families at full size on STRUCTURED synthetic data
(dgcnn_tpu.data.synthetic.make_all_structured — labels are functions of
geometry, so held-out accuracy far above chance is achievable) through the
shipped CLIs, and gates held-out test accuracy.  This is the strongest
on-box proxy for the environment-blocked real-data gates (reference
README.md:86 cls 93.3% overall acc, :146 partseg 85.2 mIoU, :285 semseg
59.2 mIoU — zero egress here; see the verify skill's "Real-data accuracy
gate" for the one-command real run).

Families and the benched paths they exercise:
  * cls     — full-size DGCNNCls (emb 1024, k 20, N 1024) via main_cls.py
              --device_pipeline=True: the fully device-resident train loop
              (one lax.scan epoch), AMP train kernels, rbg dropout stream.
  * partseg — the fork's fusion Net at the run.sh config (emb 512, k 32,
              heads 2, blocks 2) via main_partseg_dist.py: fused dropout
              attention (ops/pallas_attention.py), rbg stream, AdamW +
              OneCycle — the exact machinery the partseg TRAIN bench rides.
  * semseg  — full-size DGCNNSemSeg (emb 1024, k 20, N 4096) via
              main_semseg.py --test_area=6 (held-out area).

Usage:
  python tools/learn_check.py [--family cls|partseg|semseg|all]
      [--gate 0.9] [--data DIR] [--workdir DIR] [--rng rbg|threefry]
      [--epochs_scale 1.0]

Prints one JSON line per family with best/final held-out accuracy (and IoU
for the seg families); exits nonzero if any best test accuracy < gate.
``--rng threefry`` forces the threefry dropout stream (DGCNN_TPU_RNG) for
the rbg-vs-threefry training-equivalence comparison (VERDICT r3 #6).
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# epochs chosen so each run finishes in single-digit minutes on one v5e
# chip at the r3 train rates (cls resident 1679 clouds/s, fusion Net 92,
# semseg ~100) while converging well past the 0.9 gate.
CONFIGS = {
    "cls": dict(
        script="main_cls.py",
        argv=["--exp_name={exp}", "--epochs={epochs}", "--batch_size=32",
              "--test_batch_size=64", "--num_points=1024", "--k=20",
              "--emb_dims=1024", "--device_pipeline=True"],
        epochs=60,
    ),
    "partseg": dict(
        script="main_partseg_dist.py",
        argv=["--exp_name={exp}", "--epochs={epochs}", "--batch_size=24",
              "--test_batch_size=24", "--emb_dim=512", "--ff_dims=512",
              "--k=32", "--n_heads=2", "--n_blocks=2", "--d_qkv=64",
              "--num_points=2048", "--device_pipeline=True"],
        epochs=20,
    ),
    "semseg": dict(
        script="main_semseg.py",
        argv=["--exp_name={exp}", "--epochs={epochs}", "--batch_size=16",
              "--test_batch_size=16", "--num_points=4096", "--k=20",
              "--emb_dims=1024", "--test_area=6"],
        epochs=10,
    ),
}

TEST_RE = re.compile(
    r"Test (\d+), loss: ([\d.nan-]+), test acc: ([\d.]+), "
    r"test avg acc: ([\d.]+)(?:, test iou: ([\d.nan-]+))?")


def ensure_data(data_dir: str) -> None:
    sys.path.insert(0, ROOT)
    from dgcnn_tpu.data import synthetic

    ver = os.path.join(data_dir, "STRUCTURED_VERSION")
    if os.path.exists(ver):
        with open(ver) as f:
            if f.read().strip() == str(synthetic.STRUCTURED_VERSION):
                return
    synthetic.make_all_structured(data_dir)


def run_family(family: str, data_dir: str, workdir: str, gate: float,
               rng_impl: str, epochs_scale: float, seed: int) -> dict:
    cfg = CONFIGS[family]
    epochs = max(1, int(round(cfg["epochs"] * epochs_scale)))
    exp = f"learn_{family}_{rng_impl}_s{seed}"
    argv = [a.format(exp=exp, epochs=epochs) for a in cfg["argv"]]
    argv += [f"--seed={seed}"]
    env = dict(os.environ)
    env["DGCNN_TPU_DATA"] = data_dir
    env["DGCNN_TPU_NO_DOWNLOAD"] = "1"
    if rng_impl != "default":
        env["DGCNN_TPU_RNG"] = rng_impl
    os.makedirs(workdir, exist_ok=True)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, cfg["script"])] + argv,
        env=env, cwd=workdir, capture_output=True, text=True)
    wall = time.time() - t0
    out = proc.stdout + proc.stderr
    rows = TEST_RE.findall(out)
    if proc.returncode != 0 or not rows:
        return {
            "family": family, "ok": False, "error": "run failed",
            "returncode": proc.returncode, "tail": out[-2000:],
        }
    accs = [float(r[2]) for r in rows]
    ious = [float(r[4]) for r in rows if r[4]]
    best_i = int(max(range(len(accs)), key=accs.__getitem__))
    chance = {"cls": 1 / 40, "partseg": 1 / 50, "semseg": 1 / 13}[family]
    res = {
        "family": family,
        "rng": rng_impl,
        "seed": seed,
        "epochs": epochs,
        "best_test_acc": accs[best_i],
        "final_test_acc": accs[-1],
        "chance": round(chance, 4),
        "gate": gate,
        "wall_s": round(wall, 1),
        "ok": accs[best_i] >= gate,
    }
    if ious:
        res["best_test_iou"] = max(ious)
        res["final_test_iou"] = ious[-1]
    return res


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="all",
                   choices=["cls", "partseg", "semseg", "all"])
    p.add_argument("--gate", type=float, default=0.9)
    p.add_argument("--data", default="/tmp/dgcnn_structured_data")
    p.add_argument("--workdir", default="/tmp/dgcnn_learn_check")
    p.add_argument("--rng", default="default",
                   choices=["default", "rbg", "threefry"])
    p.add_argument("--epochs_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    ensure_data(args.data)
    families = (["cls", "partseg", "semseg"] if args.family == "all"
                else [args.family])
    ok = True
    for fam in families:
        r = run_family(fam, args.data, args.workdir, args.gate, args.rng,
                       args.epochs_scale, args.seed)
        ok = ok and r.get("ok", False)
        print(json.dumps(r), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
