#!/usr/bin/env python
"""One-command real-data accuracy acceptance (the reference's own gate).

The reference README publishes the numbers its pretrained checkpoints must
reproduce (reference README.md:80-88 ModelNet40, :141-147 ShapeNetPart,
:279-285 S3DIS).  Zero egress blocks downloading the datasets/checkpoints in
this environment, so this tool is the *guaranteed-runnable* bridge: point it
at a real data directory and a published checkpoint the day they exist and
it converts, evals, and prints a pass/fail verdict against the README table
— one command per family, no other steps.

    python tools/real_data_parity.py --family cls \
        --data_root /data --ckpt pretrained/model.cls.1024.t7
    python tools/real_data_parity.py --family cls2048 --ckpt model.cls.2048.t7
    python tools/real_data_parity.py --family partseg --ckpt model.partseg.t7
    python tools/real_data_parity.py --family semseg --ckpt pretrained/semseg/

Each family shells out to the README-exact eval CLI (the CLIs convert torch
.t7 checkpoints on the fly, cli/{cls,partseg,semseg}.py), parses the metric
summary line, and gates |measured - expected| <= --tol per published metric.
Prints one JSON line per family; exits 1 if any gate fails.

Plumbing is e2e-tested today on the synthetic fixtures
(tests/test_cli_e2e.py::test_real_data_parity_plumbing): a briefly-trained
checkpoint runs through the full convert->eval->parse->verdict path with a
loose tolerance, so the tool cannot rot while waiting for real data.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# README-exact eval invocations + the published numbers they must reproduce.
# ``ckpt_flag`` is how the family's CLI takes its checkpoint (semseg loads
# model_1..model_6 from a directory).
CONFIGS = {
    "cls": {
        "entry": "main_cls.py",
        "extra": ["--num_points=1024", "--k=20"],
        "ckpt_flag": "--model_path",
        "pattern": r"Test :: test acc: ([0-9.]+), test avg acc: ([0-9.]+)",
        "keys": ("overall_acc", "avg_class_acc"),
        "expect": {"overall_acc": 0.933, "avg_class_acc": 0.909},
        "readme": "reference README.md:86 (ModelNet40, 1024 pts)",
    },
    "cls2048": {
        "entry": "main_cls.py",
        "extra": ["--num_points=2048", "--k=40"],
        "ckpt_flag": "--model_path",
        "pattern": r"Test :: test acc: ([0-9.]+), test avg acc: ([0-9.]+)",
        "keys": ("overall_acc", "avg_class_acc"),
        "expect": {"overall_acc": 0.936, "avg_class_acc": 0.912},
        "readme": "reference README.md:88 (ModelNet40, 2048 pts)",
    },
    "partseg": {
        # README.md:130 evals with the parser defaults (2048 pts)
        "entry": "main_partseg.py",
        "extra": [],
        "ckpt_flag": "--model_path",
        "pattern": r"Test: test acc: ([0-9.]+), test avg acc: ([0-9.]+), "
                   r"test iou: ([0-9.]+)",
        "keys": ("overall_acc", "avg_class_acc", "miou"),
        "expect": {"miou": 0.852},
        "readme": "reference README.md:147 (ShapeNetPart mean IoU)",
    },
    "semseg": {
        # README.md:275: 6-fold eval over pretrained/semseg/model_<area>
        "entry": "main_semseg.py",
        "extra": ["--test_area=all"],
        "ckpt_flag": "--model_root",
        "pattern": r"Overall Test :: test acc: ([0-9.]+), "
                   r"test avg acc: ([0-9.]+), test iou: ([0-9.]+)",
        "keys": ("overall_acc", "avg_class_acc", "miou"),
        "expect": {"overall_acc": 0.850, "miou": 0.592},
        "readme": "reference README.md:285 (S3DIS 6-fold)",
    },
}


def run_family(family: str, data_root: str, ckpt: str, tol: float,
               batch: int, extra: list[str], platform: str = "") -> dict:
    cfg = CONFIGS[family]
    env = dict(os.environ)
    if data_root:
        env["DGCNN_TPU_DATA"] = os.path.abspath(data_root)
    env["DGCNN_TPU_NO_DOWNLOAD"] = "1"
    if platform:
        # the axon plugin ignores JAX_PLATFORMS; dgcnn_tpu/__init__.py
        # honours this via jax.config (used by the CPU-suite e2e test)
        env["DGCNN_TPU_JAX_PLATFORM"] = platform
    argv = [sys.executable, os.path.join(ROOT, cfg["entry"]),
            f"--exp_name=real_parity_{family}", "--eval=True",
            f"--test_batch_size={batch}",
            cfg["ckpt_flag"] + "=" + os.path.abspath(ckpt)]
    argv += cfg["extra"] + extra
    proc = subprocess.run(argv, env=env, capture_output=True, text=True)
    out = {"family": family, "readme": cfg["readme"], "tol": tol,
           "argv": " ".join(argv[1:])}
    matches = re.findall(cfg["pattern"], proc.stdout)
    if proc.returncode != 0 or not matches:
        out["pass"] = False
        out["error"] = (proc.stdout + proc.stderr)[-800:]
        return out
    measured = dict(zip(cfg["keys"], map(float, matches[-1])))
    out["measured"] = measured
    out["expected"] = cfg["expect"]
    out["pass"] = all(abs(measured[k] - v) <= tol
                      for k, v in cfg["expect"].items())
    return out


def main() -> None:
    p = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        epilog="extra args after -- are passed through to the eval CLI")
    p.add_argument("--family", default="cls",
                   choices=sorted(CONFIGS) + ["all"])
    p.add_argument("--data_root", default="",
                   help="dataset directory (exported as DGCNN_TPU_DATA for "
                        "the eval child); default: the loaders' normal "
                        "resolution (env / repo data/)")
    p.add_argument("--ckpt", required=True,
                   help="checkpoint: a torch .t7 / .t7.msgpack file, or for "
                        "semseg the directory holding model_1..model_6")
    p.add_argument("--tol", type=float, default=0.005,
                   help="per-metric absolute tolerance vs the README value "
                        "(default 0.005 = half an accuracy point)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--platform", default="",
                   help="pin the eval child's jax backend (e.g. cpu); "
                        "default: the host's backend (the TPU chip)")
    args, extra = p.parse_known_args()
    if extra and extra[0] == "--":
        extra = extra[1:]

    fams = sorted(CONFIGS) if args.family == "all" else [args.family]
    ok = True
    for fam in fams:
        r = run_family(fam, args.data_root, args.ckpt, args.tol,
                       args.batch, extra, args.platform)
        ok = ok and r["pass"]
        print(json.dumps(r), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
