#!/usr/bin/env python
"""Trained-weights fusion-Net cross-framework parity, HOG branch LIVE.

Round-3 finding (VERDICT weak #6): the r3 forward-parity tests pass with the
HOG branch stubbed, because an UNTRAINED Net is nearly insensitive to it —
which says nothing about trained weights.  This tool closes that blind spot
with a checkpoint TRAINED here (tools/learn_check.py partseg run):

  1. exports the trained flax weights to a torch state dict
     (convert/torch_export.py), strict-loads them into the ACTUAL reference
     ``models.model_partseg.Net`` (/root/reference, CPU-patched: its
     hardcoded ``.cuda()`` calls are defeated the same way
     tests/test_convert_roundtrip.py does);
  2. compares logits on shared test batches in three regimes:
       * stub      — one shared HOG tensor on both sides (isolates every
                     non-HOG component: backbone, grads_emb, pos_mlp,
                     transformer, attention, head);
       * live      — both frameworks compute HOG for real (ours with
                     ``hog_bug_compat=True`` so both sides evaluate the
                     reference's exact — bugged — gather semantics,
                     ops/hog.py module docstring); residual drift is the
                     documented LAPACK-vs-closed-form eigenvector sign
                     ambiguity (tests/test_ops_hog.py);
       * and measures the TRAINED net's HOG sensitivity: output movement
         under a unit-gaussian HOG perturbation (the r3 number 5.5e-4 was
         untrained-weights-only).
  3. gates on per-point argmax agreement in the live regime.

Run on CPU (torch reference is CPU-only here):
  python tools/trained_net_parity.py --ckpt outputs/<exp>/models/transformer_<e>.checkpoint
"""
from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# trace-time env: exact kernels + CPU platform, set before jax imports
os.environ["DGCNN_TPU_PALLAS_EXACT"] = "1"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="our transformer_<epoch>.checkpoint (msgpack)")
    p.add_argument("--data", default="/tmp/dgcnn_structured_data")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--num_points", type=int, default=2048)
    p.add_argument("--gate", type=float, default=0.995)
    # run.sh fusion-Net hyperparameters
    p.add_argument("--emb_dim", type=int, default=512)
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--n_heads", type=int, default=2)
    p.add_argument("--n_blocks", type=int, default=2)
    p.add_argument("--ff_dims", type=int, default=512)
    p.add_argument("--d_qkv", type=int, default=64)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import torch

    from dgcnn_tpu.convert import export_net
    from dgcnn_tpu.models import Net
    from dgcnn_tpu.train.checkpoint import load_train_variables
    from dgcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # --- shared test batch from the structured fixtures -------------------
    os.environ["DGCNN_TPU_DATA"] = args.data
    os.environ["DGCNN_TPU_NO_DOWNLOAD"] = "1"
    from dgcnn_tpu.data import ShapeNetPart

    ds = ShapeNetPart(args.num_points, "test")
    x = np.stack([ds[i][0] for i in range(args.batch)])       # (B, N, 3)
    lbl = np.eye(16, dtype=np.float32)[
        np.asarray([int(np.ravel(ds[i][1])[0]) for i in range(args.batch)])]

    variables = load_train_variables(args.ckpt)

    def ours(hog_bug_compat: bool, hog_override=None):
        model = Net(emb_dim=args.emb_dim, k=args.k, n_heads=args.n_heads,
                    n_blocks=args.n_blocks, ff_dims=args.ff_dims,
                    d_qkv=args.d_qkv, nclasses=50, dropout=0.0,
                    hog_bug_compat=hog_bug_compat)
        import dgcnn_tpu.models.model_partseg as mp

        orig = mp.compute_hog
        if hog_override is not None:
            mp.compute_hog = lambda *a, **kw: jnp.asarray(hog_override)
        try:
            with jax.default_matmul_precision("float32"):
                out = model.apply(variables, jnp.asarray(x),
                                  jnp.asarray(lbl), train=False)
        finally:
            mp.compute_hog = orig
        return np.asarray(out)                                # (B, N, 50)

    # --- reference side (CPU-patched) --------------------------------------
    sd = export_net(variables, n_blocks=args.n_blocks)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    orig_cuda, orig_zeros = torch.Tensor.cuda, torch.zeros
    torch.Tensor.cuda = lambda self, *a, **kw: self

    def zeros_cpu(*a, **kw):
        dev = kw.get("device")
        if dev is not None and torch.device(dev).type == "cuda":
            kw["device"] = "cpu"
        return orig_zeros(*a, **kw)

    torch.zeros = zeros_cpu
    try:
        import models.model_partseg as ref_mp

        class _A:
            pass

        a = _A()
        a.emb_dim, a.k, a.n_heads, a.n_blocks = (
            args.emb_dim, args.k, args.n_heads, args.n_blocks)
        a.ff_dims, a.dropout, a.nclasses = args.ff_dims, 0.0, 50
        ref = ref_mp.Net(a)
        ref.load_state_dict(
            {kk: torch.from_numpy(np.ascontiguousarray(vv))
             for kk, vv in sd.items()}, strict=True)
        ref.eval()
        xt = torch.from_numpy(x.transpose(0, 2, 1))           # (B, 3, N)
        lt = torch.from_numpy(lbl)

        with torch.no_grad():
            ref_hog = ref_mp.compute_hog_1x1(xt, k=args.k).numpy()
            want_live = ref(xt, lt).numpy().transpose(0, 2, 1)

        hog_stub = np.random.RandomState(0).rand(
            args.batch, args.num_points, 18).astype(np.float32)
        orig_ref_hog = ref_mp.compute_hog_1x1
        ref_mp.compute_hog_1x1 = lambda *aa, **kw: torch.from_numpy(hog_stub)
        try:
            with torch.no_grad():
                want_stub = ref(xt, lt).numpy().transpose(0, 2, 1)
        finally:
            ref_mp.compute_hog_1x1 = orig_ref_hog
    finally:
        torch.Tensor.cuda, torch.zeros = orig_cuda, orig_zeros

    # --- ours, all regimes --------------------------------------------------
    got_stub = ours(False, hog_override=hog_stub)
    got_live = ours(True)             # bug-compat: same function as reference
    from dgcnn_tpu.ops.hog import compute_hog

    our_hog = np.asarray(compute_hog(jnp.asarray(x), args.k,
                                     bug_compat=True))

    # trained-weights HOG sensitivity (weak #6's number, now trained)
    pert = np.random.RandomState(1).randn(*hog_stub.shape).astype(np.float32)
    got_pert = ours(False, hog_override=hog_stub + pert)
    sens = float(np.abs(got_pert - got_stub).mean())

    def cmp(a, b):
        scale = float(np.abs(b).max())
        return {
            "max_abs_delta": round(float(np.abs(a - b).max()), 5),
            "mean_abs_delta": round(float(np.abs(a - b).mean()), 6),
            "logit_scale": round(scale, 3),
            "argmax_agreement": round(
                float((a.argmax(-1) == b.argmax(-1)).mean()), 6),
        }

    hog_row_diff = np.abs(our_hog - ref_hog).max(-1)          # (B, N)
    res = {
        "metric": "trained fusion-Net cross-framework parity",
        "ckpt": args.ckpt,
        "batch": args.batch,
        "stub": cmp(got_stub, want_stub),
        "live": cmp(got_live, want_live),
        "hog_feature_max_diff": round(float(hog_row_diff.max()), 5),
        "hog_rows_matching_1e3": round(
            float((hog_row_diff < 1e-3).mean()), 6),
        "trained_hog_sensitivity_mean_dlogit": round(sens, 6),
        "gate": args.gate,
    }
    res["ok"] = (res["live"]["argmax_agreement"] >= args.gate
                 and res["stub"]["argmax_agreement"] >= args.gate)
    print(json.dumps(res), flush=True)
    sys.exit(0 if res["ok"] else 1)


if __name__ == "__main__":
    main()
