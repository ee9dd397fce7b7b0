#!/usr/bin/env python
"""Trained-weights cross-framework parity for the canonical restorations
(DGCNN_cls / DGCNN_semseg — SURVEY.md §2 #35; VERDICT r4 next-step #6).

r4's tools/trained_net_parity.py closed the fusion Net's trained-weights
blind spot; this does the same for the canonical families whose torch
modules are ABSENT upstream (the fork's main_cls.py:25 imports a model.py
that doesn't exist).  The torch side is therefore our verification twin
(convert/torch_canonical.py): the published-checkpoint key layout with the
restoration's forward semantics written independently in torch.

Flow: load a TRAINED flax checkpoint (a CLI best-model .t7.msgpack, e.g.
from a tools/learn_check.py run) -> export_dgcnn_* to a torch state dict ->
strict-load into the twin -> compare eval logits on shared batches, exact
kernels + f32 (torch.topk tie order on both sides).  Gates on argmax
agreement.

  python tools/trained_canonical_parity.py --family cls \
      --ckpt outputs/learn_cls_default_s1/models/model.t7.msgpack
  python tools/trained_canonical_parity.py --family semseg \
      --ckpt .../model_6.t7.msgpack --num_points 512
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
    p.add_argument("--family", default="cls", choices=["cls", "semseg"])
    p.add_argument("--ckpt", required=True,
                   help="trained flax checkpoint ({'params','batch_stats'} "
                        ".t7.msgpack, the CLI best-model save)")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--emb_dims", type=int, default=1024)
    p.add_argument("--gate", type=float, default=0.995)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import torch

    from dgcnn_tpu.convert import export_dgcnn_cls, export_dgcnn_semseg
    from dgcnn_tpu.convert.torch_canonical import (
        DGCNNClsTorch,
        DGCNNSemSegTorch,
    )
    from dgcnn_tpu.models import DGCNNCls, DGCNNSemSeg
    from dgcnn_tpu.train.checkpoint import load_model
    from dgcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    variables = load_model(args.ckpt)

    rng = np.random.RandomState(args.seed)
    if args.family == "cls":
        model = DGCNNCls(emb_dims=args.emb_dims, k=args.k,
                         output_channels=40, dropout=0.0)
        twin = DGCNNClsTorch(emb_dims=args.emb_dims, k=args.k)
        sd = export_dgcnn_cls(variables)
        x = rng.randn(args.batch, args.num_points, 3).astype(np.float32)
    else:
        model = DGCNNSemSeg(emb_dims=args.emb_dims, k=args.k, dropout=0.0)
        twin = DGCNNSemSegTorch(emb_dims=args.emb_dims, k=args.k)
        sd = export_dgcnn_semseg(variables)
        x = rng.rand(args.batch, args.num_points, 9).astype(np.float32)

    twin.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    twin.eval()
    with torch.no_grad():
        want = twin(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    if args.family == "semseg":
        want = want.transpose(0, 2, 1)                    # (B, N, C)

    with jax.default_matmul_precision("float32"):
        got = np.asarray(jax.jit(
            lambda v, xx: model.apply(v, xx, train=False))(
                variables, jnp.asarray(x)))

    agree = float((got.argmax(-1) == want.argmax(-1)).mean())
    res = {
        "metric": f"trained canonical DGCNN_{args.family} parity "
                  f"(flax vs torch twin)",
        "ckpt": args.ckpt,
        "batch": args.batch,
        "num_points": args.num_points,
        "n_predictions": int(np.prod(got.argmax(-1).shape)),
        "argmax_agreement": round(agree, 6),
        "max_abs_logit_delta": round(float(np.abs(got - want).max()), 5),
        "mean_abs_logit_delta": round(float(np.abs(got - want).mean()), 6),
        "logit_scale": round(float(np.abs(want).mean()), 4),
        "gate": args.gate,
    }
    res["ok"] = agree >= args.gate
    print(json.dumps(res), flush=True)
    sys.exit(0 if res["ok"] else 1)


if __name__ == "__main__":
    main()
