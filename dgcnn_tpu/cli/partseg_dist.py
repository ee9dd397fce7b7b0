"""Distributed part-segmentation trainer — the TPU-native replacement for the
reference's DDP engine (main_partseg_dist.py, SURVEY.md §3.1).

Where the reference needs torchrun + NCCL rendezvous + DistributedSampler +
SyncBatchNorm + GradScaler (run.sh:6, main_partseg_dist.py:151-221), this
trainer is ONE process per host: the train step is jitted with the global
batch sharded over the device mesh, which makes XLA insert the gradient
all-reduce and compute BatchNorm statistics over the full global batch
(SyncBatchNorm semantics) over ICI.  Loss meters come back replicated — the
reference's explicit ``dist.all_reduce`` of its meters (:291, :343) has no
analogue because nothing is per-rank.  bf16 matmuls replace AMP fp16 (no
GradScaler: accumulation stays f32).

Multi-host: set the jax.distributed coordinator env vars and every host runs
this same script (dgcnn_tpu.parallel.distributed_init).
"""
from __future__ import annotations

import numpy as np

from dgcnn_tpu.cli import partseg
from dgcnn_tpu.cli.common import fast_extract_pin, init_output_dir
from dgcnn_tpu.parallel import distributed_init
from dgcnn_tpu.utils import IOStream, enable_compilation_cache


def build_parser():
    # same surface as the single-process CLI with the dist defaults
    # (reference main_partseg_dist.py:536-541: n_heads 4, batch 24,
    # AdamW path, OneCycle per batch; k defaults to 20 in BOTH reference
    # parsers — run.sh passes --k 32 explicitly)
    return partseg.build_parser(dist=True)


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.dataset = "shapenetpart_aug"  # the DDP trainer's dataset (:160-161)
    enable_compilation_cache()
    distributed_init()
    init_output_dir(args.exp_name, __file__)
    io = IOStream("outputs/" + args.exp_name + "/run.log")
    io.cprint(str(args))
    np.random.seed(args.seed)
    # same opt-in banded eval wiring as cli/partseg.py's main
    with fast_extract_pin(args.fast_extract, args.num_points):
        if args.eval:
            partseg.test(args, io)
        else:
            partseg.train(args, io)


if __name__ == "__main__":
    main()
