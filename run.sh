#!/usr/bin/env bash
# Fork-trainer launch (reference run.sh) — TPU-native: one process sees all
# local chips; no torchrun / MASTER_ADDR rendezvous needed.  The fork's
# hyperparameters are preserved (batch 24, emb 512, ff 512, k 32, heads 2,
# blocks 2, d_qkv 64).
set -e
python main_partseg_dist.py \
  --exp_name=fusion_transformer \
  --batch_size=24 --test_batch_size=24 \
  --emb_dim=512 --ff_dims=512 --k=32 \
  --n_heads=2 --n_blocks=2 --d_qkv=64 "$@"
