#!/bin/bash
# Round-4 session C: (1) fresh full bench with the new defaults
# (global_attn_impl='m', twoway_impl='fused') to confirm the headline;
# (2) finetune-resolution training sweep (VERDICT r3 item 6) with the
# rvsa@512 B=8 OOM fixed via remat (16.02G vs 15.75G HBM without it).
set -x
cd "$(dirname "$0")/.."
timeout 5400 python bench.py 2>&1 | grep -vE "^WARNING|^\[2m" | tail -3
for args in \
  "vit_b_rvsa upernet 8 512 remat" \
  "vit_b_rvsa upernet 8 512 remat fused_mlp" \
  "swin_t upernet 8 512" \
  "internimage_t upernet 8 512" \
  "vit_b upernet 8 512" \
  "vit_b_rvsa upernet 2 896 remat" \
  ; do
  timeout 2400 python bench_train.py $args 2>&1 | grep -vE "^WARNING|^\[2m" | tail -2
done
echo SWEEP_DONE
