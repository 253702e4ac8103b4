#!/bin/bash
# Finetune-resolution training benchmarks (VERDICT r3 item 6): 512 px
# (and one 896 iSAID-shape point) for the main backbone families, plus the
# fused-MLP A/B at the map size where it was predicted to pay.
# Reference budgets: PF/Readme.md:73-83 (finetune at 512/896), and
# ED/main_finetune.py:166-229.
set -x
cd "$(dirname "$0")/.."
for args in \
  "vit_b_rvsa upernet 8 512" \
  "vit_b_rvsa upernet 8 512 fused_mlp" \
  "swin_t upernet 8 512" \
  "internimage_t upernet 8 512" \
  "vit_b upernet 8 512" \
  "vit_b_rvsa upernet 2 896" \
  ; do
  timeout 2400 python bench_train.py $args 2>&1 | grep -vE "^\[2m|WARN" | tail -2
done
