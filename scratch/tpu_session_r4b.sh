#!/bin/bash
# r4 session B: encode-variant A/B (m / tail), decode A/B v2, then the 512px
# training sweep with full per-config logs (the first sweep's tail -2 ate the
# vit_b_rvsa@512 traceback).
cd "$(dirname "$0")/.."
echo "=== ab_r4b encode variants $(date) ==="
timeout 7200 python scratch/ab_r4b.py
echo "=== ab_twoway v2 $(date) ==="
timeout 2400 python scratch/ab_twoway.py
echo "=== train512 sweep $(date) ==="
mkdir -p /tmp/r4logs/train512
for args in \
  "vit_b_rvsa upernet 8 512" \
  "vit_b_rvsa upernet 8 512 fused_mlp" \
  "swin_t upernet 8 512" \
  "internimage_t upernet 8 512" \
  "vit_b upernet 8 512" \
  "vit_b_rvsa upernet 2 896" \
  ; do
  name=$(echo $args | tr ' ' '_')
  echo "--- $args $(date) ---"
  timeout 2400 python bench_train.py $args > /tmp/r4logs/train512/$name.log 2>&1
  tail -3 /tmp/r4logs/train512/$name.log | grep -vE "^\[2m|WARN"
done
echo "=== done $(date) ==="
