#!/bin/bash
# Round-4 session D (follow-up to r4c):
# 1. rvsa@512 remat rerun with FULL traceback (r4c's tail -2 ate it), B=8
#    then B=4 fallback;
# 2. m2f step-time A/B for the MSDA remat-policy + batched-Hungarian
#    changes (baseline measured today: 6061 ms/step at B=2x3 @1024);
# 3. fresh encode + decode profiler traces at the current defaults.
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4logs
echo "=== rvsa512 remat B=8 $(date) ==="
timeout 2400 python bench_train.py vit_b_rvsa upernet 8 512 remat \
  > /tmp/r4logs/rvsa512_remat_b8.log 2>&1
tail -25 /tmp/r4logs/rvsa512_remat_b8.log | grep -vE "^\[2m"
if ! grep -q '"value"' /tmp/r4logs/rvsa512_remat_b8.log; then
  echo "=== rvsa512 remat B=4 fallback $(date) ==="
  timeout 2400 python bench_train.py vit_b_rvsa upernet 4 512 remat \
    > /tmp/r4logs/rvsa512_remat_b4.log 2>&1
  tail -6 /tmp/r4logs/rvsa512_remat_b4.log | grep -vE "^\[2m"
fi
echo "=== m2f step B=2 (baseline today: 6061 ms) $(date) ==="
timeout 2400 python scratch/trace_m2f.py 2 1024 3 > /tmp/r4logs/m2f_after.log 2>&1
tail -4 /tmp/r4logs/m2f_after.log | grep -vE "^\[2m"
echo "=== m2f step B=1 (VERDICT <2.5s target) $(date) ==="
timeout 2400 python scratch/trace_m2f.py 1 1024 3 > /tmp/r4logs/m2f_b1.log 2>&1
tail -4 /tmp/r4logs/m2f_b1.log | grep -vE "^\[2m"
echo "=== encode trace $(date) ==="
timeout 2400 python scratch/trace_encode.py > /tmp/r4logs/trace_enc_r4d.log 2>&1
tail -4 /tmp/r4logs/trace_enc_r4d.log | grep -vE "^\[2m"
echo "=== decode trace $(date) ==="
timeout 1800 python scratch/trace_decode_fused.py > /tmp/r4logs/trace_dec_r4d.log 2>&1
tail -4 /tmp/r4logs/trace_dec_r4d.log | grep -vE "^\[2m"
echo "=== done $(date) ==="
