#!/bin/bash
# Round-4 session D (follow-up to r4c):
# 0. slab-kernel TPU compile smoke + micro A/B (scratch/ab_slab.py);
# 1. m2f step-time A/B: dense (SAMRS_BILINEAR_SLAB=0) vs auto-slab, on top
#    of the remat-policy + batched-Hungarian changes (baseline 6061 ms/step
#    at B=2x3 @1024 before all three);
# 2. rvsa@512 remat rerun with FULL traceback (r4c's tail -2 ate it);
# 3. internimage_t 224 bench_train A/B for the DCNv3 slab path;
# 4. fresh encode + decode profiler traces at the current defaults.
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4logs
echo "=== slab micro A/B $(date) ==="
timeout 2400 python scratch/ab_slab.py > /tmp/r4logs/ab_slab.log 2>&1
grep -E "^==|max \|" /tmp/r4logs/ab_slab.log || tail -20 /tmp/r4logs/ab_slab.log
echo "=== m2f step B=2 dense slab=0 (post remat+hungarian) $(date) ==="
SAMRS_BILINEAR_SLAB=0 timeout 2400 python scratch/trace_m2f.py 2 1024 3 \
  > /tmp/r4logs/m2f_dense.log 2>&1
tail -4 /tmp/r4logs/m2f_dense.log | grep -vE "^\[2m"
echo "=== m2f step B=2 auto-slab $(date) ==="
timeout 2400 python scratch/trace_m2f.py 2 1024 3 > /tmp/r4logs/m2f_slab.log 2>&1
tail -4 /tmp/r4logs/m2f_slab.log | grep -vE "^\[2m"
echo "=== m2f step B=1 auto-slab (VERDICT <2.5s target) $(date) ==="
timeout 2400 python scratch/trace_m2f.py 1 1024 3 > /tmp/r4logs/m2f_b1.log 2>&1
tail -4 /tmp/r4logs/m2f_b1.log | grep -vE "^\[2m"
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
echo "=== internimage_t 224 dense vs slab $(date) ==="
SAMRS_BILINEAR_SLAB=0 timeout 2400 python bench_train.py internimage_t upernet 12 224 \
  > /tmp/r4logs/ii_dense.log 2>&1
tail -2 /tmp/r4logs/ii_dense.log | grep -vE "^\[2m"
timeout 2400 python bench_train.py internimage_t upernet 12 224 \
  > /tmp/r4logs/ii_slab.log 2>&1
tail -2 /tmp/r4logs/ii_slab.log | grep -vE "^\[2m"
echo "=== encode trace $(date) ==="
timeout 2400 python scratch/trace_encode.py > /tmp/r4logs/trace_enc_r4d.log 2>&1
tail -4 /tmp/r4logs/trace_enc_r4d.log | grep -vE "^\[2m"
echo "=== decode trace $(date) ==="
timeout 1800 python scratch/trace_decode_fused.py > /tmp/r4logs/trace_dec_r4d.log 2>&1
tail -4 /tmp/r4logs/trace_dec_r4d.log | grep -vE "^\[2m"
echo "=== done $(date) ==="
