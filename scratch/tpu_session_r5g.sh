#!/bin/bash
# Round-5 session G: MSDA gather microbench at level-0 shapes, m2f 896 A/B
# (fits HBM, unlike 1024 B=1x3 which sits at capacity), resnet512 row.
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5logs
run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag $(date +%H:%M:%S) ==="
  timeout "$to" "$@" > "/tmp/r5logs/$tag.log" 2>&1
  echo "--- rc=$? $tag $(date +%H:%M:%S)"
  grep -vE "^WARNING|^\[2m" "/tmp/r5logs/$tag.log" | tail -6
}
run ab_msda_gather  1500 python scratch/ab_msda_gather.py
run m2f_ghb_896     2400 env SAMRS_MSDA_IMPL=hybrid:112:ghb python scratch/trace_m2f.py 1 896 4
run m2f_dense_896   2400 env SAMRS_MSDA_IMPL=pallas python scratch/trace_m2f.py 1 896 4
run resnet512       2400 python bench_train.py resnet50 upernet 8 512
echo "=== ALL DONE $(date +%H:%M:%S) ==="
