#!/bin/bash
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5logs
run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag $(date +%H:%M:%S) ==="
  timeout "$to" "$@" > "/tmp/r5logs/$tag.log" 2>&1
  echo "--- rc=$? $tag $(date +%H:%M:%S)"
  grep -vE "^WARNING|^\[2m" "/tmp/r5logs/$tag.log" | tail -4
}
run rvsaL896b1      2400 python bench_train.py vit_l_rvsa upernet 1 896 remat
echo "=== ALL DONE $(date +%H:%M:%S) ==="
