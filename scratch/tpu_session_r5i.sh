#!/bin/bash
# Round-5 session I: larger-RVSA finetune-shape rows (reference finetunes
# ViT-L-RVSA on iSAID@896, ED/Readme.md model zoo).
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5logs
run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag $(date +%H:%M:%S) ==="
  timeout "$to" "$@" > "/tmp/r5logs/$tag.log" 2>&1
  echo "--- rc=$? $tag $(date +%H:%M:%S)"
  grep -vE "^WARNING|^\[2m" "/tmp/r5logs/$tag.log" | tail -4
}
run rvsaL896        2400 python bench_train.py vit_l_rvsa upernet 2 896 remat
run rvsaL512        2400 python bench_train.py vit_l_rvsa upernet 4 512 remat
echo "=== ALL DONE $(date +%H:%M:%S) ==="
