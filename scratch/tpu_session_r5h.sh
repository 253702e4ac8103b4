#!/bin/bash
# Round-5 session H: extended MSDA gather microbench (chunking + scatter-bwd isolation).
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5logs
run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag $(date +%H:%M:%S) ==="
  timeout "$to" "$@" > "/tmp/r5logs/$tag.log" 2>&1
  echo "--- rc=$? $tag $(date +%H:%M:%S)"
  grep -vE "^WARNING|^\[2m" "/tmp/r5logs/$tag.log" | tail -12
}
run ab_msda_gather2 1800 python scratch/ab_msda_gather.py
echo "=== ALL DONE $(date +%H:%M:%S) ==="
