#!/bin/bash
# Round-5 session F: chunked-ghb m2f retry #2 (8 MB gather chunks).
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5logs
run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag $(date +%H:%M:%S) ==="
  timeout "$to" "$@" > "/tmp/r5logs/$tag.log" 2>&1
  echo "--- rc=$? $tag $(date +%H:%M:%S)"
  grep -vE "^WARNING|^\[2m" "/tmp/r5logs/$tag.log" | tail -4
}
run m2f_ghb_retry2  2400 env SAMRS_MSDA_IMPL=hybrid:128:ghb python scratch/trace_m2f.py 1 1024 4
echo "=== ALL DONE $(date +%H:%M:%S) ==="
