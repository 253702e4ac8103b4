#!/bin/bash
# Round-5 session E (after r5d's m2f dense baseline + enc trace):
# anchored parity gate, chunked-ghb m2f retry, remaining 512/896 sweep rows.
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5logs
run() { # run <tag> <timeout> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag $(date +%H:%M:%S) ==="
  timeout "$to" "$@" > "/tmp/r5logs/$tag.log" 2>&1
  echo "--- rc=$? $tag $(date +%H:%M:%S)"
  grep -vE "^WARNING|^\[2m" "/tmp/r5logs/$tag.log" | tail -4
}
run parity_selfab3  2400 python -m samrs_tpu.tools.parity_gate --random-init --variant vit_b --self-ab --out PARITY.json
run m2f_ghb_retry2  2400 env SAMRS_MSDA_IMPL=hybrid:128:ghb python scratch/trace_m2f.py 1 1024 4
run ii512           2400 python bench_train.py internimage_t upernet 8 512
run vitae512        2400 python bench_train.py vitaev2_s upernet 8 512
run adapter512      2400 python bench_train.py vit_adapter_b upernet 4 512
run swin896         2400 python bench_train.py swin_t upernet 2 896
echo "=== ALL DONE $(date +%H:%M:%S) ==="
