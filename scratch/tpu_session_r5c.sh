#!/bin/bash
# Round-5 session C (resumes after the 12:04 session cut): serial TPU jobs.
# 1. fresh full bench with the amg16-first extras ordering (driver path);
# 2. parity gate with --self-ab (shipping-kernel parity, VERDICT r4 item 7);
# 3. session-B finetune-shape sweep (remaining 512/896 backbone rows).
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5logs
run() { # run <tag> <timeout> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag $(date +%H:%M:%S) ==="
  timeout "$to" "$@" > "/tmp/r5logs/$tag.log" 2>&1
  echo "--- rc=$? $tag $(date +%H:%M:%S)"
  grep -vE "^WARNING|^\[2m" "/tmp/r5logs/$tag.log" | tail -4
}
run bench_full_r5c  3100 python bench.py
run parity_selfab   2400 python -m samrs_tpu.tools.parity_gate --random-init --variant vit_b --self-ab --out PARITY.json
run rvsa512_flash   2400 python bench_train.py vit_b_rvsa upernet 8 512 remat flash_attn
run ii512           2400 python bench_train.py internimage_t upernet 8 512
run vitae512        2400 python bench_train.py vitaev2_s upernet 8 512
run adapter512      2400 python bench_train.py vit_adapter_b upernet 4 512
run swin896         2400 python bench_train.py swin_t upernet 2 896
echo "=== ALL DONE $(date +%H:%M:%S) ==="
