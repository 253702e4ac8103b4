#!/bin/bash
# Round-5 session: serial TPU jobs, value per minute, front-loaded.
# 1. AMG with the fused post kernel (dbg_amg runs separately first);
# 2. vitb512 flash_attn A/B (baseline 11.48 img/s remat, r4f);
# 3. fleet tail-distribution run (VERDICT r4 item 4);
# 4. parity gate on TPU with the shipping fused defaults (VERDICT r4 item 7);
# 5. fresh full bench (new AMG + fleet_tail extras) LAST.
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5logs
run() { # run <tag> <timeout> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag $(date +%H:%M:%S) ==="
  timeout "$to" "$@" > "/tmp/r5logs/$tag.log" 2>&1
  echo "--- rc=$? $tag $(date +%H:%M:%S)"
  grep -vE "^WARNING|^\[2m" "/tmp/r5logs/$tag.log" | tail -4
}
run amg32_fused       2400 python bench.py --amg vit_b 32
run vitb512_flash     2400 python bench_train.py vit_b upernet 8 512 remat flash_attn
run fleet_tail        2400 python bench.py --fleet vit_b --tail
run parity_gate_tpu   2400 python -m samrs_tpu.tools.parity_gate --random-init --variant vit_b --out PARITY.json
run bench_full_r5     5400 python bench.py
echo "=== ALL DONE $(date +%H:%M:%S) ==="
