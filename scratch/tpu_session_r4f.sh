#!/bin/bash
# Round-4 session F. Order = risk-retire first, then value per minute:
# 1. decode shared-keys A/B (NEW Pallas grid is on the headline path — learn
#    early whether it compiles/wins; small compile, fast);
# 2. rvsa@512 remat B=8 (per-block remat landed; VERDICT item 6's missing row);
# 3. m2f 1024 budget runs; 4. internimage slab A/B; 5. 512 sweep rows;
# 6. fresh full bench headline LAST (uses whatever defaults survive).
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4logs
run() { # run <tag> <timeout> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag $(date +%H:%M:%S) ==="
  timeout "$to" "$@" > "/tmp/r4logs/$tag.log" 2>&1
  echo "--- rc=$? $tag $(date +%H:%M:%S)"
  grep -vE "^WARNING|^\[2m" "/tmp/r4logs/$tag.log" | tail -4
}
run ab_decode_shared   1800 python scratch/ab_decode_shared.py
run rvsa512_remat_b8   2400 python bench_train.py vit_b_rvsa upernet 8 512 remat
if ! grep -q '"value"' /tmp/r4logs/rvsa512_remat_b8.log; then
  run rvsa512_remat_b4 2400 python bench_train.py vit_b_rvsa upernet 4 512 remat
fi
run ii224_slab         1800 python bench_train.py internimage_t upernet 12 224
run ii224_dense        1800 env SAMRS_BILINEAR_SLAB=0 python bench_train.py internimage_t upernet 12 224
run m2f_b1_dense       2400 env SAMRS_BILINEAR_SLAB=0 python scratch/trace_m2f.py 1 1024 3
run m2f_b1_slab        2400 python scratch/trace_m2f.py 1 1024 3
run swin512            2400 python bench_train.py swin_t upernet 8 512
run vitb512            2400 python bench_train.py vit_b upernet 8 512 remat
run rvsa896_remat_b2   2400 python bench_train.py vit_b_rvsa upernet 2 896 remat
run rvsa512_fusedmlp   2400 python bench_train.py vit_b_rvsa upernet 8 512 remat fused_mlp
run trace_decode       1800 python scratch/trace_decode_fused.py
run bench_full         5400 python bench.py
echo "=== ALL DONE $(date +%H:%M:%S) ==="
