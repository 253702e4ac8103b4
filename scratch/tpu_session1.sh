#!/bin/bash
# Round-3 TPU session job 1: backend health check, then fused2 vs fused A/B.
set -x
python - <<'PY'
import time, jax, jax.numpy as jnp
t0=time.perf_counter()
x = jnp.ones((1024,1024), jnp.bfloat16)
y = (x @ x).sum()
print("health: backend", jax.default_backend(), "matmul", float(y), "in", round(time.perf_counter()-t0,1), "s", flush=True)
PY
rc=$?
if [ $rc -ne 0 ]; then echo "HEALTH CHECK FAILED rc=$rc"; exit $rc; fi
python scratch/ab_fused2.py
