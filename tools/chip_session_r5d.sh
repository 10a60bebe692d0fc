#!/bin/bash
# Stage 4 of the round-5 chip session. The tunnel entered another
# compile-wedge window (~10:45 UTC): CACHED programs still run but every
# FRESH compile hangs, so the recovery probe must bake a unique constant
# into the jitted function (new cache key -> real compile) each attempt.
# Once compiles work again: the remaining microbenches, the drift-fair
# placement-variant A/B, pa_pallas, gen2, and the packed-executor
# fullscale rerun.
set -u
LOG=${1:-/tmp/chip_r5.log}
cd /root/repo

probe_fresh() {
  timeout 180 python - <<EOF >/dev/null 2>&1
import time, jax, numpy as np, jax.numpy as jnp
salt = np.float32($RANDOM.0 + time.time() % 997)
f = jax.jit(lambda x: (x * 2 + salt).sum().astype(jnp.int32))
f(np.ones((257, 129), np.float32))
EOF
}

echo "=== stage 4 start $(date -u)" >> "$LOG"
until probe_fresh; do
  echo "compile-wedged $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 300
done
echo "=== fresh compiles work $(date -u)" >> "$LOG"

run() {
  local t=$1; shift
  echo "### $* @ $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "### exit=$? @ $(date -u +%H:%M:%S)" >> "$LOG"
}
run 580 python tools/microbench_chip.py hbm
run 580 python tools/microbench_chip.py vpu
run 580 python tools/microbench_chip.py sincos
run 3000 python -u tools/profile_placement_ab.py "pallas,pallas:bitprod,pallas:input,pallas:table:bfloat16,pallas:bitprod:bfloat16" 4
run 1200 python bench.py pa_pallas
run 900 python bench.py gen2
run 1800 python tools/run_fullscale_chip.py
echo "=== stage 4 done $(date -u)" >> "$LOG"
