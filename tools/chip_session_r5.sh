#!/bin/bash
# Round-5 single-session chip measurement matrix (VERDICT r4 items 1-5).
#
# Waits for the axon tunnel to recover (multi-hour wedge windows are a
# known failure mode: fresh compiles hang; only waiting helps), then runs
# every published benchmark + the microbench + the placement A/B + the
# full-scale campaign back-to-back in ONE session so the numbers are
# drift-comparable. Appends to the log; every item is timeout-bounded and
# failures do not stop the matrix.
#
#   nohup bash tools/chip_session_r5.sh /tmp/chip_r5.log &
set -u
LOG=${1:-/tmp/chip_r5.log}
cd /root/repo

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
f = jax.jit(lambda x: (x * 2).sum().astype(jnp.int32))
assert int(f(np.ones((256, 256), np.float32))) == 131072
EOF
}

echo "=== chip session r5 start $(date -u)" >> "$LOG"
until probe; do
  echo "tunnel wedged $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 240
done
echo "=== tunnel up $(date -u)" >> "$LOG"

run() {
  local t=$1; shift
  echo "### $* @ $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "### exit=$? @ $(date -u +%H:%M:%S)" >> "$LOG"
}

# 1. the published bench matrix (VERDICT item 2; conformance pins assert
#    per-group decisions on-device)
run 580 python bench.py
run 580 python bench.py pa
run 580 python bench.py pa_pallas
run 580 python bench.py raytrace
run 900 python bench.py gen2
# 2. roofline constants for THIS chip (VERDICT item 4; f32/bf16 matmul
#    already measured 2026-08-20: 39.7 / 156.7 TFLOP/s)
run 580 python tools/microbench_chip.py hbm
run 580 python tools/microbench_chip.py vpu
run 580 python tools/microbench_chip.py sincos
# 3. v3 epilogue variants + DFT dtype, drift-fair in-session (item 1)
run 900 python -u tools/profile_placement_ab.py "pallas,pallas:bitprod,pallas:input,pallas:table:bfloat16" 4
# 4. end-to-end production campaign wall-clock + host/device split (item 3)
run 1800 python tools/run_fullscale_chip.py
echo "=== chip session r5 done $(date -u)" >> "$LOG"
