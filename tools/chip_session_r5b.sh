#!/bin/bash
# Stage 2 of the round-5 chip session: waits for stage 1 (chip_session_r5.sh)
# to exit, then re-runs the headline under the attributed flip bound, the
# xla/bf16 matrix variants, and the peak-settling matmul microbenches.
set -u
LOG=${1:-/tmp/chip_r5.log}
STAGE1_PID=$(cat /tmp/chip_r5.pid 2>/dev/null || echo 0)
while [ "$STAGE1_PID" != 0 ] && kill -0 "$STAGE1_PID" 2>/dev/null; do
  sleep 30
done
cd /root/repo
run() {
  local t=$1; shift
  echo "### $* @ $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "### exit=$? @ $(date -u +%H:%M:%S)" >> "$LOG"
}
echo "=== stage 2 start $(date -u)" >> "$LOG"
run 580 python bench.py
run 580 python bench.py xla
run 580 python bench.py bf16
run 580 python tools/microbench_chip.py f32i bf16i
run 580 python tools/microbench_chip.py irfft_f32 irfft_bf16
echo "=== stage 2 done $(date -u)" >> "$LOG"
