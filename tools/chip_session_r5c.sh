#!/bin/bash
# Stage 3 of the round-5 chip session: waits for stage 2, then re-runs the
# items stage 1 lost (pa_pallas compile > 580 s; gen2 OOM at G=512, now 256;
# hbm/vpu microbenches that uploaded 0.5 GB through the tunnel per call,
# now in-jit) plus the full drift-fair placement-variant A/B (now printing
# incrementally so a timeout still leaves data).
set -u
LOG=${1:-/tmp/chip_r5.log}
P=$(cat /tmp/chip_r5b.pid 2>/dev/null || echo 0)
while [ "$P" != 0 ] && kill -0 "$P" 2>/dev/null; do sleep 30; done
cd /root/repo
run() {
  local t=$1; shift
  echo "### $* @ $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "### exit=$? @ $(date -u +%H:%M:%S)" >> "$LOG"
}
echo "=== stage 3 start $(date -u)" >> "$LOG"
run 580 python tools/microbench_chip.py hbm
run 580 python tools/microbench_chip.py vpu
run 580 python tools/microbench_chip.py sincos
run 2400 python -u tools/profile_placement_ab.py "pallas,pallas:bitprod,pallas:input,pallas:table:bfloat16,pallas:bitprod:bfloat16" 4
run 1200 python bench.py pa_pallas
run 900 python bench.py gen2
echo "=== stage 3 done $(date -u)" >> "$LOG"
