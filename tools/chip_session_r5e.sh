#!/bin/bash
# Stage 5: after stage 4 — validate the new placement_phase="input"
# default on-chip (full conformance: vector pin + cross-impl exact), and
# try the untested input+bf16 combination.
set -u
LOG=${1:-/tmp/chip_r5.log}
P=$(cat /tmp/chip_r5d.pid 2>/dev/null || echo 0)
while [ "$P" != 0 ] && kill -0 "$P" 2>/dev/null; do sleep 30; done
cd /root/repo
run() {
  local t=$1; shift
  echo "### $* @ $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "### exit=$? @ $(date -u +%H:%M:%S)" >> "$LOG"
}
echo "=== stage 5 start $(date -u)" >> "$LOG"
run 1800 python bench.py
run 1800 python -u tools/profile_placement_ab.py "pallas:input,pallas:input:bfloat16" 4
echo "=== stage 5 done $(date -u)" >> "$LOG"
