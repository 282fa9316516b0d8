#!/bin/bash
# Round-5 on-chip queue, part 4: opportunistic extras after the priority jobs.
#   1. hp_sweep        — heads-per-program FA sweep at the GeoWizard d=40 shape
#                        (exp F; decides whether the opt-in MHP kernel promotes)
#   2. train_mu16_vaedc — train-step memory/remat variant (bf16 Adam mu +
#                        VAE-decode checkpoint), the last unswept train lever
# Waits for the part-3 queue (PID in /tmp/r5_queue.pid) to exit first.
set -u
cd /root/repo
mkdir -p perf/logs

if [[ -f /tmp/r5_queue.pid ]]; then
  w=$(cat /tmp/r5_queue.pid)
  while kill -0 "$w" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  echo "=== JOB $name: $* ==="
  local t0=$SECONDS
  timeout 2400 "$@" >"perf/logs/${name}.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc wall=$((SECONDS-t0))s tail:"; tail -4 "perf/logs/${name}.log"
}

run hp_sweep          python perf/hotops_sweep.py F
run train_mu16_vaedc  env E2EFT_BENCH=train E2EFT_TRAIN_MU=bfloat16 E2EFT_TRAIN_VAEDC=1 python bench.py

echo "=== ALL JOBS4 DONE ==="
