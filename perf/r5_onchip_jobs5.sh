#!/bin/bash
# Round-5 on-chip queue, part 5: refresh the exact-reference-config numbers
# (576x768, the 4090's own benchmark resolution) at HEAD — the README table's
# 12.74 / 6.64 img/s rows are r2-era and the attention kernels changed since.
# Then re-measure the one artifact cell from the batch sweep (768/bs4, warm).
set -u
cd /root/repo
mkdir -p perf/logs

if [[ -f /tmp/r5_queue4.pid ]]; then
  w=$(cat /tmp/r5_queue4.pid)
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

run depth576   env E2EFT_RES=576x768 python bench.py
run geo576     env E2EFT_BENCH=geowizard E2EFT_RES=576x768 python bench.py
run batch768b4 python perf/batch_latency_sweep.py sweep

echo "=== ALL JOBS5 DONE ==="
