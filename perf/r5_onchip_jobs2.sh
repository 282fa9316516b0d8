#!/bin/bash
# Round-5 on-chip queue, part 2: train-step attack on the frozen-VAE decode
# sink (sub-pixel upsamplers cut decoder conv FLOPs 2.25x; fused gn_conv v2
# removes the GN stats boundary) — both exact-math levers with identical param
# trees, so they apply to training unchanged. One case per process (PERF.md).
set -u
cd /root/repo
mkdir -p perf/logs

run() {
  local name="$1"; shift
  echo "=== JOB $name: $* ==="
  local t0=$SECONDS
  timeout 2400 "$@" >"perf/logs/${name}.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc wall=$((SECONDS-t0))s tail:"; tail -4 "perf/logs/${name}.log"
}

run train_subpix        env E2EFT_BENCH=train E2EFT_TRAIN_SUBPIX=1 python bench.py
run train_fused_v2      env E2EFT_BENCH=train E2EFT_TRAIN_FUSED=1 E2EFT_GNCONV_IMPL=v2 python bench.py
run train_subpix_fused  env E2EFT_BENCH=train E2EFT_TRAIN_SUBPIX=1 E2EFT_TRAIN_FUSED=1 E2EFT_GNCONV_IMPL=v2 python bench.py

echo "=== ALL JOBS2 DONE ==="
