#!/bin/bash
# Round-5 on-chip queue, part 6: the train-step ≥5.5 img/s attack.
# Hypothesis chain (PERF.md r5): bs2 480x640 is NOT memory-bound at the
# save-nothing default, so a lighter remat policy should be a pure speed win
# (UNet recompute ~1.3/35 TFLOP/step ≈ 4%); bf16 Adam mu frees ~1.7 GB to make
# `dots` fit; sub-pixel decode (+1.9%, single obs) gets its repeat A/B.
# Same-window baseline first so every delta is contention-comparable.
set -u
cd /root/repo
mkdir -p perf/logs

run() {
  local name="$1"; shift
  echo "=== JOB $name: $* ==="
  local t0=$SECONDS
  timeout 2400 "$@" >"perf/logs/${name}.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc wall=$((SECONDS-t0))s tail:"; tail -3 "perf/logs/${name}.log"
}

run train_base2       env E2EFT_BENCH=train python bench.py
run train_dots        env E2EFT_BENCH=train E2EFT_TRAIN_REMAT=dots python bench.py
run train_mu16_dots   env E2EFT_BENCH=train E2EFT_TRAIN_MU=bfloat16 E2EFT_TRAIN_REMAT=dots python bench.py
run train_subpix2     env E2EFT_BENCH=train E2EFT_TRAIN_SUBPIX=1 python bench.py
run train_md_subpix   env E2EFT_BENCH=train E2EFT_TRAIN_MU=bfloat16 E2EFT_TRAIN_REMAT=dots E2EFT_TRAIN_SUBPIX=1 python bench.py

echo "=== ALL JOBS6 DONE ==="
