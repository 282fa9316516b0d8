#!/bin/bash
# Round-5 on-chip measurement queue (single v5e chip => strictly serialized).
# Each job is its own process (PERF.md: in-process case accumulation flips OOM
# verdicts). Logs land in perf/logs/ for PERF.md citation.
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

# 1. In-pipeline gn_conv v2 A/B (VERDICT #2). Baseline 10.638 img/s measured.
run fused_v2       env E2EFT_BENCH_FUSED=1 E2EFT_GNCONV_IMPL=v2 python bench.py
# cmax=256 variant: fuse only image-resolution 128/256ch layers (r4 trace: the
# 512ch low-res layers are where XLA conv layout wars bite)
run fused_v2_c256  env E2EFT_BENCH_FUSED=1 E2EFT_GNCONV_IMPL=v2 E2EFT_GNCONV_CMAX=256 python bench.py

# 1b. Sub-pixel decoder upsamplers (exact math, 2.25x fewer conv FLOPs)
run subpix         env E2EFT_BENCH_SUBPIX=1 python bench.py
run subpix_v2      env E2EFT_BENCH_SUBPIX=1 E2EFT_BENCH_FUSED=1 E2EFT_GNCONV_IMPL=v2 python bench.py

# 2. Train-step sweep (VERDICT #3; r4: 422.6 ms/step = 4.73 img/s at bs2 480x640)
run train_base     env E2EFT_BENCH=train python bench.py
run train_mu16     env E2EFT_BENCH=train E2EFT_TRAIN_MU=bfloat16 python bench.py
run train_mu16_dots env E2EFT_BENCH=train E2EFT_TRAIN_MU=bfloat16 E2EFT_TRAIN_REMAT=dots python bench.py
run train_mu16_vaedc env E2EFT_BENCH=train E2EFT_TRAIN_MU=bfloat16 E2EFT_TRAIN_VAEDC=1 python bench.py

# 3. GeoWizard joint with the new d=40 (1024,1024) picker (VERDICT #4; r4: 4.77)
run geo_joint      env E2EFT_BENCH=geowizard python bench.py
# fused VAE applies to both of GeoWizard's decodes (depth+normal) too
run geo_joint_fused env E2EFT_BENCH=geowizard E2EFT_BENCH_FUSED=1 E2EFT_GNCONV_IMPL=v2 python bench.py

# 4. Measured find_batch_size table (VERDICT #5)
run batch_sweep    python perf/batch_latency_sweep.py sweep

# 5. Heads-per-program sweep at the joint d=40 shape (VERDICT #4 next move)
run hp_sweep       python perf/hotops_sweep.py F

echo "=== ALL JOBS DONE ==="
