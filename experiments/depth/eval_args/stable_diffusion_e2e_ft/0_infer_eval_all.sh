#!/usr/bin/env bash
# Full 5-dataset depth benchmark for stable_diffusion_e2e_ft.
set -e
cd "$(dirname "$0")"
for s in $(ls [0-9]*_infer_*.sh | sort -n); do bash "$s"; done
for s in $(ls [0-9]*_eval_*.sh | sort -n); do bash "$s"; done
