#!/usr/bin/env bash
# Full 4-dataset surface-normal benchmark for all three E2E-FT model families.
set -e
cd "$(dirname "$0")/../../.."
for args in experiments/normals/eval_args/*.txt; do
  python -m diffusion_e2e_ft_tpu.cli.eval_normals @"$args"
done
