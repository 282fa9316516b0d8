#!/usr/bin/env bash
# Metric evaluation for eth3d (least-squares alignment, 10-metric set).
set -e
python -m diffusion_e2e_ft_tpu.cli.eval_depth \
  --dataset_config config/dataset/data_eth3d.yaml \
  --base_data_dir "${BASE_DATA_DIR:-data}" \
  --prediction_dir output/depth/geowizard_e2e_ft/eth3d/prediction \
  --output_dir output/depth/geowizard_e2e_ft/eth3d/eval_metric \
  --alignment least_square
