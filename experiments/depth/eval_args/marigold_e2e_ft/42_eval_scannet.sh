#!/usr/bin/env bash
# Metric evaluation for scannet (least-squares alignment, 10-metric set).
set -e
python -m diffusion_e2e_ft_tpu.cli.eval_depth \
  --dataset_config config/dataset/data_scannet_val.yaml \
  --base_data_dir "${BASE_DATA_DIR:-data}" \
  --prediction_dir output/depth/marigold_e2e_ft/scannet/prediction \
  --output_dir output/depth/marigold_e2e_ft/scannet/eval_metric \
  --alignment least_square
