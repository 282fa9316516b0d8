#!/usr/bin/env bash
# Metric evaluation for kitti (least-squares alignment, 10-metric set).
set -e
python -m diffusion_e2e_ft_tpu.cli.eval_depth \
  --dataset_config config/dataset/data_kitti_eigen_test.yaml \
  --base_data_dir "${BASE_DATA_DIR:-data}" \
  --prediction_dir output/depth/marigold_e2e_ft/kitti_eigen_test/prediction \
  --output_dir output/depth/marigold_e2e_ft/kitti_eigen_test/eval_metric \
  --alignment least_square
