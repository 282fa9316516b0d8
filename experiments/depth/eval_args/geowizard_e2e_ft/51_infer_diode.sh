#!/usr/bin/env bash
# Inference dump for diode with the geowizard_e2e_ft checkpoint (1-step, zeros noise, trailing).
set -e
python -m diffusion_e2e_ft_tpu.cli.infer \
  --checkpoint "${CHECKPOINT:-GonzaloMG/geowizard-e2e-ft}" \
  --model_type geowizard \
  --dataset_config config/dataset/data_diode_all.yaml \
  --base_data_dir "${BASE_DATA_DIR:-data}" \
  --output_dir output/depth/geowizard_e2e_ft/diode/prediction \
  --denoise_steps 1 --ensemble_size 1 --noise zeros --processing_res 0 \
  --seed 1234
