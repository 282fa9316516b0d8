"""Command-line entry points (python -m diffusion_e2e_ft_tpu.cli.<name>):

  run_marigold   folder-of-images depth/normal inference      (ref: Marigold/run.py)
  run_geowizard  folder-of-images joint inference             (ref: GeoWizard/run_infer.py)
  infer          eval-dataset RGB-only inference dump         (ref: Marigold/infer.py)
  eval_depth     alignment + 10-metric depth evaluation       (ref: Marigold/eval.py)
  eval_normals   DSINE 4-dataset normals benchmark            (ref: DSINE/projects/dsine/test.py)
  train          E2E fine-tuning (marigold/sd x depth/normals, geowizard joint)
                                                              (ref: training/train.py,
                                                               GeoWizard/.../train_depth_normal.py)

All CLIs support `@file.txt` argument files (the DSINE convention) and dump their
resolved arguments next to their outputs.
"""
