"""diffusion_e2e_ft_tpu — TPU-native single-step depth/normal estimation framework.

A from-scratch JAX / XLA / Pallas / pjit re-design of the capabilities of
VisualComputingInstitute/diffusion-e2e-ft (WACV 2025, "Fine-Tuning Image-Conditional
Diffusion Models is Easier than You Think"): end-to-end fine-tuned latent-diffusion
monocular depth and surface-normal estimators (Marigold, GeoWizard, raw SD2) that run
single-step and deterministic.

Layout:
  ops/        pure-JAX math: schedulers, noise, losses, image ops, ensembling
  kernels/    Pallas TPU kernels with XLA fallbacks
  models/     Flax model zoo: SD2 VAE, SD2 UNet (+GeoWizard variant), CLIP vision
  pipelines/  jitted inference pipelines (Marigold depth/normals, GeoWizard joint)
  parallel/   mesh construction and GSPMD sharding rules
  training/   end-to-end fine-tuning loop (optax, grad accum, orbax checkpoints)
  data/       Hypersim / VirtualKITTI2 training loaders, eval dataset readers
  evaluation/ depth (5-dataset) and normals (4-dataset) benchmark harnesses
  utils/      config system, seeding, logging, profiling
"""

__version__ = "0.1.0"
