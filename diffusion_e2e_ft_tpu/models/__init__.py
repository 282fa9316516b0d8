"""Flax model zoo: SD2 AutoencoderKL (VAE), SD2 UNet2DCondition (+ GeoWizard variant
with switcher class-embedding and joint cross-task attention), CLIP vision encoder.

All modules are NHWC (TPU-native conv layout), parameterized so the published HF
checkpoints (`GonzaloMG/*`, `prs-eth/marigold-*`, `lemonaddie/geowizard`) convert
losslessly via `models.convert`.
"""

from diffusion_e2e_ft_tpu.models.unet import UNetConfig, UNet2DCondition
from diffusion_e2e_ft_tpu.models.vae import VAEConfig, AutoencoderKL

__all__ = ["UNetConfig", "UNet2DCondition", "VAEConfig", "AutoencoderKL"]
