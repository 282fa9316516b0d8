"""Inference pipelines: Marigold (depth / normals) and GeoWizard (joint depth+normal).

Each pipeline compiles its whole device path — VAE encode -> K-step denoise ->
VAE decode -> task postprocessing — into a single jitted graph per configuration;
host code only does image I/O, final resize/colorize, and (for ensemble_size > 1)
the scipy-BFGS depth ensembling.
"""

from diffusion_e2e_ft_tpu.pipelines.marigold import MarigoldPipeline, MarigoldOutput
from diffusion_e2e_ft_tpu.pipelines.geowizard import GeoWizardPipeline, GeoWizardOutput

__all__ = ["MarigoldPipeline", "MarigoldOutput", "GeoWizardPipeline", "GeoWizardOutput"]
