"""End-to-end fine-tuning: jitted train step (UNet fwd -> x0 recovery -> frozen VAE
decode -> task loss), optax optimizer with the Marigold LR schedule, gradient
accumulation, GSPMD data parallelism, orbax checkpointing."""

from diffusion_e2e_ft_tpu.training.config import TrainConfig
from diffusion_e2e_ft_tpu.training.geowizard import GeoWizardTrainer
from diffusion_e2e_ft_tpu.training.lr import iter_exponential_schedule
from diffusion_e2e_ft_tpu.training.trainer import (
    E2ETrainer,
    TrainState,
)

__all__ = [
    "TrainConfig",
    "iter_exponential_schedule",
    "E2ETrainer",
    "GeoWizardTrainer",
    "TrainState",
]
