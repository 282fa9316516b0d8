"""Shared utilities: seeding, scalar logging, profiling, config records."""

from diffusion_e2e_ft_tpu.utils.seeding import seed_all
from diffusion_e2e_ft_tpu.utils.logging import ScalarLogger
from diffusion_e2e_ft_tpu.utils.profiling import StepTimer, trace

__all__ = ["seed_all", "ScalarLogger", "StepTimer", "trace"]
