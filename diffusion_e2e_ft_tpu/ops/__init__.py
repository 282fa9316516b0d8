"""Pure-JAX core math: diffusion schedules, noise generators, task losses, image ops,
ensembling. Everything here is jit-friendly (static shapes, no host sync) unless the
docstring says otherwise (scipy-BFGS depth ensembling and pyramid-noise shape schedules
run on the host by design)."""

from diffusion_e2e_ft_tpu.ops import ensemble, image, losses, noise, scheduler

__all__ = ["scheduler", "noise", "losses", "image", "ensemble"]
