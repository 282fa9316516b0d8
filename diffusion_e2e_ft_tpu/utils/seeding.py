"""Global seeding across python / numpy / JAX (the reference seeds python, numpy and
torch+CUDA — `/root/reference/Marigold/run.py:44-51`; JAX keys are explicit, so this
returns the root key alongside seeding the host RNGs)."""

from __future__ import annotations

import random

import numpy as np


def seed_all(seed: int):
    """Seed host RNGs and return the root jax PRNG key for device randomness."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
    return jax.random.key(seed)
