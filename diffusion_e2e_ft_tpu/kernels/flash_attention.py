"""Pallas TPU flash attention (placeholder dispatch target).

The real fused kernel lands here; until then this module provides the same API on top
of the XLA path so the Pallas backend selection is exercised end to end on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax

Array = jax.Array


def flash_attention(q: Array, k: Array, v: Array, *, scale: Optional[float] = None) -> Array:
    from diffusion_e2e_ft_tpu.kernels.attention import _xla_attention

    return _xla_attention(q, k, v, scale)
