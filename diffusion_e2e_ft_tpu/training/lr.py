"""Learning-rate schedule: linear warmup -> iteration-wise exponential decay to a
final ratio (Marigold's `IterExponential`,
`/root/reference/training/util/lr_scheduler.py:10-36`), as an optax schedule."""

from __future__ import annotations

import jax.numpy as jnp


def iter_exponential_schedule(
    base_lr: float,
    total_iter_length: int,
    final_ratio: float = 0.01,
    warmup_steps: int = 100,
):
    """Recomputed per step (no error accumulation): warmup ramps 0->1, then
    alpha = exp(progress * ln(final_ratio)), clamped at final_ratio."""
    effective = max(total_iter_length - warmup_steps, 1)
    log_final = jnp.log(final_ratio)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        progress = (step - warmup_steps) / effective
        decay = jnp.exp(progress * log_final)
        alpha = jnp.where(step < warmup_steps, warm, decay)
        alpha = jnp.where(step >= total_iter_length, final_ratio, alpha)
        return base_lr * alpha

    return schedule
