"""Task-space losses: scale-and-shift-invariant depth L1 and angular normal loss.

Capability parity: `/root/reference/training/util/loss.py:13-67` (SSI closed-form 2x2
solve with det>0 positive-definiteness guard, fp32 island; angular acos-of-dot). The
reference's boolean-mask indexing (`tensor[mask]`) is dynamic-shape; here every masked
statistic is a static-shape where-sum (sum(x*m)/sum(m)), which is the jit/TPU-friendly
equivalent with identical values.

Conventions (NHWC):
  depth prediction/target: [B, H, W]    mask: [B, H, W] bool
  normal prediction/target: [B, H, W, 3] mask: [B, H, W] bool
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def compute_scale_and_shift(
    prediction: Array, target: Array, mask: Array
) -> Tuple[Array, Array]:
    """Closed-form least-squares (scale, shift) aligning prediction to target per image.

    Solves the masked normal equations of min ||s*p + t - y||^2 with a hand-inlined
    2x2 inverse; returns (0, 0) for images whose system is not positive definite
    (det <= 0), matching the reference's guard.
    """
    p = prediction.astype(jnp.float32)
    y = target.astype(jnp.float32)
    m = mask.astype(jnp.float32)

    a00 = jnp.sum(m * p * p, axis=(1, 2))
    a01 = jnp.sum(m * p, axis=(1, 2))
    a11 = jnp.sum(m, axis=(1, 2))
    b0 = jnp.sum(m * p * y, axis=(1, 2))
    b1 = jnp.sum(m * y, axis=(1, 2))

    det = a00 * a11 - a01 * a01
    valid = det > 0
    safe_det = jnp.where(valid, det, 1.0)
    scale = jnp.where(valid, (a11 * b0 - a01 * b1) / safe_det, 0.0)
    shift = jnp.where(valid, (-a01 * b0 + a00 * b1) / safe_det, 0.0)
    return scale, shift


def ssi_loss(prediction: Array, target: Array, mask: Array) -> Array:
    """Scale-and-shift-invariant L1 depth loss, mean over all valid pixels in the batch.

    fp32 regardless of input dtype (the reference computes this loss in an
    autocast-disabled fp32 island).
    """
    if prediction.ndim == 4:
        prediction = prediction.squeeze(-1)
    if target.ndim == 4:
        target = target.squeeze(-1)
    if mask.ndim == 4:
        mask = mask.squeeze(-1)
    p = prediction.astype(jnp.float32)
    y = target.astype(jnp.float32)
    m = mask.astype(jnp.float32)

    scale, shift = compute_scale_and_shift(p, y, m)
    aligned = scale[:, None, None] * p + shift[:, None, None]
    abs_err = jnp.abs(aligned - y) * m
    count = jnp.sum(m)
    return jnp.sum(abs_err) / jnp.maximum(count, 1.0)


def angular_loss(prediction: Array, target: Array, mask: Array) -> Array:
    """Mean angular error (radians) between unit normal fields over valid pixels."""
    p = prediction.astype(jnp.float32)
    y = target.astype(jnp.float32)
    if mask.ndim == 4:
        mask = mask[..., 0]
    m = mask.astype(jnp.float32)

    dot = jnp.sum(p * y, axis=-1)
    dot = jnp.clip(dot, -1.0, 1.0)
    angle = jnp.arccos(dot)
    count = jnp.sum(m)
    return jnp.sum(angle * m) / jnp.maximum(count, 1.0)


def nan_guarded(loss: Array) -> Array:
    """Replace a NaN loss with 0 so a degenerate batch skips its gradient contribution,
    the jit-friendly equivalent of the reference's isnan-skip
    (`/root/reference/training/train.py:548-552`)."""
    return jnp.where(jnp.isnan(loss), jnp.zeros_like(loss), loss)
