"""Generic surface-normal losses for NNET-style baselines.

Capability parity: `/root/reference/DSINE/projects/baseline_normal/losses.py:12-134`
(L1, L2, angular AL, and the uncertainty-weighted von Mises negative log-likelihood
NLL used by aleatoric-uncertainty normal estimators). Masked statistics are
where-sums; everything is jit-friendly JAX.

Conventions: prediction [..., 3] (+ optional kappa channel [..., 1] for NLL),
target [..., 3] unit normals, mask [...] bool.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(values: Array, mask: Array) -> Array:
    m = mask.astype(jnp.float32)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def l1_loss(pred: Array, target: Array, mask: Array) -> Array:
    per_px = jnp.sum(jnp.abs(pred - target), axis=-1)
    return _masked_mean(per_px, mask)


def l2_loss(pred: Array, target: Array, mask: Array) -> Array:
    per_px = jnp.sum((pred - target) ** 2, axis=-1)
    return _masked_mean(per_px, mask)


def angular_loss(pred: Array, target: Array, mask: Array, eps: float = 1e-6) -> Array:
    """AL: acos of the cosine similarity, mean over valid pixels."""
    cos = jnp.sum(pred * target, axis=-1) / (
        jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1) + eps
    )
    angle = jnp.arccos(jnp.clip(cos, -1.0 + eps, 1.0 - eps))
    return _masked_mean(angle, mask)


def nll_vonmises(
    pred: Array, kappa: Array, target: Array, mask: Array, eps: float = 1e-6
) -> Array:
    """Uncertainty-aware angular NLL with a von Mises-Fisher-style concentration:
    loss = -log(kappa^2 + 1) + kappa * acos(cos) + log(1 + exp(-kappa * pi))."""
    kappa = jnp.squeeze(kappa, axis=-1) if kappa.ndim == pred.ndim else kappa
    cos = jnp.sum(pred * target, axis=-1) / (
        jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1) + eps
    )
    angle = jnp.arccos(jnp.clip(cos, -1.0 + eps, 1.0 - eps))
    nll = (
        -jnp.log(jnp.square(kappa) + 1.0)
        + kappa * angle
        + jnp.log1p(jnp.exp(-kappa * jnp.pi))
    )
    return _masked_mean(nll, mask)


LOSS_FUNCS = {
    "l1": l1_loss,
    "l2": l2_loss,
    "al": angular_loss,
    "nll_vonmises": nll_vonmises,
}
