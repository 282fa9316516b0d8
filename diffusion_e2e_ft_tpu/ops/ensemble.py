"""Ensembling of multiple affine-invariant depth maps / unit normal fields.

Capability parity: `/root/reference/Marigold/marigold/util/ensemble.py:40-132` (joint
scale/shift alignment by BFGS over a pairwise-RMS + near/far regularizer objective,
median reduce, MAD uncertainty) and the spherical normal ensembling shared by Marigold
and GeoWizard (`/root/reference/GeoWizard/geowizard/utils/normal_ensemble.py:6-21`).

Design: the BFGS driver (scipy, numerical gradients) is host-side — it only runs for
ensemble_size > 1, off the single-step production path. The objective is evaluated by a
jitted JAX function so repeated closure calls stay cheap; the normal ensemble is one
jitted function end to end.

Median semantics: torch.median returns the LOWER of the two middle values for even
counts (numpy averages them); `_median_lower` reproduces the torch behavior so ensembled
outputs match the reference bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _median_lower(x: Array, axis: int = 0) -> Array:
    """torch.median semantics: lower middle element for even-sized axes."""
    n = x.shape[axis]
    sorted_x = jnp.sort(x, axis=axis)
    return jnp.take(sorted_x, (n - 1) // 2, axis=axis)


@functools.partial(jax.jit, static_argnames=("reduction", "regularizer_strength"))
def _depth_objective(
    images: Array, s: Array, t: Array, reduction: str = "median", regularizer_strength: float = 0.02
) -> Array:
    """Pairwise-RMS + near/far regularizer objective for N aligned depth maps."""
    n = images.shape[0]
    aligned = images * s.reshape(-1, 1, 1) + t.reshape(-1, 1, 1)
    # pairwise differences over all (i, j) combinations, i < j
    ii, jj = np.triu_indices(n, k=1)
    dists = aligned[ii] - aligned[jj]
    sqrt_dist = jnp.sqrt(jnp.mean(dists**2))

    if reduction == "mean":
        pred = jnp.mean(aligned, axis=0)
    else:
        pred = _median_lower(aligned, axis=0)
    near_err = jnp.abs(0.0 - jnp.min(pred))
    far_err = jnp.abs(1.0 - jnp.max(pred))
    return sqrt_dist + (near_err + far_err) * regularizer_strength


def ensemble_depths(
    input_images,
    regularizer_strength: float = 0.02,
    max_iter: int = 2,
    tol: float = 1e-3,
    reduction: str = "median",
    max_res: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Align N affine-invariant depth maps [N, H, W] by joint (scale, shift) BFGS, then
    reduce; returns ([H, W] in [0, 1], per-pixel uncertainty)."""
    from scipy.optimize import minimize

    images = jnp.asarray(input_images, jnp.float32)
    original = images
    n = images.shape[0]
    if n == 1:
        d = np.asarray(images[0])
        lo, hi = d.min(), d.max()
        return (d - lo) / max(hi - lo, 1e-8), np.zeros_like(d)

    if max_res is not None:
        h, w = images.shape[-2:]
        scale = min(max_res / h, max_res / w)
        if scale < 1:
            nh, nw = int(h * scale), int(w * scale)
            images = jax.image.resize(images, (n, nh, nw), method="nearest")

    flat = np.asarray(images).reshape(n, -1)
    _min, _max = flat.min(axis=1), flat.max(axis=1)
    s_init = 1.0 / np.maximum(_max - _min, 1e-8)
    t_init = -s_init * _min
    x0 = np.concatenate([s_init, t_init]).astype(np.float32)

    def closure(x):
        s, t = x[:n], x[n:]
        err = _depth_objective(
            images,
            jnp.asarray(s, jnp.float32),
            jnp.asarray(t, jnp.float32),
            reduction=reduction,
            regularizer_strength=regularizer_strength,
        )
        return np.float32(err)

    res = minimize(closure, x0, method="BFGS", tol=tol, options={"maxiter": max_iter, "disp": False})
    s = jnp.asarray(res.x[:n], jnp.float32)
    t = jnp.asarray(res.x[n:], jnp.float32)

    aligned = original * s.reshape(-1, 1, 1) + t.reshape(-1, 1, 1)
    if reduction == "mean":
        combined = jnp.mean(aligned, axis=0)
        uncertainty = jnp.std(aligned, axis=0, ddof=1)
    else:
        combined = _median_lower(aligned, axis=0)
        uncertainty = _median_lower(jnp.abs(aligned - combined), axis=0)  # MAD

    lo, hi = jnp.min(combined), jnp.max(combined)
    combined = (combined - lo) / (hi - lo)
    uncertainty = uncertainty / (hi - lo)
    return np.asarray(combined), np.asarray(uncertainty)


@jax.jit
def ensemble_normals(input_images: Array) -> Array:
    """Pick the member closest to the mean spherical direction.

    input: [N, H, W, 3] normal fields -> [H, W, 3]. The mean field is built from the
    averaged azimuth/polar angles; the returned prediction is the *member* with the
    smallest total angular error to that mean (not the mean itself), matching the
    reference.
    """
    n = input_images / (
        jnp.linalg.norm(input_images, axis=-1, keepdims=True) + 1e-5
    )
    phi = jnp.mean(jnp.arctan2(n[..., 1], n[..., 0]), axis=0)
    theta = jnp.mean(
        jnp.arctan2(jnp.linalg.norm(n[..., :2], axis=-1), n[..., 2]), axis=0
    )
    mean_field = jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)],
        axis=-1,
    )
    # cosine similarity of each member to the mean field
    cos = jnp.sum(mean_field[None] * n, axis=-1) / (
        jnp.linalg.norm(mean_field, axis=-1)[None] * jnp.linalg.norm(n, axis=-1) + 1e-8
    )
    err = jnp.arccos(jnp.clip(cos, -0.999, 0.999))
    idx = jnp.argmin(jnp.sum(err.reshape(err.shape[0], -1), axis=-1))
    return n[idx]
