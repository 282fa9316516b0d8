"""Initial-latent noise generators: zeros, gaussian, and multiresolution pyramid noise.

Capability parity: the three noise modes selected by `--noise_type` in the reference
trainer (`/root/reference/training/train.py:484-491`), the inference-side variants in
`/root/reference/Marigold/marigold/marigold_pipeline.py:76-86,409-425`, and GeoWizard's
timestep-scaled pyramid variant (`/root/reference/GeoWizard/geowizard/models/geowizard_pipeline.py:33-43`).

TPU design note: pyramid noise draws a random *shape schedule* (each octave's resolution
depends on a random scale factor), which cannot live inside a jitted graph. We split it:
the shape schedule is derived host-side from the key (deterministic), and the per-octave
gaussian draws + bilinear upsamples run as normal XLA ops. The default production path
(`zeros`) is trivially jittable; `gaussian` is one `jax.random.normal`.

All arrays are NHWC.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def zeros(shape: Sequence[int], dtype=jnp.float32) -> Array:
    """Deterministic zero 'noise' — the reference's default and headline configuration."""
    return jnp.zeros(tuple(shape), dtype)


def gaussian(key: jax.Array, shape: Sequence[int], dtype=jnp.float32) -> Array:
    return jax.random.normal(key, tuple(shape), dtype)


def _octave_sizes(
    height: int, width: int, scales: np.ndarray
) -> Tuple[Tuple[int, int], ...]:
    """Per-octave (h, w) targets: octave i uses (dim / r_i**i), floored at 1.

    Stops after the first octave that bottoms out at 1 in either dimension, matching the
    reference's early break.
    """
    sizes = []
    for i, r in enumerate(scales):
        h = max(1, int(height / (r**i)))
        w = max(1, int(width / (r**i)))
        sizes.append((h, w))
        if h == 1 or w == 1:
            break
    return tuple(sizes)


def _shape_schedule(
    key: jax.Array, height: int, width: int, num_octaves: int, base: float, spread: float
) -> Tuple[Tuple[int, int], ...]:
    """Host-side random octave schedule, deterministic in the key."""
    seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
    rng = np.random.default_rng(seed)
    scales = rng.random(num_octaves) * spread + base
    return _octave_sizes(height, width, scales)


def pyramid(
    key: jax.Array,
    shape: Sequence[int],
    discount: float = 0.9,
    dtype=jnp.float32,
    timestep_scale: Optional[Array] = None,
    *,
    num_octaves: int = 10,
    base: float = 2.0,
    spread: float = 2.0,
) -> Array:
    """Multiresolution pyramid noise over an NHWC latent, normalized to unit std.

    With `timestep_scale=None` this is the training/Marigold variant (octave scale
    r ~ U[2,4], octave i weighted discount**i). GeoWizard's variant passes
    `timestep_scale = t/1000` (per-sample, shape [B]) and uses r ~ U[1.5,3]
    (set base=spread=1.5), which scales every octave *except the base gaussian*.
    """
    b, h, w, c = shape
    sched_key, noise_key = jax.random.split(key)
    sizes = _shape_schedule(sched_key, h, w, num_octaves, base, spread)

    noise = jax.random.normal(noise_key, (b, h, w, c), dtype)
    keys = jax.random.split(noise_key, len(sizes))
    if timestep_scale is not None:
        ts = jnp.asarray(timestep_scale, dtype).reshape(-1, 1, 1, 1)
    for i, (oh, ow) in enumerate(sizes):
        octave = jax.random.normal(keys[i], (b, oh, ow, c), dtype)
        up = jax.image.resize(octave, (b, h, w, c), method="bilinear")
        term = up * (discount**i)
        if timestep_scale is not None:
            term = term * ts
        noise = noise + term
    # torch .std() default is the Bessel-corrected (ddof=1) estimator
    return noise / jnp.std(noise, ddof=1)


def pyramid_geowizard(
    key: jax.Array,
    shape: Sequence[int],
    timesteps: Array,
    discount: float = 0.9,
    dtype=jnp.float32,
) -> Array:
    """GeoWizard's pyramid noise: octaves scaled by t/1000, r ~ U[1.5, 3]."""
    ts = jnp.asarray(timesteps, dtype) / 1000.0
    return pyramid(
        key, shape, discount, dtype, timestep_scale=ts, base=1.5, spread=1.5
    )


def make_noise(
    noise_type: Optional[str],
    key: Optional[jax.Array],
    shape: Sequence[int],
    dtype=jnp.float32,
) -> Array:
    """Dispatch on the reference's noise-type flag values (None treated as zeros)."""
    if noise_type is None or noise_type == "zeros":
        return zeros(shape, dtype)
    if noise_type == "gaussian":
        if key is None:
            raise ValueError("gaussian noise requires a PRNG key")
        return gaussian(key, shape, dtype)
    if noise_type == "pyramid":
        if key is None:
            raise ValueError("pyramid noise requires a PRNG key")
        return pyramid(key, shape, dtype=dtype)
    raise ValueError(f"Unknown noise type: {noise_type}")
