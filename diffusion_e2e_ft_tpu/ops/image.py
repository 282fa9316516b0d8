"""Image ops: aspect-preserving resize, normalization, colorization, 16-bit export.

Capability parity: `/root/reference/Marigold/marigold/util/image_util.py` (max-edge
antialiased resize, Spectral depth colorization, chw<->hwc) and the export helpers in
`/root/reference/Marigold/run.py:323-344`.

Device-side ops (resize, normalize) are pure JAX over NHWC arrays. Colorization and
PNG export are host-side numpy by design — they sit after the jitted graph.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_RESIZE_METHODS = {
    "bilinear": "linear",
    "bicubic": "cubic",
    "nearest": "nearest",
    "nearest-exact": "nearest",
}


def resize(img: Array, out_hw: Tuple[int, int], method: str = "bilinear", antialias: bool = True) -> Array:
    """Resize an NHWC (or HWC) image stack to out_hw.

    `antialias` only affects downscaling (as in torchvision/PIL). jax.image.resize
    applies the triangle/cubic kernel with antialiasing by default.
    """
    m = _RESIZE_METHODS.get(method, method)
    if img.ndim == 3:
        shape = (out_hw[0], out_hw[1], img.shape[-1])
    elif img.ndim == 4:
        shape = (img.shape[0], out_hw[0], out_hw[1], img.shape[-1])
    else:
        raise ValueError(f"Expected HWC or NHWC, got shape {img.shape}")
    if m == "nearest":
        return jax.image.resize(img, shape, method="nearest")
    return jax.image.resize(img, shape, method=m, antialias=antialias)


def max_edge_size(height: int, width: int, max_edge_resolution: int) -> Tuple[int, int]:
    """Target (h, w) limiting the longest edge while keeping aspect ratio.

    Static host-side computation (shapes must be concrete for jit).
    """
    factor = min(max_edge_resolution / width, max_edge_resolution / height)
    return int(height * factor), int(width * factor)


def resize_max_res(img: Array, max_edge_resolution: int, method: str = "bilinear") -> Array:
    """Resize so the longest edge equals max_edge_resolution (aspect preserved)."""
    h, w = (img.shape[0], img.shape[1]) if img.ndim == 3 else (img.shape[1], img.shape[2])
    return resize(img, max_edge_size(h, w, max_edge_resolution), method)


def normalize_rgb(img: Array) -> Array:
    """uint8-range [0, 255] -> [-1, 1] float."""
    return img.astype(jnp.float32) / 255.0 * 2.0 - 1.0


def denormalize_rgb(img: Array) -> Array:
    """[-1, 1] -> [0, 255]."""
    return (img + 1.0) / 2.0 * 255.0


def pad_to_multiple(img: Array, multiple: int = 32) -> Tuple[Array, Tuple[int, int]]:
    """Edge-pad bottom/right so H and W divide `multiple`; returns (padded, orig_hw).

    Mirrors the DSINE benchmark's pad-to-/32 (`/root/reference/DSINE/utils/utils.py:200-240`).
    """
    if img.ndim == 3:
        h, w = img.shape[0], img.shape[1]
        pads = ((0, -h % multiple), (0, -w % multiple), (0, 0))
    else:
        h, w = img.shape[1], img.shape[2]
        pads = ((0, 0), (0, -h % multiple), (0, -w % multiple), (0, 0))
    return jnp.pad(img, pads, mode="edge"), (h, w)


def unpad(img: Array, orig_hw: Tuple[int, int]) -> Array:
    h, w = orig_hw
    if img.ndim == 3:
        return img[:h, :w, :]
    return img[:, :h, :w, :]


# ---------------------------------------------------------------------------
# Host-side visualization / export
# ---------------------------------------------------------------------------


def colorize_depth(
    depth: np.ndarray,
    min_depth: float = 0.0,
    max_depth: float = 1.0,
    cmap: str = "Spectral",
    valid_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Depth [H, W] -> float RGB [H, W, 3] in [0, 1] via a matplotlib colormap."""
    import matplotlib

    depth = np.asarray(depth, dtype=np.float32).squeeze()
    x = (depth - min_depth) / max(max_depth - min_depth, 1e-8)
    x = np.clip(x, 0.0, 1.0)
    mapper = matplotlib.colormaps[cmap]
    rgb = mapper(x)[..., :3].astype(np.float32)
    if valid_mask is not None:
        rgb[~np.asarray(valid_mask, bool).squeeze()] = 0.0
    return rgb


def colorize_normals(normals: np.ndarray) -> np.ndarray:
    """Unit normals [H, W, 3] in [-1, 1] -> uint8 RGB."""
    n = np.asarray(normals, dtype=np.float32)
    return (((n + 1.0) * 0.5) * 255.0).clip(0, 255).astype(np.uint8)


def to_uint16(depth01: np.ndarray) -> np.ndarray:
    """[0, 1] depth -> 16-bit png payload (the reference's export format)."""
    return (np.asarray(depth01, np.float32) * 65535.0).astype(np.uint16)


def chw2hwc(x):
    return np.moveaxis(np.asarray(x), 0, -1)


def hwc2chw(x):
    return np.moveaxis(np.asarray(x), -1, 0)
