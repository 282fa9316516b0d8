"""Resize semantics pinned against torch.nn.functional.interpolate.

SURVEY.md §7 names torchvision-antialias-vs-jax.image.resize the #1 bit-fidelity
hazard on the accuracy-critical preprocessing path
(`/root/reference/Marigold/marigold/util/image_util.py:79-108` resizes with
torchvision `resize(..., antialias=True)`, which for tensors is exactly
`torch.nn.functional.interpolate(..., antialias=True, align_corners=False)`).

Measured divergence (CPU fp32, probe committed here as pinned bounds):

| mode                 | max abs err   | on reference path? |
|----------------------|---------------|--------------------|
| bilinear, aa=True    | <= 1e-5       | yes (the default)  |
| bilinear, aa=False   | <= 1e-6       | yes (upscale back) |
| bicubic,  aa=True    | <= 2e-5       | yes (CLIP 224 preproc) |
| nearest-exact        | 0 (bit-exact) | yes (eval masks)   |
| bicubic,  aa=False   | ~1e-1 DIVERGES | NO — see below    |

The one real divergence: non-antialiased bicubic. torch uses the Keys kernel with
a=-0.75; jax.image.resize's 'cubic' uses a=-0.5 (the PIL/Catmull-Rom choice). The
reference never hits it — `image_util.py:84` passes antialias=True
unconditionally — so we document rather than emulate, and this suite asserts the
divergence STAYS confined to that mode (if jax changed kernels, the exactness
tests here would catch it).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from diffusion_e2e_ft_tpu.ops import image as I

CASES = [
    ((480, 640), (240, 320)),  # exact 2x down (training-res family)
    ((480, 640), (576, 768)),  # upscale to the reference bench resolution
    ((333, 517), (251, 389)),  # odd-size downscale
    ((100, 150), (333, 217)),  # odd mixed up/down per axis
    ((768, 768), (480, 640)),
]


def _torch_resize(x_hwc: np.ndarray, hw, mode: str, antialias: bool) -> np.ndarray:
    t = torch.from_numpy(np.transpose(x_hwc, (2, 0, 1)))[None]
    if mode.startswith("nearest"):
        out = F.interpolate(t, size=hw, mode=mode)
    else:
        out = F.interpolate(t, size=hw, mode=mode, antialias=antialias, align_corners=False)
    return np.transpose(out[0].numpy(), (1, 2, 0))


def _ours(x_hwc: np.ndarray, hw, method: str, antialias: bool) -> np.ndarray:
    return np.asarray(I.resize(jnp.asarray(x_hwc), hw, method=method, antialias=antialias))


@pytest.mark.parametrize("src,dst", CASES)
@pytest.mark.parametrize("antialias", [True, False])
def test_bilinear_matches_torch(src, dst, antialias):
    x = np.random.default_rng(0).random(src + (3,), np.float32)
    a = _ours(x, dst, "bilinear", antialias)
    b = _torch_resize(x, dst, "bilinear", antialias)
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("src,dst", CASES)
def test_bicubic_antialias_matches_torch(src, dst):
    x = np.random.default_rng(1).random(src + (3,), np.float32)
    a = _ours(x, dst, "bicubic", True)
    b = _torch_resize(x, dst, "bicubic", True)
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.parametrize("src,dst", CASES)
def test_nearest_exact_bitwise(src, dst):
    x = np.random.default_rng(2).random(src + (3,), np.float32)
    a = _ours(x, dst, "nearest-exact", False)
    b = _torch_resize(x, dst, "nearest-exact", False)
    assert np.array_equal(a, b)


def test_bicubic_no_antialias_divergence_documented():
    """The known off-path divergence (torch a=-0.75 vs jax a=-0.5 cubic): assert it
    exists and is bounded — if either library changes kernels, this trips."""
    x = np.random.default_rng(3).random((480, 640, 3), np.float32)
    a = _ours(x, (240, 320), "bicubic", False)
    b = _torch_resize(x, (240, 320), "bicubic", False)
    err = np.abs(a - b).max()
    assert 1e-3 < err < 0.5, f"bicubic aa=False divergence changed: {err}"


def test_clip_preprocess_resize_path():
    """The CLIP-vision 224x224 bicubic downscale (GeoWizard conditioning,
    `/root/reference/GeoWizard/geowizard/training/train_depth_normal.py:613-621`):
    torchvision Resize defaults antialias=True for tensors — our path must match."""
    x = np.random.default_rng(4).random((480, 640, 3), np.float32)
    a = _ours(x, (224, 224), "bicubic", True)
    b = _torch_resize(x, (224, 224), "bicubic", True)
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_resize_max_res_against_torch_pipeline():
    """End-to-end resize_max_res (the Marigold preprocessing step) vs the torch
    equivalent at processing_res=768."""
    x = np.random.default_rng(5).random((480, 640, 3), np.float32)
    h, w = I.max_edge_size(480, 640, 768)
    assert (h, w) == (576, 768)  # the reference's bench resolution
    a = np.asarray(I.resize_max_res(jnp.asarray(x), 768))
    b = _torch_resize(x, (h, w), "bilinear", True)
    np.testing.assert_allclose(a, b, atol=1e-5)
