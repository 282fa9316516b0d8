"""Depth normalization transforms.

Capability parity: `NearFarMetricNormalizer`
(`/root/reference/Marigold/src/util/depth_transform.py:49-99`): map metric depth to
[-1, 1] by the 2%/98% quantiles of the valid pixels, clip outliers, and remember the
transform so predictions can be de-normalized back to metric scale.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class NearFarMetricNormalizer:
    """[-1, 1] quantile normalizer with invertible scale/shift per call."""

    is_absolute = False
    far_plane_at_max = True

    def __init__(
        self,
        norm_min: float = -1.0,
        norm_max: float = 1.0,
        min_max_quantile: float = 0.02,
        clip: bool = True,
    ):
        self.norm_min = norm_min
        self.norm_max = norm_max
        self.norm_range = norm_max - norm_min
        self.min_quantile = min_max_quantile
        self.max_quantile = 1.0 - min_max_quantile
        self.clip = clip

    def __call__(
        self, depth: np.ndarray, valid_mask: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, float, float]:
        """Returns (normalized depth, d_min, d_max); invert with `denormalize`."""
        depth = np.asarray(depth, np.float32)
        valid = (
            np.asarray(valid_mask, bool)
            if valid_mask is not None
            else np.ones_like(depth, bool)
        ) & (depth > 0)
        flat = depth[valid]
        if flat.size == 0:
            return np.zeros_like(depth), 0.0, 1.0
        d_min = float(np.quantile(flat, self.min_quantile))
        d_max = float(np.quantile(flat, self.max_quantile))
        denom = max(d_max - d_min, 1e-8)
        out = (depth - d_min) / denom * self.norm_range + self.norm_min
        if self.clip:
            out = np.clip(out, self.norm_min, self.norm_max)
        return out.astype(np.float32), d_min, d_max

    def denormalize(self, normalized: np.ndarray, d_min: float, d_max: float) -> np.ndarray:
        return (np.asarray(normalized, np.float32) - self.norm_min) / self.norm_range * (
            d_max - d_min
        ) + d_min
