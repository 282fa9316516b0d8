"""Depth and surface-normal evaluation metrics.

Capability parity: the 10-metric depth set + running-average tracker
(`/root/reference/Marigold/src/util/metric.py:10-158`) and the DSINE pooled angular
metrics (`/root/reference/DSINE/utils/utils.py:150-178`). Masked statistics are
static-shape where-sums (jit/TPU-friendly) with the reference's per-image-then-batch
averaging order preserved.

All depth metrics take numpy/JAX arrays shaped [B, H, W] (or [H, W]) plus a boolean
valid mask, and return a python float.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _prep(output, target, valid_mask):
    o = jnp.asarray(output, jnp.float32)
    t = jnp.asarray(target, jnp.float32)
    if o.ndim == 2:
        o, t = o[None], t[None]
        if valid_mask is not None:
            valid_mask = jnp.asarray(valid_mask)[None]
    if valid_mask is None:
        m = jnp.ones_like(o, bool)
    else:
        m = jnp.asarray(valid_mask, bool)
    return o, t, m


def _per_image_mean(values, mask):
    """sum over valid pixels / n_valid, per image; then mean over the batch."""
    n = jnp.sum(mask, axis=(-1, -2))
    s = jnp.sum(jnp.where(mask, values, 0.0), axis=(-1, -2))
    return float(jnp.mean(s / n))


def abs_relative_difference(output, target, valid_mask=None) -> float:
    o, t, m = _prep(output, target, valid_mask)
    return _per_image_mean(jnp.abs(o - t) / t, m)


def squared_relative_difference(output, target, valid_mask=None) -> float:
    o, t, m = _prep(output, target, valid_mask)
    return _per_image_mean((o - t) ** 2 / t, m)


def rmse_linear(output, target, valid_mask=None) -> float:
    o, t, m = _prep(output, target, valid_mask)
    n = jnp.sum(m, axis=(-1, -2))
    mse = jnp.sum(jnp.where(m, (o - t) ** 2, 0.0), axis=(-1, -2)) / n
    return float(jnp.mean(jnp.sqrt(mse)))


def rmse_log(output, target, valid_mask=None) -> float:
    o, t, m = _prep(output, target, valid_mask)
    d = jnp.where(m, jnp.log(o) - jnp.log(t), 0.0)
    n = jnp.sum(m, axis=(-1, -2))
    mse = jnp.sum(d**2, axis=(-1, -2)) / n
    return float(jnp.mean(jnp.sqrt(mse)))


def log10(output, target, valid_mask=None) -> float:
    o, t, m = _prep(output, target, valid_mask)
    # reference pools ALL valid pixels of the batch for this one (metric.py:90-97)
    d = jnp.abs(jnp.log10(o) - jnp.log10(t))
    return float(jnp.sum(jnp.where(m, d, 0.0)) / jnp.sum(m))


def threshold_percentage(output, target, threshold_val, valid_mask=None) -> float:
    o, t, m = _prep(output, target, valid_mask)
    ratio = jnp.maximum(o / t, t / o)
    hit = jnp.where(m, (ratio < threshold_val).astype(jnp.float32), 0.0)
    n = jnp.sum(m, axis=(-1, -2))
    return float(jnp.mean(jnp.sum(hit, axis=(-1, -2)) / n))


def delta1_acc(pred, gt, valid_mask=None) -> float:
    return threshold_percentage(pred, gt, 1.25, valid_mask)


def delta2_acc(pred, gt, valid_mask=None) -> float:
    return threshold_percentage(pred, gt, 1.25**2, valid_mask)


def delta3_acc(pred, gt, valid_mask=None) -> float:
    return threshold_percentage(pred, gt, 1.25**3, valid_mask)


def i_rmse(output, target, valid_mask=None) -> float:
    o, t, m = _prep(output, target, valid_mask)
    d = jnp.where(m, 1.0 / o - 1.0 / t, 0.0)
    n = jnp.sum(m, axis=(-1, -2))
    mse = jnp.sum(d**2, axis=(-1, -2)) / n
    return float(jnp.mean(jnp.sqrt(mse)))


def silog_rmse(depth_pred, depth_gt, valid_mask=None) -> float:
    o, t, m = _prep(depth_pred, depth_gt, valid_mask)
    d = jnp.where(m, jnp.log(o) - jnp.log(t), 0.0)
    n = jnp.sum(m, axis=(-1, -2))
    first = jnp.sum(d**2, axis=(-1, -2)) / n
    second = jnp.sum(d, axis=(-1, -2)) ** 2 / n**2
    # fp cancellation can push the variance a hair below zero on near-constant input
    return float(jnp.sqrt(jnp.maximum(jnp.mean(first - second), 0.0)) * 100.0)


DEPTH_METRIC_FUNCS = {
    "abs_relative_difference": abs_relative_difference,
    "squared_relative_difference": squared_relative_difference,
    "rmse_linear": rmse_linear,
    "rmse_log": rmse_log,
    "log10": log10,
    "delta1_acc": delta1_acc,
    "delta2_acc": delta2_acc,
    "delta3_acc": delta3_acc,
    "i_rmse": i_rmse,
    "silog_rmse": silog_rmse,
}


class MetricTracker:
    """Running weighted averages keyed by metric name."""

    def __init__(self, *keys: str):
        self._keys = list(keys)
        self.reset()

    def reset(self) -> None:
        self._total = {k: 0.0 for k in self._keys}
        self._count = {k: 0 for k in self._keys}

    def update(self, key: str, value: float, n: int = 1) -> None:
        if key not in self._total:
            self._keys.append(key)
            self._total[key] = 0.0
            self._count[key] = 0
        self._total[key] += float(value) * n
        self._count[key] += n

    def avg(self, key: str) -> float:
        return self._total[key] / max(self._count[key], 1)

    def result(self) -> Dict[str, float]:
        return {k: self.avg(k) for k in self._keys}


# ---------------------------------------------------------------------------
# Surface normals (DSINE-style)
# ---------------------------------------------------------------------------


def normal_angular_error_deg(pred_norm, gt_norm) -> np.ndarray:
    """Per-pixel angular error in degrees; inputs [..., 3] unit-ish normals."""
    p = np.asarray(pred_norm, np.float32)
    g = np.asarray(gt_norm, np.float32)
    cos = np.sum(p * g, axis=-1) / (
        np.linalg.norm(p, axis=-1) * np.linalg.norm(g, axis=-1) + 1e-12
    )
    cos = np.clip(cos, -1.0, 1.0)
    return np.degrees(np.arccos(cos))


def normal_metrics(total_errors_deg: np.ndarray) -> Dict[str, float]:
    """Pooled (all pixels of all images) benchmark metrics: mean/median/rmse +
    sub-threshold percentages at 5/7.5/11.25/22.5/30 degrees."""
    e = np.asarray(total_errors_deg, np.float32).reshape(-1)
    n = e.shape[0]
    return {
        "mean": float(np.mean(e)),
        "median": float(np.median(e)),
        "rmse": float(np.sqrt(np.sum(e * e) / n)),
        "a1": 100.0 * float(np.sum(e < 5) / n),
        "a2": 100.0 * float(np.sum(e < 7.5) / n),
        "a3": 100.0 * float(np.sum(e < 11.25) / n),
        "a4": 100.0 * float(np.sum(e < 22.5) / n),
        "a5": 100.0 * float(np.sum(e < 30) / n),
    }
