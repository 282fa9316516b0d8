"""Depth -> surface-normal translation with discontinuity-aware gradients (D2NT).

Capability parity: `/root/reference/depth-to-normal-translator/python/` (the d2nt_v3
pipeline used to generate VKITTI GT normals): one-sided depth gradients blended by a
soft-min over local Laplacian magnitudes (so gradients never straddle a depth
discontinuity), normal = (Gu*fx, Gv*fy, -(z + v*Gv + u*Gu)) in the (u-u0, v-v0)
pixel frame, an MRF refinement that replaces each normal with the neighbor whose
depth is locally smoothest, and a camera-facing flip.

Fresh numpy implementation: convolutions are explicit edge-padded shifts
(cv2.filter2D's reflect-101 border), vectorized over the full frame.
"""

from __future__ import annotations

from typing import Literal, Tuple

import numpy as np

Version = Literal["basic", "v2", "v3"]

VKITTI_INTRINSICS = (725.0087, 725.0087, 620.5, 187.0)  # fx, fy, cx, cy


def _shift(a: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Shift with reflect-101 border (the OpenCV default): out[y,x] = a[y+dy, x+dx]."""
    h, w = a.shape
    pad = max(abs(dy), abs(dx))
    p = np.pad(a, pad, mode="reflect")
    return p[pad + dy : pad + dy + h, pad + dx : pad + dx + w]


def one_sided_gradients(z: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(left, right, up, down) one-sided depth differences."""
    grad_l = z - _shift(z, 0, -1)
    grad_r = _shift(z, 0, 1) - z
    grad_u = z - _shift(z, -1, 0)
    grad_d = _shift(z, 1, 0) - z
    return grad_l, grad_r, grad_u, grad_d


def central_gradients(z: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Central-difference Gu, Gv (the 'basic' non-discontinuity-aware filter)."""
    gu = (_shift(z, 0, 1) - _shift(z, 0, -1)) / 2.0
    gv = (_shift(z, 1, 0) - _shift(z, -1, 0)) / 2.0
    return gu, gv


def _soft_min_weights(lap: np.ndarray, axis: int, base: float) -> Tuple[np.ndarray, np.ndarray]:
    """Blend weights favoring the side with the smaller neighboring Laplacian.

    axis 0: horizontal (left/right neighbors along x); axis 1: vertical."""
    eps = 1e-8
    p = np.power(base, -lap)
    if axis == 0:
        p_neg = _zero_shift(p, 0, -1)
        p_pos = _zero_shift(p, 0, 1)
    else:
        p_neg = _zero_shift(p, -1, 0)
        p_pos = _zero_shift(p, 1, 0)
    w_neg = (p_neg + eps * 0.5) / (eps + p_neg + p_pos)
    w_pos = (p_pos + eps * 0.5) / (eps + p_neg + p_pos)
    # snap to hard selection when one side dominates by more than `base`
    dominant_neg = w_neg / (w_pos + eps) > base
    dominant_pos = w_pos / (w_neg + eps) > base
    w_neg = np.where(dominant_neg, 1.0, np.where(dominant_pos, 0.0, w_neg))
    w_pos = np.where(dominant_neg, 0.0, np.where(dominant_pos, 1.0, w_pos))
    return w_neg, w_pos


def _zero_shift(a: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Shift filling vacated cells with zero: out[y,x] = a[y+dy, x+dx] or 0."""
    out = np.zeros_like(a)
    h, w = a.shape
    ys = slice(max(dy, 0), h + min(dy, 0))
    yd = slice(max(-dy, 0), h + min(-dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    xd = slice(max(-dx, 0), w + min(-dx, 0))
    out[yd, xd] = a[ys, xs]
    return out


def dag_gradients(z: np.ndarray, base: float = np.e) -> Tuple[np.ndarray, np.ndarray]:
    """Discontinuity-aware Gu, Gv: per-pixel soft-min blend of one-sided gradients."""
    grad_l, grad_r, grad_u, grad_d = one_sided_gradients(z)
    lap_hor = np.abs(grad_l - grad_r)
    lap_ver = np.abs(grad_u - grad_d)
    w_l, w_r = _soft_min_weights(lap_hor, 0, base)
    w_u, w_d = _soft_min_weights(lap_ver, 1, base)
    return w_l * grad_l + w_r * grad_r, w_u * grad_u + w_d * grad_d


def depth_to_normal(
    depth: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    version: Version = "v3",
) -> np.ndarray:
    """[H, W] depth -> [H, W, 3] unit normals, camera-facing (reference convention:
    flipped with * -1 at the end)."""
    z = np.asarray(depth, np.float64)
    h, w = z.shape
    # 1-indexed pixel frames, matching the reference's arange(1, n+1)
    u = np.arange(1, w + 1)[None, :] - cx
    v = np.arange(1, h + 1)[:, None] - cy

    if version == "basic":
        gu, gv = central_gradients(z)
    else:
        gu, gv = dag_gradients(z)

    nx = gu * fx
    ny = gv * fy
    nz = -(z + v * gv + u * gu)
    n = np.stack([nx, ny, nz], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12

    if version == "v3":
        n = mrf_refine(z, n)
    return (-n).astype(np.float32)


def mrf_refine(depth: np.ndarray, normal: np.ndarray) -> np.ndarray:
    """Replace each pixel's normal with the {left,right,up,down,self} candidate whose
    depth Laplacian is smallest (self uses the mean of its two 1-D Laplacians;
    borders exclude out-of-frame neighbors)."""
    z = np.asarray(depth, np.float64)
    h, w = z.shape
    lap_hor = np.abs(_shift(z, 0, -1) + _shift(z, 0, 1) - 2 * z)
    lap_ver = np.abs(_shift(z, -1, 0) + _shift(z, 1, 0) - 2 * z)

    inf = np.inf
    cost = np.stack(
        [
            _border_inf(lap_hor, 0, -1),
            _border_inf(lap_hor, 0, 1),
            _border_inf(lap_ver, -1, 0),
            _border_inf(lap_ver, 1, 0),
            (lap_hor + lap_ver) / 2.0,
        ]
    )
    best = np.argmin(cost, axis=0)

    candidates = np.stack(
        [
            _zero_shift3(normal, 0, -1),
            _zero_shift3(normal, 0, 1),
            _zero_shift3(normal, -1, 0),
            _zero_shift3(normal, 1, 0),
            normal,
        ]
    )
    return np.take_along_axis(candidates, best[None, ..., None], axis=0)[0]


def _border_inf(lap: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Neighbor cost: lap at the neighbor, inf where the neighbor is out of frame."""
    out = np.full_like(lap, np.inf)
    h, w = lap.shape
    ys = slice(max(dy, 0), h + min(dy, 0))
    yd = slice(max(-dy, 0), h + min(-dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    xd = slice(max(-dx, 0), w + min(-dx, 0))
    out[yd, xd] = lap[ys, xs]
    return out


def _zero_shift3(a: np.ndarray, dy: int, dx: int) -> np.ndarray:
    out = np.zeros_like(a)
    h, w = a.shape[:2]
    ys = slice(max(dy, 0), h + min(dy, 0))
    yd = slice(max(-dy, 0), h + min(-dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    xd = slice(max(-dx, 0), w + min(-dx, 0))
    out[yd, xd] = a[ys, xs]
    return out


def save_normal_png16(path: str, normal: np.ndarray) -> None:
    """Save [-1, 1] normals as 16-bit RGB png (the reference's storage format)."""
    import cv2

    n16 = ((np.asarray(normal) + 1.0) * 32767.5).astype(np.uint16)
    cv2.imwrite(path, cv2.cvtColor(n16, cv2.COLOR_RGB2BGR))


def load_normal_png16(path: str) -> np.ndarray:
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    raw = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
    return raw.astype(np.float32) / 32767.5 - 1.0


def generate_vkitti_normals(root_dir: str, version: Version = "v3", progress: bool = True) -> int:
    """Walk the VKITTI depth tree and write `vkitti_DAG_normals/.../normal_*.png`
    next to it; returns the number of frames processed."""
    import os

    import cv2

    fx, fy, cx, cy = VKITTI_INTRINSICS
    depth_root = os.path.join(root_dir, "vkitti_2.0.3_depth")
    out_root = os.path.join(root_dir, "vkitti_DAG_normals")
    count = 0
    for dirpath, _, files in os.walk(depth_root):
        for fname in sorted(files):
            if not (fname.startswith("depth") and fname.endswith(".png")):
                continue
            depth_path = os.path.join(dirpath, fname)
            depth_cm = cv2.imread(depth_path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
            # the reference loads cm->m then multiplies back by 100: math runs in cm
            normal = depth_to_normal(depth_cm.astype(np.float64), fx, fy, cx, cy, version)
            out_dir = dirpath.replace(depth_root, out_root).replace(
                os.sep + "depth" + os.sep, os.sep + "normal" + os.sep
            )
            os.makedirs(out_dir, exist_ok=True)
            out_path = os.path.join(out_dir, fname.replace("depth", "normal"))
            save_normal_png16(out_path, normal)
            count += 1
            if progress and count % 200 == 0:
                print(f"[d2n] {count} frames", flush=True)
    return count
