"""Hypersim preprocessing: HDR tone mapping and distance -> planar depth.

Capability parity: `/root/reference/Marigold/script/dataset_preprocess/hypersim/`
(`hypersim_util.py:9-70`, `preprocess_hypersim.py:21-153`): HDF5 frames are
tone-mapped (scale chosen so the 90th-percentile CCIR601 brightness maps to 0.8
after gamma 1/2.2), distance-to-camera-center is converted to planar depth via the
per-pixel ray norm, and frames are exported as RGB png + uint16 mm depth png with a
per-split CSV.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

HYPERSIM_FOCAL = 886.81
TONE_GAMMA = 1.0 / 2.2
TONE_PERCENTILE = 90
TONE_TARGET = 0.8


def tone_map(rgb_hdr: np.ndarray, valid_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Scale so the 90th-percentile brightness hits 0.8 post-gamma; clip to [0, 1]."""
    rgb = np.asarray(rgb_hdr, np.float64)
    if valid_mask is None:
        valid_mask = np.ones(rgb.shape[:2], bool)
    if not valid_mask.any():
        scale = 1.0
    else:
        brightness = 0.3 * rgb[..., 0] + 0.59 * rgb[..., 1] + 0.11 * rgb[..., 2]
        current = np.percentile(brightness[valid_mask], TONE_PERCENTILE)
        if current < 1e-4:
            scale = 0.0
        else:
            scale = np.power(TONE_TARGET, 1.0 / TONE_GAMMA) / current
    out = np.power(np.maximum(scale * rgb, 0.0), TONE_GAMMA)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def dist_to_depth(distance: np.ndarray, focal: float = HYPERSIM_FOCAL) -> np.ndarray:
    """Distance-to-camera-center -> planar depth: d * f / ||ray||, with image-plane
    rays through half-pixel-centered coordinates."""
    h, w = distance.shape
    x = np.linspace(-0.5 * w + 0.5, 0.5 * w - 0.5, w, dtype=np.float32)[None, :]
    y = np.linspace(-0.5 * h + 0.5, 0.5 * h - 0.5, h, dtype=np.float32)[:, None]
    ray_norm = np.sqrt(x**2 + y**2 + focal**2)
    return (np.asarray(distance, np.float32) / ray_norm * focal).astype(np.float32)


def depth_to_uint16_mm(depth_m: np.ndarray) -> np.ndarray:
    """Meters -> millimeter uint16 png payload (the training storage format)."""
    return np.clip(np.asarray(depth_m, np.float64) * 1000.0, 0, 65535).astype(np.uint16)


def preprocess_frame(
    rgb_hdr: np.ndarray,  # [H, W, 3] linear HDR
    distance: np.ndarray,  # [H, W] distance to camera center (meters)
    entity_id_map: Optional[np.ndarray] = None,  # valid where != -1
) -> Dict[str, np.ndarray]:
    valid = None if entity_id_map is None else (entity_id_map != -1)
    rgb = (tone_map(rgb_hdr, valid) * 255).round().astype(np.uint8)
    depth = dist_to_depth(distance)
    return {"rgb": rgb, "depth_mm": depth_to_uint16_mm(depth), "depth_m": depth}


def preprocess_scene_hdf5(
    scene_dir: str,
    out_dir: str,
    camera: str = "cam_00",
    progress: bool = True,
) -> List[Dict[str, str]]:
    """Process every final_hdf5 color frame of one scene/camera into png pairs;
    returns CSV-row dicts (rgb_path, depth_path, scene_name, camera_name, frame_id)."""
    import h5py
    from PIL import Image

    scene = os.path.basename(os.path.normpath(scene_dir))
    color_dir = os.path.join(scene_dir, "images", f"scene_{camera}_final_hdf5")
    geom_dir = os.path.join(scene_dir, "images", f"scene_{camera}_geometry_hdf5")
    rows = []
    if not os.path.isdir(color_dir):
        return rows
    for fname in sorted(os.listdir(color_dir)):
        if not fname.endswith(".color.hdf5"):
            continue
        frame = fname.split(".")[1]
        with h5py.File(os.path.join(color_dir, fname)) as f:
            rgb_hdr = np.asarray(f["dataset"], np.float32)
        dist_path = os.path.join(geom_dir, f"frame.{frame}.depth_meters.hdf5")
        with h5py.File(dist_path) as f:
            distance = np.asarray(f["dataset"], np.float32)
        render_id_path = os.path.join(geom_dir, f"frame.{frame}.render_entity_id.hdf5")
        entity = None
        if os.path.exists(render_id_path):
            with h5py.File(render_id_path) as f:
                entity = np.asarray(f["dataset"])

        out = preprocess_frame(rgb_hdr, distance, entity)
        rgb_rel = os.path.join(scene, "rgb", f"frame.{frame}.png")
        depth_rel = os.path.join(scene, "depth", f"frame.{frame}.png")
        os.makedirs(os.path.dirname(os.path.join(out_dir, rgb_rel)), exist_ok=True)
        os.makedirs(os.path.dirname(os.path.join(out_dir, depth_rel)), exist_ok=True)
        Image.fromarray(out["rgb"]).save(os.path.join(out_dir, rgb_rel))
        Image.fromarray(out["depth_mm"].astype(np.int32), mode="I").save(
            os.path.join(out_dir, depth_rel)
        )
        rows.append(
            {
                "rgb_path": rgb_rel,
                "depth_path": depth_rel,
                "scene_name": scene,
                "camera_name": camera,
                "frame_id": int(frame),
                "included_in_public_release": True,
                "split_partition_name": "train",
            }
        )
        if progress and len(rows) % 50 == 0:
            print(f"[hypersim] {scene}/{camera}: {len(rows)} frames", flush=True)
    return rows
