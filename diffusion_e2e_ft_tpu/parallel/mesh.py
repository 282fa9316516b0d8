"""Mesh + sharding helpers (pure jax.sharding; no NCCL-style plumbing).

TPU-native replacement for the reference's accelerate/DDP layer: create a mesh over
the visible devices, shard the batch dimension over the 'data' axis, keep parameters
replicated (the 865M-param UNet fits per chip), and let GSPMD insert collectives.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 1-D (default) or N-D device mesh. With multiple axes, devices are reshaped
    row-major: the LAST axis is the fastest-varying (keep it the intra-slice one)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # fold all devices into the first axis unless caller passed a device grid
        shape = (n,) + (1,) * (len(axis_names) - 1)
    grid = np.asarray(devs).reshape(shape)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 4, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put every leaf with its batch dim sharded over the mesh; leaves that
    are not batch-shaped (1-D vectors, batch not divisible) replicate."""
    axis_size = mesh.shape.get(axis, mesh.devices.size)

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 2 and x.shape[0] % axis_size == 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)
