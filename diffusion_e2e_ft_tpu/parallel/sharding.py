"""Parameter/state sharding rules for data-parallel + FSDP training.

The reference's only parallelism is single-node DDP (`multi_gpu.yaml`); data
parallelism is the parity requirement. This module adds the TPU-idiomatic
extension SURVEY.md §2.6 anticipates: a 2-D `Mesh(('data', 'fsdp'))` where the
batch shards over 'data' and every large parameter (and its Adam moments) shards
over 'fsdp' along its largest divisible axis — GSPMD inserts the all-gathers on
use and reduce-scatters on update, riding ICI.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_train_mesh(
    n_devices: Optional[int] = None,
    fsdp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh(('data', 'fsdp')): n_devices/fsdp data-parallel groups of fsdp shards.

    fsdp=1 degenerates to pure data parallelism (the parity configuration)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % fsdp != 0:
        raise ValueError(f"{n} devices not divisible by fsdp={fsdp}")
    grid = np.asarray(devs).reshape(n // fsdp, fsdp)
    return Mesh(grid, ("data", "fsdp"))


def param_spec(shape, fsdp_size: int, min_size: int = 1 << 18) -> P:
    """Shard the largest fsdp-divisible axis of a big tensor over 'fsdp'."""
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return P()
    # prefer the largest axis; fall back to any divisible axis
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for ax in order:
        if shape[ax] % fsdp_size == 0 and shape[ax] >= fsdp_size:
            spec = [None] * len(shape)
            spec[ax] = "fsdp"
            return P(*spec)
    return P()


def state_sharding(state: Any, mesh: Mesh, min_size: int = 1 << 18):
    """Per-leaf NamedShardings for a TrainState (params, opt moments, EMA): array
    leaves follow `param_spec`; scalars and small tensors replicate."""
    fsdp_size = mesh.shape.get("fsdp", 1)

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, param_spec(shape, fsdp_size, min_size))

    return jax.tree.map(rule, state)


def shard_state(state: Any, mesh: Mesh, min_size: int = 1 << 18):
    return jax.device_put(state, state_sharding(state, mesh, min_size))


def batch_spec(ndim: int) -> P:
    return P("data", *([None] * (ndim - 1)))


def shard_train_batch(batch: Any, mesh: Mesh):
    """Batch-dim sharding for image-shaped leaves; small per-batch vectors (e.g. the
    GeoWizard domain one-hot) replicate."""
    data_size = mesh.shape.get("data", mesh.devices.size)

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 2 and x.shape[0] % data_size == 0:
            return jax.device_put(x, NamedSharding(mesh, batch_spec(x.ndim)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)
