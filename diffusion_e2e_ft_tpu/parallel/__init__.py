"""Device mesh construction and GSPMD sharding rules.

The reference's only parallelism is single-node DDP over NCCL
(`/root/reference/training/scripts/multi_gpu.yaml`, `training/train.py:255-260,369`).
Here data parallelism is GSPMD: a 1-D `Mesh(('data',))`, batch sharded over it,
parameters replicated; XLA inserts the gradient `psum` over ICI. An optional 'fsdp'
axis shards the optimizer+parameter state for larger-than-chip configurations.
"""

from diffusion_e2e_ft_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from diffusion_e2e_ft_tpu.parallel.sharding import (
    make_train_mesh,
    param_spec,
    shard_state,
    shard_train_batch,
    state_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "make_train_mesh",
    "param_spec",
    "state_sharding",
    "shard_state",
    "shard_train_batch",
]
