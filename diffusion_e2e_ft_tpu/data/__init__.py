"""Datasets: evaluation readers (5 depth benchmarks, 4 normal benchmarks) and the
Hypersim / VirtualKITTI2 training loaders with the 9:1 probabilistic mixer."""

from diffusion_e2e_ft_tpu.data.depth_eval import (
    DatasetMode,
    FileNameMode,
    get_depth_dataset,
    get_pred_name,
)

__all__ = ["DatasetMode", "FileNameMode", "get_depth_dataset", "get_pred_name"]
