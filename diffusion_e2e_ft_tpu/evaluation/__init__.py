"""Benchmark evaluation: the depth 10-metric harness (5 tar-datasets, least-squares
alignment) and the DSINE-style surface-normal harness (pooled angular errors over 4
datasets)."""

from diffusion_e2e_ft_tpu.evaluation import alignment, metrics

__all__ = ["metrics", "alignment"]
