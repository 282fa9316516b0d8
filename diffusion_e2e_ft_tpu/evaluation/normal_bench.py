"""Surface-normal benchmark runner (DSINE-style).

Capability parity: `/root/reference/DSINE/projects/dsine/test.py:30-135,150-236`:
iterate {nyuv2, scannet, ibims, sintel}, call the pipeline per image at native
resolution (processing_res=0), pool per-pixel angular errors over ALL pixels of ALL
images, compute mean/median/rmse + 5/7.5/11.25/22.5/30-degree thresholds, write
`metrics.txt`. GeoWizard runs get the per-dataset auto-domain.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

from diffusion_e2e_ft_tpu.data.normal_eval import (
    GEOWIZARD_DOMAINS,
    NormalEvalDataset,
    get_normal_dataset,
)
from diffusion_e2e_ft_tpu.evaluation import metrics as M

BENCHMARK_DATASETS = ("nyuv2", "scannet", "ibims", "sintel")


def evaluate_dataset(
    dataset: NormalEvalDataset,
    predict_fn: Callable[[np.ndarray, str], np.ndarray],
    # (rgb01 [H,W,3] float, domain) -> normal [H,W,3] in [-1,1]
    progress: bool = True,
) -> Dict[str, float]:
    """Pool per-pixel angular errors over the whole dataset."""
    domain = GEOWIZARD_DOMAINS[dataset.name]
    pooled: List[np.ndarray] = []
    n = len(dataset)
    for i in range(n):
        s = dataset[i]
        pred = np.asarray(predict_fn(s.img, domain), np.float32)
        if pred.shape != s.normal.shape:
            raise ValueError(
                f"prediction shape {pred.shape} != GT shape {s.normal.shape}"
            )
        err = M.normal_angular_error_deg(pred, s.normal)
        pooled.append(err[s.normal_mask])
        if progress and (i % 50 == 0 or i == n - 1):
            print(f"[normals] {dataset.name}: {i + 1}/{n}", flush=True)
    return M.normal_metrics(np.concatenate(pooled))


def run_benchmark(
    base_data_dir: str,
    predict_fn: Callable[[np.ndarray, str], np.ndarray],
    output_dir: str,
    datasets: Iterable[str] = BENCHMARK_DATASETS,
    split_paths: Optional[Dict[str, str]] = None,
) -> Dict[str, Dict[str, float]]:
    """Evaluate every benchmark dataset; write one metrics.txt per dataset."""
    os.makedirs(output_dir, exist_ok=True)
    all_results: Dict[str, Dict[str, float]] = {}
    for name in datasets:
        ds = get_normal_dataset(
            name, base_data_dir, (split_paths or {}).get(name)
        )
        results = evaluate_dataset(ds, predict_fn)
        all_results[name] = results
        with open(os.path.join(output_dir, f"{name}_metrics.txt"), "w") as f:
            header = " ".join(f"{k:>8}" for k in results)
            values = " ".join(f"{v:8.3f}" for v in results.values())
            f.write(header + "\n" + values + "\n")
    return all_results
