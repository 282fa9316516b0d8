"""Surface-normal evaluation dataset readers (DSINE benchmark layout).

Capability parity: the per-dataset `get_sample` plug-ins and split files of
`/root/reference/DSINE/data/datasets/{nyuv2,scannet,ibims,sintel,oasis,vkitti}` and
the `NormalDataset` wrapper (`/root/reference/DSINE/projects/baseline_normal/dataloader.py:15-144`).

Shared layout: each split line names `<scene>/<stem>_img.<ext>`; alongside it live
`<stem>_normal.png` (uint8, valid where the pixel sum > 0) or `<stem>_normal.exr`
(float, valid where the vector norm > 0.5) and `<stem>_intrins.npy`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

# domain the GeoWizard pipeline should use per benchmark (dsine/test.py:47-55)
GEOWIZARD_DOMAINS = {
    "nyuv2": "indoor",
    "scannet": "indoor",
    "ibims": "indoor",
    "sintel": "outdoor",
    "vkitti": "outdoor",
    "oasis": "object",
}

# normal GT storage format per benchmark
_EXR_DATASETS = {"ibims", "sintel"}
# vkitti stores 16-bit normal pngs (the D2NT output format); others are 8-bit
_PNG16_DATASETS = {"vkitti"}


@dataclasses.dataclass
class NormalSample:
    img: np.ndarray  # [H, W, 3] float32 in [0, 1]
    normal: Optional[np.ndarray]  # [H, W, 3] float32 in [-1, 1]
    normal_mask: Optional[np.ndarray]  # [H, W] bool
    intrins: Optional[np.ndarray]  # [3, 3]
    dataset_name: str
    scene_name: str
    img_name: str


class NormalEvalDataset:
    """Iterates benchmark samples from a `dsine_eval/<name>` directory + split file."""

    def __init__(
        self,
        name: str,
        dataset_dir: str,  # .../dsine_eval/<name>
        split_path: Optional[str] = None,
        load_normal: bool = True,
        load_intrins: bool = True,
    ):
        from diffusion_e2e_ft_tpu.data.splits import dsine_split_path

        self.name = name
        self.dataset_dir = dataset_dir
        self.load_normal = load_normal
        self.load_intrins = load_intrins
        # vendored curated split (data_split/dsine/<name>/split/*.txt) when present;
        # else a test.txt shipped next to the data
        split_path = dsine_split_path(name, split_path) or os.path.join(dataset_dir, "test.txt")
        with open(split_path) as f:
            self.sample_paths = [line.strip() for line in f if line.strip()]

    def __len__(self) -> int:
        return len(self.sample_paths)

    def __getitem__(self, index: int) -> NormalSample:
        import cv2

        rel = self.sample_paths[index]
        scene = rel.split("/")[0]
        stem, ext = rel.split("/")[1].split("_img")
        img_path = os.path.join(self.dataset_dir, rel)

        img = cv2.cvtColor(cv2.imread(img_path, cv2.IMREAD_UNCHANGED), cv2.COLOR_BGR2RGB)
        img = img.astype(np.float32) / 255.0

        normal = mask = None
        if self.load_normal:
            if self.name in _EXR_DATASETS:
                normal_path = img_path.replace("_img" + ext, "_normal.exr")
                normal = cv2.cvtColor(
                    cv2.imread(normal_path, cv2.IMREAD_UNCHANGED), cv2.COLOR_BGR2RGB
                ).astype(np.float32)
                mask = np.linalg.norm(normal, axis=2) > 0.5
            else:
                normal_path = img_path.replace("_img" + ext, "_normal.png")
                raw = cv2.cvtColor(
                    cv2.imread(normal_path, cv2.IMREAD_UNCHANGED), cv2.COLOR_BGR2RGB
                )
                mask = np.sum(raw, axis=2) > 0
                denom = 65535.0 if self.name in _PNG16_DATASETS else 255.0
                normal = raw.astype(np.float32) / denom * 2.0 - 1.0

        intrins = None
        if self.load_intrins:
            intrins_path = img_path.replace("_img" + ext, "_intrins.npy")
            if os.path.exists(intrins_path):
                intrins = np.load(intrins_path)

        return NormalSample(
            img=img,
            normal=normal,
            normal_mask=mask,
            intrins=intrins,
            dataset_name=self.name,
            scene_name=scene,
            img_name=stem,
        )

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def get_normal_dataset(
    name: str, base_data_dir: str, split_path: Optional[str] = None, **kw
) -> NormalEvalDataset:
    if name not in GEOWIZARD_DOMAINS:
        raise ValueError(f"Unknown normal benchmark: {name} (have {sorted(GEOWIZARD_DOMAINS)})")
    return NormalEvalDataset(
        name, os.path.join(base_data_dir, "dsine_eval", name), split_path, **kw
    )
