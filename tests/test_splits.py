"""Vendored benchmark split lists: every published metric's file membership must
resolve from the repo alone, with no archive present
(reference: /root/reference/Marigold/data_split/**, DSINE/data/datasets/*/split/)."""

import os

import pytest
import yaml

from diffusion_e2e_ft_tpu.data import splits
from diffusion_e2e_ft_tpu.data.depth_eval import DatasetMode, get_depth_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# curated membership counts = non-empty lines of the vendored lists (the files have
# no trailing newline, so `wc -l` under-reports each by one)
DEPTH_COUNTS = {
    "data_nyu_test.yaml": 654,
    "data_kitti_eigen_test.yaml": 652,  # 697 entries minus frames with GT 'None'
    "data_eth3d.yaml": 454,
    "data_scannet_val.yaml": 800,
    "data_diode_all.yaml": 771,
}


@pytest.mark.parametrize("cfg_name,count", sorted(DEPTH_COUNTS.items()))
def test_depth_dataset_resolves_curated_split_without_archive(cfg_name, count):
    with open(os.path.join(REPO, "config", "dataset", cfg_name)) as f:
        cfg = yaml.safe_load(f)
    # base_data_dir points nowhere: membership must come from the vendored list
    ds = get_depth_dataset(cfg, "/nonexistent", DatasetMode.RGB_ONLY)
    assert len(ds) == count


def test_train_split_lists_vendored():
    root = splits.data_split_root()
    with open(os.path.join(root, "hypersim", "filename_list_train_filtered.txt")) as f:
        assert sum(1 for line in f if line.strip()) == 53885
    with open(os.path.join(root, "vkitti", "vkitti_train.txt")) as f:
        assert sum(1 for line in f if line.strip()) == 20148


DSINE_COUNTS = {"nyuv2": 654, "scannet": 300, "ibims": 100, "sintel": 1064}


@pytest.mark.parametrize("name,count", sorted(DSINE_COUNTS.items()))
def test_dsine_splits_vendored(name, count):
    path = splits.dsine_split_path(name)
    assert path is not None and os.path.exists(path)
    with open(path) as f:
        assert sum(1 for line in f if line.strip()) == count


def test_resolve_split_path_prefers_existing_then_repo_root(tmp_path, monkeypatch):
    local = tmp_path / "mylist.txt"
    local.write_text("a\n")
    assert splits.resolve_split_path(str(local)) == str(local)
    # from a CWD where the relative path does NOT exist, fall back to the repo root
    monkeypatch.chdir(tmp_path)
    rel = "data_split/nyu/labeled/filename_list_test.txt"
    assert splits.resolve_split_path(rel) == os.path.join(REPO, rel)
