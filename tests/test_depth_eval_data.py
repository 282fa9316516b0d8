"""Synthetic-fixture tests of the tar-backed depth evaluation dataset readers."""

import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from diffusion_e2e_ft_tpu.data import depth_eval as D


def _png_bytes(arr, mode=None):
    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


def _add(tar, name, data):
    info = tarfile.TarInfo("./" + name)
    info.size = len(data)
    tar.addfile(info, io.BytesIO(data))


@pytest.fixture
def nyu_tar(tmp_path):
    """A 2-sample NYU-style tar: rgb pngs + uint16 depth (mm) + filename list."""
    tar_path = str(tmp_path / "nyu.tar")
    rng = np.random.default_rng(0)
    names = []
    with tarfile.open(tar_path, "w") as tar:
        for i in range(2):
            rgb = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
            depth_mm = rng.integers(500, 9000, (480, 640), dtype=np.uint16)
            rgb_name = f"rgb_{i:05d}.png"
            depth_name = f"depth_{i:05d}.png"
            _add(tar, rgb_name, _png_bytes(rgb))
            _add(tar, depth_name, _png_bytes(depth_mm, mode="I;16"))
            names.append((rgb_name, depth_name, depth_name))
    list_path = str(tmp_path / "list.txt")
    with open(list_path, "w") as f:
        for r, d, fd in names:
            f.write(f"{r} {d} {fd}\n")
    return tar_path, list_path


class TestNYU:
    def test_eval_mode(self, nyu_tar):
        tar_path, list_path = nyu_tar
        ds = D.DepthEvalDataset(D.SPECS["nyu_v2"], tar_path, list_path)
        assert len(ds) == 2
        s = ds[0]
        assert s["rgb_int"].shape == (480, 640, 3)
        assert s["depth_raw_linear"].shape == (480, 640)
        # depth decoded mm -> m
        assert 0.4 < s["depth_raw_linear"].min() and s["depth_raw_linear"].max() < 10.0
        # eigen crop zeroes the border
        assert not s["valid_mask_raw"][:45].any()
        assert not s["valid_mask_raw"][:, :41].any()
        assert s["valid_mask_raw"][100:400, 100:500].any()

    def test_rgb_only_mode(self, nyu_tar):
        tar_path, list_path = nyu_tar
        ds = D.DepthEvalDataset(D.SPECS["nyu_v2"], tar_path, list_path, D.DatasetMode.RGB_ONLY)
        s = ds[0]
        assert "depth_raw_linear" not in s
        assert s["rgb_int"].dtype == np.uint8

    def test_pred_name(self, nyu_tar):
        tar_path, list_path = nyu_tar
        ds = D.DepthEvalDataset(D.SPECS["nyu_v2"], tar_path, list_path)
        assert ds.pred_name(0, ".npy") == "pred_00000.npy"


class TestKITTI:
    def test_kb_crop_and_none_filter(self, tmp_path):
        rng = np.random.default_rng(1)
        tar_path = str(tmp_path / "kitti.tar")
        with tarfile.open(tar_path, "w") as tar:
            rgb = rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)
            depth = rng.integers(0, 256 * 80, (375, 1242), dtype=np.uint16)
            _add(tar, "img_0.png", _png_bytes(rgb))
            _add(tar, "d_0.png", _png_bytes(depth, mode="I;16"))
        list_path = str(tmp_path / "list.txt")
        with open(list_path, "w") as f:
            f.write("img_0.png d_0.png\n")
            f.write("img_1.png None\n")  # must be filtered
        ds = D.DepthEvalDataset(D.SPECS["kitti"], tar_path, list_path)
        assert len(ds) == 1
        s = ds[0]
        assert s["rgb_int"].shape == (352, 1216, 3)
        assert s["depth_raw_linear"].shape == (352, 1216)
        # eigen kitti crop: top third invalid
        assert not s["valid_mask_raw"][:116].any()

    def test_kb_crop_geometry(self):
        img = np.arange(375 * 1242).reshape(375, 1242)
        out = D.kitti_benchmark_crop(img)
        assert out.shape == (352, 1216)
        # bottom-aligned, horizontally centered
        np.testing.assert_array_equal(out[-1], img[-1, 13 : 13 + 1216])


class TestETH3D:
    def test_raw_binary_depth(self, tmp_path):
        h, w = 4032, 6048
        rng = np.random.default_rng(2)
        depth = rng.uniform(0.5, 50.0, (h, w)).astype(np.float32)
        depth[0, :100] = np.inf  # infinities -> 0
        ddir = tmp_path / "eth3d"
        ddir.mkdir()
        (ddir / "d_0.bin").write_bytes(depth.tobytes())
        rgb = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(ddir / "img_0.png")
        list_path = str(tmp_path / "list.txt")
        with open(list_path, "w") as f:
            f.write("img_0.png d_0.bin\n")
        ds = D.DepthEvalDataset(D.SPECS["eth3d"], str(ddir), list_path)
        s = ds[0]
        assert s["depth_raw_linear"].shape == (h, w)
        assert (s["depth_raw_linear"][0, :100] == 0).all()
        assert not s["valid_mask_raw"][0, :100].any()


class TestDIODE:
    def test_npy_depth_and_mask(self, tmp_path):
        rng = np.random.default_rng(3)
        ddir = tmp_path / "diode"
        ddir.mkdir()
        rgb = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(ddir / "img_0.png")
        depth = rng.uniform(1, 100, (32, 32, 1)).astype(np.float32)
        np.save(ddir / "d_0.npy", depth)
        mask = (rng.random((32, 32)) > 0.5).astype(np.float32)
        np.save(ddir / "m_0.npy", mask)
        list_path = str(tmp_path / "list.txt")
        with open(list_path, "w") as f:
            f.write("img_0.png d_0.npy m_0.npy\n")
        ds = D.DepthEvalDataset(D.SPECS["diode"], str(ddir), list_path)
        s = ds[0]
        assert s["depth_raw_linear"].shape == (32, 32)
        np.testing.assert_array_equal(s["valid_mask_raw"], mask.astype(bool))


def test_get_pred_name_modes():
    assert D.get_pred_name("rgb_00001.png", D.FileNameMode.rgb_id) == "pred_00001.png"
    assert D.get_pred_name("x.png", D.FileNameMode.id, ".npy") == "pred_x.npy"
    assert D.get_pred_name("1_d_2_rgb.png", D.FileNameMode.i_d_rgb) == "1_d_2_pred.png"
    assert D.get_pred_name("rgb_a_b.png", D.FileNameMode.rgb_i_d) == "pred_a_b.png"


def test_registry():
    assert set(D.SPECS) == {"nyu_v2", "kitti", "eth3d", "scannet", "diode"}
    with pytest.raises(ValueError):
        D.get_depth_dataset({"name": "bogus", "dir": "x", "filenames": "y"}, ".")
