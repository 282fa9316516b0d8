"""Synthetic-fixture tests of the training datasets, transforms, and mixer."""

import os

import numpy as np
import pytest
from PIL import Image

from diffusion_e2e_ft_tpu.data import mixer as X
from diffusion_e2e_ft_tpu.data import train_datasets as T


class TestPostprocess:
    def test_quantile_normalization(self):
        rng = np.random.default_rng(0)
        depth = rng.uniform(1.0, 50.0, (32, 32))
        rgb = rng.random((32, 32, 3)).astype(np.float32)
        out = T.postprocess_sample(rgb, depth, None, 1e-5, 80.0, "outdoor")
        assert out["rgb"].min() >= -1 and out["rgb"].max() <= 1
        assert out["depth"].min() >= -1 and out["depth"].max() <= 1
        assert out["val_mask"].all()
        # metric depth clamped to [q02, q98]
        lo, hi = np.quantile(depth, 0.02), np.quantile(depth, 0.98)
        np.testing.assert_allclose(out["metric"].min(), lo, rtol=1e-5)
        np.testing.assert_allclose(out["metric"].max(), hi, rtol=1e-5)

    def test_invalid_to_far_plane(self):
        depth = np.full((16, 16), 5.0)
        depth[0, 0] = 0.0  # invalid (below near plane)
        rgb = np.zeros((16, 16, 3), np.float32)
        depth[1, :] = np.linspace(2, 8, 16)  # spread so q02 != q98
        out = T.postprocess_sample(rgb, depth, None, 1e-5, 80.0, "indoor")
        assert not out["val_mask"][0, 0]
        hi = np.quantile(depth[depth > 1e-5], 0.98)
        np.testing.assert_allclose(out["metric"][0, 0], hi, rtol=1e-5)

    def test_degenerate_constant_depth(self):
        depth = np.full((8, 8), 3.0)
        rgb = np.zeros((8, 8, 3), np.float32)
        out = T.postprocess_sample(rgb, depth, None, 1e-5, 80.0, "indoor")
        assert not out["val_mask"].any()
        assert (out["metric"] == 0).all()

    def test_all_invalid(self):
        depth = np.zeros((8, 8))
        rgb = np.zeros((8, 8, 3), np.float32)
        out = T.postprocess_sample(rgb, depth, None, 1e-5, 80.0, "indoor")
        assert not out["val_mask"].any()

    def test_normal_cleanup(self):
        rng = np.random.default_rng(1)
        depth = rng.uniform(1, 10, (8, 8))
        depth[0, 0] = 0.0
        depth[1, :] = np.linspace(1, 9, 8)
        rgb = np.zeros((8, 8, 3), np.float32)
        normal = rng.normal(size=(8, 8, 3)).astype(np.float32) * 3
        out = T.postprocess_sample(rgb, depth, normal, 1e-5, 80.0, "indoor")
        norms = np.linalg.norm(out["normals"], axis=-1)
        valid = out["val_mask"]
        np.testing.assert_allclose(norms[valid], 1.0, atol=1e-5)
        np.testing.assert_array_equal(out["normals"][0, 0], [0, 0, 0])


class TestGeometry:
    def test_kb_crop(self):
        img = np.zeros((375, 1242, 3))
        assert T.kb_crop(img).shape == (352, 1216, 3)
        assert T.kb_crop(img[..., 0]).shape == (352, 1216)

    def test_hflip_normal_x_inversion(self):
        rgb = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
        depth = np.ones((4, 4))
        normal = np.zeros((4, 4, 3), np.float32)
        normal[..., 0] = 0.5
        r, d, n = T._hflip(rgb, depth, normal)
        np.testing.assert_array_equal(r, rgb[:, ::-1])
        np.testing.assert_allclose(n[..., 0], -0.5)

    def test_align_normals_flips_away_facing(self):
        h, w = 8, 8
        depth = np.ones((h, w))
        # normals pointing AWAY from camera (+z, same side as points) get flipped
        normal = np.zeros((h, w, 3))
        normal[..., 2] = 1.0
        out = T.align_normals_to_camera(normal.copy(), depth, 100.0, 100.0, w / 2, h / 2)
        np.testing.assert_allclose(out[..., 2], -1.0)
        # normals already facing the camera are untouched
        out2 = T.align_normals_to_camera(out.copy(), depth, 100.0, 100.0, w / 2, h / 2)
        np.testing.assert_allclose(out2[..., 2], -1.0)


class _FakeDataset:
    """Deterministic tiny dataset standing in for Hypersim/VKITTI."""

    def __init__(self, n, h=16, w=16, domain="indoor", tag=0.0):
        self.n, self.h, self.w, self.domain, self.tag = n, h, w, domain, tag

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        depth = rng.uniform(1, 10, (self.h, self.w))
        s = T.postprocess_sample(
            np.full((self.h, self.w, 3), self.tag, np.float32),
            depth,
            rng.normal(size=(self.h, self.w, 3)).astype(np.float32),
            1e-5, 80.0, self.domain,
        )
        return s


class TestBatchAndMix:
    def test_collate_modalities(self):
        ds = _FakeDataset(4)
        samples = [ds[i] for i in range(2)]
        b = X.collate(samples, "depth")
        assert b["rgb"].shape == (2, 16, 16, 3)
        assert b["target"].shape == (2, 16, 16)
        b = X.collate(samples, "normals")
        assert b["target"].shape == (2, 16, 16, 3)
        b = X.collate(samples, "joint")
        assert b["depth_target"].shape == (2, 16, 16)
        assert b["normal_target"].shape == (2, 16, 16, 3)
        np.testing.assert_array_equal(b["domain"], [1, 0, 0])

    def test_batch_loader_drops_partial(self):
        dl = X.BatchLoader(_FakeDataset(10), batch_size=4, seed=0)
        batches = list(dl)
        assert len(batches) == 2 == len(dl)
        assert all(b["rgb"].shape[0] == 4 for b in batches)

    def test_mixed_loader_ratio(self):
        """90:10 nominal with a large and small source: schedule matches the
        reference's effective-fraction computation."""
        dl1 = X.BatchLoader(_FakeDataset(90, tag=1.0), batch_size=1, seed=0)
        dl2 = X.BatchLoader(_FakeDataset(40, tag=2.0), batch_size=1, seed=0)
        mixed = X.MixedLoader(dl1, dl2, 9, 1, seed=0)
        # frac1 = min(40/90*9, 1) = 1 -> 90 batches; frac2 = min(90/40/9,1)=0.25 -> 10
        assert len(mixed) == 100
        # rgb = tag*2-1: tag 1.0 -> 1.0, tag 2.0 -> 3.0
        tags = [float(b["rgb"][0, 0, 0, 0]) for b in mixed]
        assert tags.count(1.0) == 90 and tags.count(3.0) == 10

    def test_prefetcher_yields_same_batches(self):
        dl = X.BatchLoader(_FakeDataset(8), batch_size=2, seed=1)
        direct = [b["rgb"].sum() for b in dl]
        dl2 = X.BatchLoader(_FakeDataset(8), batch_size=2, seed=1)
        prefetched = [b["rgb"].sum() for b in X.Prefetcher(dl2)]
        np.testing.assert_allclose(sorted(direct), sorted(prefetched))

    def test_prefetcher_propagates_errors(self):
        class Boom:
            def __iter__(self):
                raise RuntimeError("boom")

            def __len__(self):
                return 0

        with pytest.raises(RuntimeError):
            list(X.Prefetcher(Boom()))


class TestVKITTIWalk:
    def test_directory_walk_and_sample(self, tmp_path):
        import cv2

        root = tmp_path
        scene, weather, cam = "Scene01", "morning", "Camera_0"
        rgb_dir = root / "vkitti_2.0.3_rgb" / scene / weather / "frames" / "rgb" / cam
        depth_dir = root / "vkitti_2.0.3_depth" / scene / weather / "frames" / "depth" / cam
        normal_dir = root / "vkitti_DAG_normals" / scene / weather / "frames" / "normal" / cam
        for d in (rgb_dir, depth_dir, normal_dir):
            d.mkdir(parents=True)
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(rgb_dir / "rgb_00001.jpg")
        depth_cm = rng.integers(100, 8000, (375, 1242)).astype(np.uint16)
        cv2.imwrite(str(depth_dir / "depth_00001.png"), depth_cm)
        normal = rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)
        Image.fromarray(normal).save(normal_dir / "normal_00001.png")

        ds = T.VirtualKITTI2(str(root), seed=0)
        assert len(ds) == 1
        s = ds[0]
        assert s["rgb"].shape == (352, 1216, 3)
        assert s["metric"].shape == (352, 1216)
        assert s["normals"].shape == (352, 1216, 3)
        assert s["domain"] == "outdoor"
        assert s["val_mask"].any()


class TestHypersim:
    def test_csv_pairs_and_sample(self, tmp_path):
        import pandas as pd

        root = tmp_path / "hypersim"
        scene, cam, frame = "ai_001_001", "cam_00", 0
        rgb_rel = f"{scene}/rgb/frame.0000.png"
        depth_rel = f"{scene}/depth/frame.0000.png"
        (root / "train" / scene / "rgb").mkdir(parents=True)
        (root / "train" / scene / "depth").mkdir(parents=True)
        normal_dir = root / "normals" / scene / "images" / f"scene_{cam}_geometry_preview"
        normal_dir.mkdir(parents=True)

        rng = np.random.default_rng(0)
        Image.fromarray(rng.integers(0, 255, (768, 1024, 3), dtype=np.uint8)).save(
            root / "train" / rgb_rel
        )
        depth_mm = rng.integers(500, 60000, (768, 1024)).astype(np.int32)
        Image.fromarray(depth_mm, mode="I").save(root / "train" / depth_rel)
        Image.fromarray(rng.integers(0, 255, (768, 1024, 3), dtype=np.uint8)).save(
            normal_dir / "frame.0000.normal_cam.png"
        )

        csv = tmp_path / "meta.csv"
        pd.DataFrame(
            [
                {
                    "rgb_path": rgb_rel,
                    "depth_path": depth_rel,
                    "scene_name": scene,
                    "camera_name": cam,
                    "frame_id": frame,
                    "included_in_public_release": True,
                    "split_partition_name": "train",
                }
            ]
        ).to_csv(csv, index=False)

        ds = T.Hypersim(str(root), split_csv=str(csv), seed=0)
        assert len(ds) == 1
        s = ds[0]
        assert s["rgb"].shape == (480, 640, 3)
        assert s["normals"].shape == (480, 640, 3)
        assert s["domain"] == "indoor"
        assert s["val_mask"].any()
