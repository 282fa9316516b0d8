"""Tests for the auxiliary component set: geometry utils, augmentations, baseline
normal losses, depth normalizer."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_e2e_ft_tpu.data import augmentations as A
from diffusion_e2e_ft_tpu.ops.depth_transform import NearFarMetricNormalizer
from diffusion_e2e_ft_tpu.training import normal_losses as NL
from diffusion_e2e_ft_tpu.utils import geometry as G


class TestGeometry:
    def test_intrins_from_fov(self):
        K = G.intrins_from_fov(60.0, 480, 640)
        assert K[0, 2] == 320 and K[1, 2] == 240
        assert K[0, 0] == K[1, 1] > 0

    def test_intrins_crop_scale(self):
        K = G.intrins_from_fov(60.0, 480, 640)
        Kc = G.intrins_crop(K, 10, 20)
        assert Kc[0, 2] == K[0, 2] - 10 and Kc[1, 2] == K[1, 2] - 20
        Ks = G.intrins_scale(K, 0.5, 0.25)
        assert Ks[0, 0] == K[0, 0] * 0.5 and Ks[1, 2] == K[1, 2] * 0.25

    def test_ray_array_center(self):
        K = G.intrins_from_fov(60.0, 8, 8)
        rays = G.ray_array(K, 8, 8)
        # center rays point along +z with tiny x/y
        assert abs(rays[4, 4, 0]) < 0.1 and rays[4, 4, 2] == 1.0
        unit = G.ray_array(K, 8, 8, normalize=True)
        np.testing.assert_allclose(np.linalg.norm(unit, axis=-1), 1.0, atol=1e-6)

    def test_unproject_depth(self):
        K = G.intrins_from_fov(90.0, 4, 4)
        pts = G.unproject_depth(np.full((4, 4), 2.0), K)
        np.testing.assert_allclose(pts[..., 2], 2.0, atol=1e-6)

    def test_rotations_orthonormal(self):
        for R in [
            G.rotation_euler(10, -20, 30),
            G.rotation_axis_angle([1, 1, 0], 45),
            G.quaternion_to_matrix([0.9, 0.1, 0.2, 0.3]),
        ]:
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
            np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)

    def test_euler_identity(self):
        np.testing.assert_allclose(G.rotation_euler(0, 0, 0), np.eye(3))

    def test_rotate_normals(self):
        R = G.rotation_euler(0, 0, 90)  # z-rotation maps x->y
        n = np.zeros((2, 2, 3))
        n[..., 0] = 1.0
        out = G.rotate_normals(n, R)
        np.testing.assert_allclose(out[..., 1], 1.0, atol=1e-10)

    def test_visualization(self):
        n = np.zeros((4, 4, 3), np.float32)
        n[..., 2] = 1.0
        rgb = G.normal_to_rgb(n, mask=np.ones((4, 4), bool))
        assert rgb.dtype == np.uint8 and rgb[0, 0, 2] == 255
        d = G.depth_to_rgb(np.linspace(0, 1, 16).reshape(4, 4))
        assert d.shape == (4, 4, 3) and d.dtype == np.uint8


class TestAugmentations:
    def _sample(self, h=32, w=48):
        rng = np.random.default_rng(0)
        n = rng.normal(size=(h, w, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        return {
            "img": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
            "normal": n,
            "normal_mask": np.ones((h, w), bool),
            "intrins": G.intrins_from_fov(60.0, h, w),
        }

    def test_benchmark_transform_only_floats(self):
        s = A.benchmark_transform()(self._sample(), np.random.default_rng(0))
        assert s["img"].dtype == np.float32
        assert s["img"].max() <= 1.0

    def test_resize_scales_intrinsics(self):
        s = A.ToFloat()(self._sample(), None)
        out = A.Resize(16, 24)(s, np.random.default_rng(0))
        assert out["img"].shape == (16, 24, 3)
        assert out["normal"].shape == (16, 24, 3)
        np.testing.assert_allclose(out["intrins"][0, 2], s["intrins"][0, 2] * 0.5)

    def test_hflip_corrects_normal_and_intrinsics(self):
        s = A.ToFloat()(self._sample(), None)
        flip = A.HorizontalFlip(p=1.0)
        out = flip(s, np.random.default_rng(0))
        np.testing.assert_allclose(out["img"], s["img"][:, ::-1])
        np.testing.assert_allclose(out["normal"][..., 0], -s["normal"][:, ::-1, 0])
        assert out["flipped"]
        # double flip restores
        out2 = flip(out, np.random.default_rng(0))
        np.testing.assert_allclose(out2["normal"], s["normal"], atol=1e-6)

    def test_crops(self):
        s = A.ToFloat()(self._sample(480, 640), None)
        out = A.NyuCrop()(s, np.random.default_rng(0))
        assert out["img"].shape == (426, 560, 3)
        out = A.RandomCrop(16, 16)(s, np.random.default_rng(0))
        assert out["img"].shape == (16, 16, 3)

    def test_photometric_stack_preserves_geometry(self):
        s = A.ToFloat()(self._sample(), None)
        rng = np.random.default_rng(0)
        pipeline = A.Compose(
            [A.ColorJitter(p=1.0), A.GaussianBlur(p=1.0), A.GaussianNoise(p=1.0), A.JpegCompression(p=1.0)]
        )
        out = pipeline(s, rng)
        assert out["img"].shape == s["img"].shape
        assert out["img"].min() >= 0 and out["img"].max() <= 1
        np.testing.assert_array_equal(out["normal"], s["normal"])  # labels untouched

    def test_normalize(self):
        s = A.ToFloat()(self._sample(), None)
        out = A.Normalize()(s, None)
        assert out["img"].dtype == np.float32
        assert abs(out["img"].mean()) < 5

    def test_rotation_warp(self):
        s = A.ToFloat()(self._sample(64, 64), None)
        out = A.RandomRotationWarp(max_deg=5.0, p=1.0)(s, np.random.default_rng(0))
        assert out["img"].shape == s["img"].shape
        assert out["normal"].shape == s["normal"].shape


class TestNormalLosses:
    def _data(self):
        rng = np.random.default_rng(0)
        t = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        t /= np.linalg.norm(t, axis=-1, keepdims=True)
        mask = rng.random((2, 8, 8)) > 0.3
        return jnp.asarray(t), jnp.asarray(mask)

    def test_zero_at_perfect(self):
        t, m = self._data()
        assert float(NL.l1_loss(t, t, m)) < 1e-6
        assert float(NL.l2_loss(t, t, m)) < 1e-6
        assert float(NL.angular_loss(t, t, m)) < 0.01

    def test_l1_l2_known(self):
        t = jnp.zeros((1, 2, 2, 3)).at[..., 2].set(1.0)
        p = jnp.zeros((1, 2, 2, 3)).at[..., 0].set(1.0)
        m = jnp.ones((1, 2, 2), bool)
        np.testing.assert_allclose(float(NL.l1_loss(p, t, m)), 2.0)
        np.testing.assert_allclose(float(NL.l2_loss(p, t, m)), 2.0)
        np.testing.assert_allclose(float(NL.angular_loss(p, t, m)), np.pi / 2, rtol=1e-4)

    def test_nll_confidence_ordering(self):
        """Higher kappa on a WRONG prediction must cost more than low kappa."""
        t = jnp.zeros((1, 2, 2, 3)).at[..., 2].set(1.0)
        p = jnp.zeros((1, 2, 2, 3)).at[..., 0].set(1.0)  # 90 degrees off
        m = jnp.ones((1, 2, 2), bool)
        hi = NL.nll_vonmises(p, jnp.full((1, 2, 2), 20.0), t, m)
        lo = NL.nll_vonmises(p, jnp.full((1, 2, 2), 1.0), t, m)
        assert float(hi) > float(lo)
        # and on a CORRECT prediction, high kappa is better
        hi_c = NL.nll_vonmises(t, jnp.full((1, 2, 2), 20.0), t, m)
        lo_c = NL.nll_vonmises(t, jnp.full((1, 2, 2), 1.0), t, m)
        assert float(hi_c) < float(lo_c)

    def test_registry(self):
        assert set(NL.LOSS_FUNCS) == {"l1", "l2", "al", "nll_vonmises"}


class TestNearFarNormalizer:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        depth = rng.uniform(2.0, 30.0, (32, 32)).astype(np.float32)
        norm = NearFarMetricNormalizer()
        out, d_min, d_max = norm(depth)
        assert out.min() >= -1 and out.max() <= 1
        # interior values round-trip exactly
        back = norm.denormalize(out, d_min, d_max)
        interior = (depth > d_min) & (depth < d_max)
        np.testing.assert_allclose(back[interior], depth[interior], rtol=1e-4)

    def test_empty(self):
        out, d_min, d_max = NearFarMetricNormalizer()(np.zeros((4, 4)))
        np.testing.assert_array_equal(out, 0.0)
