import numpy as np
import pytest

from diffusion_e2e_ft_tpu.evaluation import alignment as A
from diffusion_e2e_ft_tpu.evaluation import metrics as M


def _torch_ref_absrel(pred, gt, mask):
    """Independent torch implementation for cross-checking masked averaging order."""
    import torch

    o = torch.from_numpy(pred)
    t = torch.from_numpy(gt)
    m = torch.from_numpy(mask)
    d = torch.abs(o - t) / t
    d[~m] = 0
    n = m.sum((-1, -2))
    return float((d.sum((-1, -2)) / n).mean())


class TestDepthMetrics:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.gt = rng.uniform(1.0, 10.0, (2, 16, 16)).astype(np.float32)
        self.pred = self.gt * rng.uniform(0.8, 1.2, (2, 16, 16)).astype(np.float32)
        self.mask = rng.random((2, 16, 16)) > 0.3

    def test_perfect_prediction(self):
        assert M.abs_relative_difference(self.gt, self.gt, self.mask) == 0.0
        assert M.rmse_linear(self.gt, self.gt, self.mask) == 0.0
        assert M.rmse_log(self.gt, self.gt, self.mask) == 0.0
        assert M.delta1_acc(self.gt, self.gt, self.mask) == 1.0
        assert M.i_rmse(self.gt, self.gt, self.mask) == 0.0
        assert abs(M.silog_rmse(self.gt, self.gt, self.mask)) < 1e-4

    def test_absrel_matches_torch_reference(self):
        ours = M.abs_relative_difference(self.pred, self.gt, self.mask)
        ref = _torch_ref_absrel(self.pred, self.gt, self.mask)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_known_values(self):
        gt = np.full((1, 4, 4), 2.0, np.float32)
        pred = np.full((1, 4, 4), 3.0, np.float32)
        np.testing.assert_allclose(M.abs_relative_difference(pred, gt), 0.5)
        np.testing.assert_allclose(M.squared_relative_difference(pred, gt), 0.5)
        np.testing.assert_allclose(M.rmse_linear(pred, gt), 1.0)
        np.testing.assert_allclose(M.log10(pred, gt), np.log10(3 / 2), rtol=1e-6)
        # ratio 1.5 < 1.5625 = 1.25^2: delta1 fails, delta2 passes
        assert M.delta1_acc(pred, gt) == 0.0
        assert M.delta2_acc(pred, gt) == 1.0
        np.testing.assert_allclose(M.i_rmse(pred, gt), 1 / 2 - 1 / 3, rtol=1e-5)

    def test_silog_scale_invariance(self):
        """silog is invariant to a global scale on the prediction."""
        a = M.silog_rmse(self.pred, self.gt, self.mask)
        b = M.silog_rmse(self.pred * 3.7, self.gt, self.mask)
        np.testing.assert_allclose(a, b, rtol=1e-3)

    def test_2d_inputs(self):
        v = M.abs_relative_difference(self.pred[0], self.gt[0], self.mask[0])
        assert np.isfinite(v)

    def test_all_metric_funcs_registered(self):
        assert len(M.DEPTH_METRIC_FUNCS) == 10
        for name, fn in M.DEPTH_METRIC_FUNCS.items():
            v = fn(self.pred, self.gt, self.mask)
            assert np.isfinite(v), name


class TestMetricTracker:
    def test_weighted_running_average(self):
        t = M.MetricTracker("a", "b")
        t.update("a", 1.0)
        t.update("a", 3.0)
        assert t.avg("a") == 2.0
        t.update("b", 2.0, n=3)
        t.update("b", 6.0, n=1)
        assert t.avg("b") == 3.0
        assert t.result() == {"a": 2.0, "b": 3.0}
        t.reset()
        assert t.avg("a") == 0.0


class TestAlignment:
    def test_recovers_affine_transform(self):
        rng = np.random.default_rng(1)
        gt = rng.uniform(1, 10, (32, 32)).astype(np.float32)
        pred = (gt - 2.0) / 5.0  # affine-invariant prediction
        mask = np.ones_like(gt, bool)
        aligned, scale, shift = A.align_depth_least_square(gt, pred, mask)
        np.testing.assert_allclose(scale, 5.0, rtol=1e-4)
        np.testing.assert_allclose(shift, 2.0, rtol=1e-4)
        np.testing.assert_allclose(aligned, gt, rtol=1e-4)

    def test_masked_pixels_ignored(self):
        rng = np.random.default_rng(2)
        gt = rng.uniform(1, 10, (16, 16)).astype(np.float32)
        pred = 2.0 * gt + 1.0
        gt_corrupt = gt.copy()
        gt_corrupt[0, :] = 1000.0  # invalid rows
        mask = np.ones_like(gt, bool)
        mask[0, :] = False
        aligned, scale, shift = A.align_depth_least_square(gt_corrupt, pred, mask)
        np.testing.assert_allclose(scale, 0.5, rtol=1e-4)

    def test_max_resolution_downsample(self):
        rng = np.random.default_rng(3)
        gt = rng.uniform(1, 10, (64, 64)).astype(np.float32)
        pred = gt * 0.25 - 1.0
        mask = np.ones_like(gt, bool)
        aligned, scale, shift = A.align_depth_least_square(gt, pred, mask, max_resolution=16)
        assert aligned.shape == gt.shape
        np.testing.assert_allclose(scale, 4.0, rtol=0.05)

    def test_disparity_roundtrip(self):
        d = np.asarray([0.0, 0.5, 2.0], np.float32)
        disp, mask = A.depth2disparity(d, return_mask=True)
        np.testing.assert_array_equal(mask, [False, True, True])
        np.testing.assert_allclose(disp, [0.0, 2.0, 0.5])
        np.testing.assert_allclose(A.disparity2depth(disp), d)


class TestNormalMetrics:
    def test_angular_error(self):
        a = np.zeros((4, 4, 3), np.float32)
        b = np.zeros((4, 4, 3), np.float32)
        a[..., 2] = 1.0
        b[..., 0] = 1.0
        err = M.normal_angular_error_deg(a, b)
        np.testing.assert_allclose(err, 90.0, atol=1e-4)
        np.testing.assert_allclose(M.normal_angular_error_deg(a, a), 0.0, atol=0.2)

    def test_pooled_metrics(self):
        errors = np.array([0.0, 4.0, 10.0, 20.0, 40.0], np.float32)
        m = M.normal_metrics(errors)
        np.testing.assert_allclose(m["mean"], np.mean(errors))
        np.testing.assert_allclose(m["median"], 10.0)
        np.testing.assert_allclose(m["a1"], 40.0)  # <5 deg: 2 of 5
        assert m["a3"] == 100.0 * 3 / 5  # <11.25 deg: 0, 4, 10
        assert m["a4"] == 100.0 * 4 / 5
        assert m["a5"] == 100.0 * 4 / 5
