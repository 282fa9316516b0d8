import jax.numpy as jnp
import numpy as np

from diffusion_e2e_ft_tpu.ops import ensemble as E


class TestMedianLower:
    def test_odd(self):
        x = jnp.asarray([[3.0], [1.0], [2.0]])
        np.testing.assert_array_equal(np.asarray(E._median_lower(x, 0)), [2.0])

    def test_even_takes_lower(self):
        x = jnp.asarray([[4.0], [1.0], [3.0], [2.0]])
        # numpy would give 2.5; torch semantics give 2.0
        np.testing.assert_array_equal(np.asarray(E._median_lower(x, 0)), [2.0])


class TestDepthEnsemble:
    def test_single_image_minmax(self):
        rng = np.random.default_rng(0)
        d = rng.uniform(2.0, 5.0, size=(1, 16, 16)).astype(np.float32)
        out, unc = E.ensemble_depths(d)
        assert out.min() == 0.0 and abs(out.max() - 1.0) < 1e-6
        np.testing.assert_array_equal(unc, 0.0)

    def test_affine_copies_align(self):
        """N affine transforms of one map must collapse to (nearly) the same output."""
        rng = np.random.default_rng(1)
        base = rng.uniform(0.0, 1.0, size=(16, 16)).astype(np.float32)
        stack = np.stack([2.0 * base + 1.0, 0.5 * base - 0.2, base])
        out, unc = E.ensemble_depths(stack)
        # output is a min-max normalized version of base
        ref = (base - base.min()) / (base.max() - base.min())
        np.testing.assert_allclose(out, ref, atol=0.05)
        assert unc.mean() < 0.05

    def test_mean_reduction(self):
        rng = np.random.default_rng(2)
        stack = rng.uniform(0, 1, size=(3, 8, 8)).astype(np.float32)
        out, unc = E.ensemble_depths(stack, reduction="mean")
        assert out.shape == (8, 8)
        assert np.isfinite(out).all() and np.isfinite(unc).all()

    def test_max_res_downsampling_path(self):
        rng = np.random.default_rng(3)
        stack = rng.uniform(0, 1, size=(2, 64, 64)).astype(np.float32)
        out, _ = E.ensemble_depths(stack, max_res=16)
        assert out.shape == (64, 64)  # alignment at low res, output at full res


class TestNormalEnsemble:
    def test_single_member_returned_normalized(self):
        rng = np.random.default_rng(4)
        n = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        out = E.ensemble_normals(jnp.asarray(n))
        ref = n[0] / (np.linalg.norm(n[0], axis=-1, keepdims=True) + 1e-5)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_picks_consensus_member(self):
        """Two nearly-identical members + one outlier: a consensus member wins."""
        base = np.zeros((4, 4, 3), np.float32)
        base[..., 2] = 1.0  # +z
        near = base.copy()
        near[..., 0] = 0.05
        outlier = np.zeros((4, 4, 3), np.float32)
        outlier[..., 0] = 1.0  # +x
        stack = np.stack([base, near, outlier])
        out = np.asarray(E.ensemble_normals(jnp.asarray(stack)))
        # must be one of the two consensus members (z-dominant), not the outlier
        assert out[0, 0, 2] > 0.9

    def test_output_is_unit_norm(self):
        rng = np.random.default_rng(5)
        n = rng.normal(size=(3, 8, 8, 3)).astype(np.float32)
        out = np.asarray(E.ensemble_normals(jnp.asarray(n)))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-3)
