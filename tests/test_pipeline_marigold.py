import jax
import numpy as np
import pytest

from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



@pytest.fixture(scope="module")
def pipe():
    return MarigoldPipeline.from_random(jax.random.key(0))


def _img(h=96, w=128):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


class TestDepth:
    def test_single_step_defaults(self, pipe):
        out = pipe(_img(), processing_res=64)
        assert out.depth_np.shape == (96, 128)  # matched back to input res
        assert out.depth_np.min() >= 0.0 and out.depth_np.max() <= 1.0
        assert np.isfinite(out.depth_np).all()
        assert out.depth_colored.shape == (96, 128, 3)
        assert out.depth_colored.dtype == np.uint8
        assert out.uncertainty is None

    def test_no_match_input_res(self, pipe):
        out = pipe(_img(), processing_res=64, match_input_res=False)
        assert out.depth_np.shape == (48, 64)

    def test_processing_res_zero_keeps_size(self, pipe):
        out = pipe(_img(64, 64), processing_res=0)
        assert out.depth_np.shape == (64, 64)

    def test_deterministic_zeros_noise(self, pipe):
        a = pipe(_img(), processing_res=64, color_map=None)
        b = pipe(_img(), processing_res=64, color_map=None)
        np.testing.assert_array_equal(a.depth_np, b.depth_np)

    def test_multi_step(self, pipe):
        out = pipe(_img(), processing_res=64, denoising_steps=4, noise="gaussian", seed=1)
        assert np.isfinite(out.depth_np).all()

    def test_ensemble(self, pipe):
        out = pipe(
            _img(), processing_res=64, ensemble_size=3, noise="gaussian", seed=1, color_map=None
        )
        assert out.depth_np.shape == (96, 128)
        assert out.uncertainty is not None
        assert np.isfinite(out.depth_np).all()

    def test_ensemble_tail_batch_padded_to_one_shape(self, pipe, monkeypatch):
        """ensemble 3 / batch 2 must NOT compile a second ragged-batch graph: the
        tail is padded to the batch size and sliced after."""
        shapes = []
        orig = pipe._infer_jit

        def spy(params, rgb, steps, normals, latents, key):
            shapes.append(rgb.shape[0])
            return orig(params, rgb, steps, normals, latents, key)

        monkeypatch.setattr(pipe, "_infer_jit", spy)
        out = pipe(
            _img(), processing_res=64, ensemble_size=3, batch_size=2,
            noise="gaussian", seed=1, color_map=None,
        )
        assert shapes == [2, 2]  # two invocations, ONE batch shape
        assert out.depth_np.shape == (96, 128)
        assert np.isfinite(out.depth_np).all()

    def test_seed_reproducible_gaussian(self, pipe):
        a = pipe(_img(), processing_res=64, noise="gaussian", seed=7, color_map=None)
        b = pipe(_img(), processing_res=64, noise="gaussian", seed=7, color_map=None)
        np.testing.assert_array_equal(a.depth_np, b.depth_np)
        c = pipe(_img(), processing_res=64, noise="gaussian", seed=8, color_map=None)
        assert not np.array_equal(a.depth_np, c.depth_np)

    def test_pyramid_noise(self, pipe):
        out = pipe(_img(), processing_res=64, noise="pyramid", seed=1, color_map=None)
        assert np.isfinite(out.depth_np).all()

    def test_bad_args(self, pipe):
        with pytest.raises(ValueError):
            pipe(_img(), denoising_steps=0)
        with pytest.raises(ValueError):
            pipe(_img(), ensemble_size=0)
        with pytest.raises(ValueError):
            pipe(np.zeros((4, 4), np.uint8))


class TestNormals:
    def test_single_step(self, pipe):
        out = pipe(_img(), processing_res=64, normals=True)
        assert out.normal_np.shape == (96, 128, 3)
        norms = np.linalg.norm(out.normal_np, axis=-1)
        assert np.all(norms <= 1.0 + 1e-4)
        assert out.normal_colored.dtype == np.uint8
        assert out.depth_np is None

    def test_ensemble_normals(self, pipe):
        out = pipe(
            _img(), processing_res=64, normals=True, ensemble_size=2, noise="gaussian", seed=1
        )
        assert out.normal_np.shape == (96, 128, 3)
        assert np.isfinite(out.normal_np).all()


class TestMeshInference:
    def test_ensemble_sharded_over_mesh_matches_single_device(self):
        """Multi-chip ensemble parallelism: same DEVICE outputs as the unsharded
        pipeline. The comparison happens at the per-member prediction boundary —
        downstream scipy-BFGS ensembling (max_iter=2) chaotically amplifies ~1e-6
        reduction-reorder noise into ~1e-2 output differences, so comparing the
        ensembled map would test BFGS sensitivity, not sharding correctness."""
        import jax.numpy as jnp

        from diffusion_e2e_ft_tpu.ops import image as im
        from diffusion_e2e_ft_tpu.ops import noise as noise_ops
        from diffusion_e2e_ft_tpu.parallel import make_mesh

        img = _img()
        ref_pipe = MarigoldPipeline.from_random(jax.random.key(0))
        mesh_pipe = MarigoldPipeline.from_random(jax.random.key(0)).with_mesh(make_mesh())

        rgb = im.normalize_rgb(im.resize_max_res(jnp.asarray(img, jnp.float32), 64))[None]
        h8, w8 = rgb.shape[1] // 8, rgb.shape[2] // 8
        key = jax.random.key(3)
        keys = jax.random.split(key, 9)[1:]
        lat = jnp.concatenate(
            [noise_ops.make_noise("gaussian", k, (1, h8, w8, 4), jnp.float32) for k in keys],
            axis=0,
        )
        brgb = jnp.broadcast_to(rgb, (8,) + rgb.shape[1:])
        a = np.asarray(
            ref_pipe._infer_jit(ref_pipe.params, brgb, 1, False, lat, jax.random.fold_in(key, 0))
        )
        rb, lb = mesh_pipe._place_batch(brgb, lat)
        b = np.asarray(
            mesh_pipe._infer_jit(mesh_pipe.params, rb, 1, False, lb, jax.random.fold_in(key, 0))
        )
        np.testing.assert_allclose(a, b, atol=3e-4)

        # and the full host path (incl. ensembling) still runs end-to-end sharded
        out = mesh_pipe(
            img, processing_res=64, ensemble_size=8, noise="gaussian", seed=3,
            batch_size=8, color_map=None,
        )
        assert out.depth_np.shape == img.shape[:2]
        assert np.isfinite(out.depth_np).all() and out.uncertainty is not None


class TestSchedulerTypes:
    def test_ddpm_multi_step(self):
        """DDPM ancestral sampling path: finite, seed-reproducible, differs from DDIM."""
        import jax as _jax

        pipe_ddim = MarigoldPipeline.from_random(_jax.random.key(0))
        pipe_ddpm = MarigoldPipeline.from_random(_jax.random.key(0))
        pipe_ddpm.scheduler_type = "ddpm"
        img = _img()
        a = pipe_ddpm(img, processing_res=64, denoising_steps=3, noise="gaussian", seed=5, color_map=None)
        b = pipe_ddpm(img, processing_res=64, denoising_steps=3, noise="gaussian", seed=5, color_map=None)
        np.testing.assert_array_equal(a.depth_np, b.depth_np)
        c = pipe_ddim(img, processing_res=64, denoising_steps=3, noise="gaussian", seed=5, color_map=None)
        assert not np.array_equal(a.depth_np, c.depth_np)
        assert np.isfinite(a.depth_np).all()

    def test_single_step_identical_across_types(self):
        """1-step output is the x0 estimate: DDIM == DDPM."""
        pipe = MarigoldPipeline.from_random(jax.random.key(0))
        img = _img()
        a = pipe(img, processing_res=64, color_map=None)
        pipe.scheduler_type = "ddpm"
        b = pipe(img, processing_res=64, color_map=None)
        np.testing.assert_allclose(a.depth_np, b.depth_np, atol=1e-6)


def test_find_batch_size():
    assert MarigoldPipeline.find_batch_size(1, 768) == 1
    assert MarigoldPipeline.find_batch_size(10, 768) == 4
    assert MarigoldPipeline.find_batch_size(10, 512) == 8
    assert MarigoldPipeline.find_batch_size(10, 1024) == 2


class TestMappedBatchEquivalence:
    def test_batched_members_match_single_member_calls(self, pipe):
        """batch>1 routes members through the batch-1 graph via lax.map (the
        batched full-res conv+GN graph costs ~1.8x per image on TPU, PERF.md);
        the mapped path must return exactly what per-member batch-1 calls do."""
        import jax.numpy as jnp

        from diffusion_e2e_ft_tpu.ops import image as im
        from diffusion_e2e_ft_tpu.ops import noise as noise_ops

        img = _img()
        rgb = im.normalize_rgb(im.resize_max_res(jnp.asarray(img, jnp.float32), 64))[None]
        h8, w8 = rgb.shape[1] // 8, rgb.shape[2] // 8
        keys = jax.random.split(jax.random.key(5), 3)
        lats = [noise_ops.make_noise("gaussian", k, (1, h8, w8, 4), jnp.float32) for k in keys]
        batched = pipe._infer_jit(
            pipe.params, jnp.broadcast_to(rgb, (3,) + rgb.shape[1:]), 1, False,
            jnp.concatenate(lats, axis=0),
        )
        singles = [pipe._infer_jit(pipe.params, rgb, 1, False, lat)[0] for lat in lats]
        np.testing.assert_allclose(
            np.asarray(batched), np.stack([np.asarray(s) for s in singles]), atol=1e-5
        )
