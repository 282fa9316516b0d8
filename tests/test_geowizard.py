import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_e2e_ft_tpu.models import clip as clip_models
from diffusion_e2e_ft_tpu.pipelines import GeoWizardPipeline
from diffusion_e2e_ft_tpu.pipelines.geowizard import domain_one_hot, switcher_embedding
from diffusion_e2e_ft_tpu.training import TrainConfig
from diffusion_e2e_ft_tpu.training.geowizard import GeoWizardTrainer, latent_valid_mask

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



@pytest.fixture(scope="module")
def pipe():
    return GeoWizardPipeline.from_random(jax.random.key(0))


def _img(h=96, w=128):
    return np.random.default_rng(0).integers(0, 255, (h, w, 3), dtype=np.uint8)


class TestSwitcher:
    def test_domain_one_hot(self):
        np.testing.assert_array_equal(domain_one_hot("indoor"), [1, 0, 0])
        np.testing.assert_array_equal(domain_one_hot("outdoor"), [0, 1, 0])
        np.testing.assert_array_equal(domain_one_hot("object"), [0, 0, 1])
        with pytest.raises(ValueError):
            domain_one_hot("space")

    def test_switcher_embedding_values(self):
        emb = np.asarray(switcher_embedding(domain_one_hot("indoor"), batch=2))
        assert emb.shape == (4, 10)
        # depth branch rows: sin([0,1]) ++ cos([0,1])
        np.testing.assert_allclose(emb[0, :4], [0, np.sin(1), 1, np.cos(1)], atol=1e-6)
        # normal branch rows: sin([1,0]) ++ cos([1,0])
        np.testing.assert_allclose(emb[2, :4], [np.sin(1), 0, np.cos(1), 1], atol=1e-6)
        # domain part identical across rows: sin([1,0,0]) ++ cos([1,0,0])
        np.testing.assert_allclose(
            emb[:, 4:], np.tile([np.sin(1), 0, 0, np.cos(1), 1, 1], (4, 1)), atol=1e-6
        )
        # batch ordering: first B rows = depth branch
        np.testing.assert_array_equal(emb[0], emb[1])
        np.testing.assert_array_equal(emb[2], emb[3])


class TestPipeline:
    def test_joint_inference(self, pipe):
        out = pipe(_img(), processing_res=64)
        assert out.depth_np.shape == (96, 128)
        assert out.normal_np.shape == (96, 128, 3)
        assert out.depth_np.min() >= 0 and out.depth_np.max() <= 1
        assert np.isfinite(out.depth_np).all() and np.isfinite(out.normal_np).all()
        assert out.depth_colored.dtype == np.uint8
        assert out.normal_colored.dtype == np.uint8

    def test_domains_change_output(self, pipe):
        a = pipe(_img(), processing_res=64, domain="indoor", color_map=None)
        b = pipe(_img(), processing_res=64, domain="outdoor", color_map=None)
        assert not np.allclose(a.depth_np, b.depth_np)

    def test_deterministic(self, pipe):
        a = pipe(_img(), processing_res=64, color_map=None)
        b = pipe(_img(), processing_res=64, color_map=None)
        np.testing.assert_array_equal(a.depth_np, b.depth_np)
        np.testing.assert_array_equal(a.normal_np, b.normal_np)

    def test_ensemble(self, pipe):
        out = pipe(
            _img(), processing_res=64, ensemble_size=2, noise="gaussian", seed=1, color_map=None
        )
        assert out.uncertainty is not None
        assert np.isfinite(out.depth_np).all()

    def test_multi_step(self, pipe):
        out = pipe(_img(), processing_res=64, denoising_steps=2, noise="gaussian", seed=1, color_map=None)
        assert np.isfinite(out.depth_np).all()


def _trainer_fixtures(e2e=True):
    pipe = GeoWizardPipeline.from_random(jax.random.key(0))
    cfg = TrainConfig(
        gradient_accumulation_steps=1, gradient_checkpointing=False,
        lr_warmup_steps=0, learning_rate=1e-3, e2e=e2e,
    )
    trainer = GeoWizardTrainer(
        cfg, pipe.unet, pipe.vae, pipe.params["vae"],
        pipe.image_encoder, pipe.params["image_encoder"],
    )
    state = trainer.init_state(pipe.params["unet"])
    rng = np.random.default_rng(0)
    b, h, w = 2, 64, 64
    n = rng.normal(size=(b, h, w, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # block-invalid mask (not per-pixel random): the 8x-pooled latent validity marks
    # a latent cell invalid if ANY of its 64 pixels is, so random pixel dropout
    # would zero the non-e2e diffusion loss entirely
    mask = np.ones((b, h, w), bool)
    mask[:, :16, :16] = False
    batch = {
        "rgb": jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)),
        "depth_target": jnp.asarray(rng.uniform(-1, 1, (b, h, w)).astype(np.float32)),
        "normal_target": jnp.asarray(n),
        "val_mask": jnp.asarray(mask),
        "domain": jnp.asarray([1.0, 0.0, 0.0]),
    }
    return trainer, state, batch


class TestTrainer:
    def test_e2e_joint_step(self):
        trainer, state, batch = _trainer_fixtures(e2e=True)
        s1, m = trainer.train_step(state, batch, jax.random.key(0))
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["loss_ssi"]))
        assert np.isfinite(float(m["loss_angular"]))
        assert float(m["loss"]) > 0
        assert int(s1.step) == 1

    def test_diffusion_loss_mode(self):
        trainer, state, batch = _trainer_fixtures(e2e=False)
        s1, m = trainer.train_step(state, batch, jax.random.key(0))
        assert np.isfinite(float(m["loss"]))
        assert float(m["loss"]) > 0


def test_latent_valid_mask():
    mask = np.ones((1, 16, 16), bool)
    out = np.asarray(latent_valid_mask(jnp.asarray(mask)))
    assert out.shape == (1, 2, 2)
    assert out.all()
    mask[0, 0, 0] = False  # one bad pixel invalidates its 8x8 latent cell
    out = np.asarray(latent_valid_mask(jnp.asarray(mask)))
    assert not out[0, 0, 0]
    assert out[0, 0, 1] and out[0, 1, 0] and out[0, 1, 1]
