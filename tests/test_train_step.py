import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_e2e_ft_tpu.models import (
    AutoencoderKL,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from diffusion_e2e_ft_tpu.parallel import make_mesh
from diffusion_e2e_ft_tpu.training import E2ETrainer, TrainConfig
from diffusion_e2e_ft_tpu.training.lr import iter_exponential_schedule

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



def make_models(in_channels=8):
    ucfg = UNetConfig.tiny(in_channels=in_channels)
    vcfg = VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4)
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vcfg)
    unet_params = unet.init(
        jax.random.key(0), jnp.ones((1, 8, 8, in_channels)), jnp.asarray(999), jnp.ones((1, 2, 32))
    )["params"]
    vae_params = vae.init(jax.random.key(1), jnp.ones((1, 64, 64, 3)))["params"]
    return unet, vae, unet_params, vae_params


def make_batch(b=2, h=64, w=64, modality="depth", seed=0):
    rng = np.random.default_rng(seed)
    batch = {
        "rgb": jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)),
        "val_mask": jnp.asarray(rng.random((b, h, w)) > 0.2),
    }
    if modality == "depth":
        batch["target"] = jnp.asarray(rng.uniform(-1, 1, (b, h, w)).astype(np.float32))
    else:
        n = rng.normal(size=(b, h, w, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        batch["target"] = jnp.asarray(n)
    return batch


class TestLRSchedule:
    def test_warmup_and_decay(self):
        s = iter_exponential_schedule(1.0, 1000, final_ratio=0.01, warmup_steps=100)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(50)), 0.5, rtol=1e-6)
        np.testing.assert_allclose(float(s(100)), 1.0, rtol=1e-5)
        np.testing.assert_allclose(float(s(1000)), 0.01, rtol=1e-5)
        np.testing.assert_allclose(float(s(5000)), 0.01, rtol=1e-5)
        # halfway through decay: exp(0.5 * ln(0.01)) = 0.1
        np.testing.assert_allclose(float(s(550)), 0.1, rtol=1e-4)


class TestTrainStep:
    @pytest.mark.parametrize("modality", ["depth", "normals"])
    def test_loss_decreases_params_change(self, modality):
        unet, vae, up, vp = make_models()
        cfg = TrainConfig(
            modality=modality,
            gradient_accumulation_steps=1,
            learning_rate=1e-3,
            lr_warmup_steps=0,
            gradient_checkpointing=False,
        )
        trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 32), np.float32))
        state = trainer.init_state(up)
        orig = jax.tree.map(np.asarray, up)  # host copy: train_step donates state
        batch = make_batch(modality=modality)
        s1, m1 = trainer.train_step(state, dict(batch), jax.random.key(0))
        assert np.isfinite(float(m1["loss"]))
        assert int(s1.step) == 1
        # params changed
        diff = jax.tree.map(lambda a, b: float(jnp.abs(np.asarray(a) - b).max()), s1.params, orig)
        assert max(jax.tree.leaves(diff)) > 0

    def test_grad_accumulation_steps_sync(self):
        unet, vae, up, vp = make_models()
        # lr_warmup_steps=0: with warmup the first synced update has lr=0 (matching
        # the reference schedule) and params would legitimately not move
        cfg = TrainConfig(gradient_accumulation_steps=2, gradient_checkpointing=False, lr_warmup_steps=0)
        trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 32), np.float32))
        state = trainer.init_state(up)
        orig = jax.tree.map(np.asarray, up)
        batch = make_batch()
        s1, _ = trainer.train_step(state, dict(batch), jax.random.key(0))
        assert int(s1.step) == 0  # not yet synced
        # params unchanged until the K-th micro step
        diff = max(
            jax.tree.leaves(
                jax.tree.map(lambda a, b: float(jnp.abs(np.asarray(a) - b).max()), s1.params, orig)
            )
        )
        assert diff == 0.0
        s2, _ = trainer.train_step(s1, make_batch(seed=1), jax.random.key(1))
        assert int(s2.step) == 1
        diff = max(
            jax.tree.leaves(
                jax.tree.map(lambda a, b: float(jnp.abs(np.asarray(a) - b).max()), s2.params, orig)
            )
        )
        assert diff > 0.0

    def test_all_invalid_mask_zero_loss_no_nan(self):
        unet, vae, up, vp = make_models()
        cfg = TrainConfig(gradient_accumulation_steps=1, gradient_checkpointing=False)
        trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 32), np.float32))
        state = trainer.init_state(up)
        batch = make_batch()
        batch["val_mask"] = jnp.zeros_like(batch["val_mask"])
        s1, m = trainer.train_step(state, batch, jax.random.key(0))
        assert float(m["loss"]) == 0.0
        assert all(np.isfinite(x).all() for x in jax.tree.leaves(s1.params))

    def test_raw_sd_mode_no_noise_concat(self):
        unet, vae, up, vp = make_models(in_channels=4)
        cfg = TrainConfig(noise_type=None, gradient_accumulation_steps=1, gradient_checkpointing=False)
        trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 32), np.float32))
        state = trainer.init_state(up)
        _, m = trainer.train_step(state, make_batch(), jax.random.key(0))
        assert np.isfinite(float(m["loss"]))

    def test_pyramid_noise_training(self):
        unet, vae, up, vp = make_models()
        cfg = TrainConfig(noise_type="pyramid", gradient_accumulation_steps=1, gradient_checkpointing=False)
        trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 32), np.float32))
        state = trainer.init_state(up)
        _, m = trainer.train_step(state, make_batch(), jax.random.key(0))
        assert np.isfinite(float(m["loss"]))

    def test_pyramid_octave_schedule_varies_per_step(self):
        """The reference redraws the pyramid octave scales every step
        (training/util/noise.py:8-18); the jitted bank+switch must reproduce
        per-step schedule variation, not one static schedule."""
        unet, vae, up, vp = make_models()
        cfg = TrainConfig(noise_type="pyramid", gradient_accumulation_steps=1, gradient_checkpointing=False)
        trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 32), np.float32))
        # the bank holds several DISTINCT octave-shape sequences at a real latent size
        from diffusion_e2e_ft_tpu.ops import noise as noise_ops

        seqs = {noise_ops._octave_sizes(60, 80, s) for s in trainer._pyramid_scale_bank}
        assert len(seqs) > 1
        # and the per-step random index actually selects different branches
        import jax.numpy as jnp

        @jax.jit
        def pick(key):
            idx_key, _ = jax.random.split(key)
            return jax.random.randint(idx_key, (), 0, len(trainer._pyramid_scale_bank))

        picks = {int(pick(jax.random.key(i))) for i in range(40)}
        assert len(picks) > 4
        # noise remains ~unit-std and differs across keys (different schedules/draws)
        n1 = trainer._make_noisy_latents(jax.random.key(1), (2, 60, 80, 4))
        n2 = trainer._make_noisy_latents(jax.random.key(2), (2, 60, 80, 4))
        assert abs(float(jnp.std(n1)) - 1.0) < 0.05
        assert float(jnp.abs(n1 - n2).max()) > 0.1

    def test_geowizard_pyramid_bank_uses_its_own_scale_range(self):
        from diffusion_e2e_ft_tpu.models import clip as clip_models
        from diffusion_e2e_ft_tpu.training.geowizard import GeoWizardTrainer

        unet, vae, up, vp = make_models()
        vis_cfg = clip_models.CLIPVisionConfig(
            hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
            image_size=224, patch_size=32, projection_dim=32,
        )
        enc = clip_models.CLIPVisionModelWithProjection(vis_cfg)
        ep = enc.init(jax.random.key(0), jnp.ones((1, 224, 224, 3)))["params"]
        cfg = TrainConfig(noise_type="pyramid", gradient_accumulation_steps=1, gradient_checkpointing=False)
        t = GeoWizardTrainer(cfg, unet, vae, vp, enc, ep)
        # r ~ U[1.5, 3] (train_depth_normal.py:290-292), not Marigold's U[2, 4]
        assert t._pyramid_scale_bank.min() >= 1.5
        assert t._pyramid_scale_bank.max() <= 3.0

    def test_ema(self):
        unet, vae, up, vp = make_models()
        cfg = TrainConfig(
            use_ema=True, gradient_accumulation_steps=1, gradient_checkpointing=False,
            learning_rate=1e-2, lr_warmup_steps=0,
        )
        trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 32), np.float32))
        state = trainer.init_state(up)
        orig = jax.tree.map(np.asarray, up)
        s1, _ = trainer.train_step(state, make_batch(), jax.random.key(0))
        assert s1.ema_params is not None
        # EMA moved toward new params but not equal to them
        d_ema = max(
            jax.tree.leaves(
                jax.tree.map(lambda a, b: float(jnp.abs(np.asarray(a) - b).max()), s1.ema_params, orig)
            )
        )
        assert d_ema > 0.0


class TestDataParallel:
    def test_sharded_step_on_virtual_mesh(self):
        """The full train step over an 8-device CPU mesh: batch sharded, params
        replicated, loss equals the single-device loss on the same global batch."""
        unet, vae, up, vp = make_models()
        cfg = TrainConfig(gradient_accumulation_steps=1, gradient_checkpointing=False)
        trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 32), np.float32))
        state = trainer.init_state(up)
        batch = make_batch(b=8)
        mesh = make_mesh()
        assert mesh.devices.size == 8
        # deep-copy: train_step donates its state, and device_put may alias buffers
        ref_state = jax.tree.map(lambda x: jnp.array(x), state)
        sstate, sbatch = trainer.shard(state, dict(batch), mesh)
        s1, m1 = trainer.train_step(sstate, sbatch, jax.random.key(0))
        loss_sharded = float(m1["loss"])  # materialize before dropping executables
        # two large grad-graph compiles back-to-back have segfaulted the XLA CPU
        # compiler in long processes; drop the sharded executable first
        jax.clear_caches()
        s1_ref, m1_ref = trainer.train_step(ref_state, dict(batch), jax.random.key(0))
        np.testing.assert_allclose(loss_sharded, float(m1_ref["loss"]), rtol=2e-4)


class TestFrozenParamsNotEmbedded:
    def test_module_size_independent_of_frozen_params(self):
        """Frozen VAE params must be jit ARGUMENTS, not closure constants: embedding
        them as HLO literals bloats the full-SD2 train module to ~340 MB, which the
        axon remote-compile tunnel rejects (HTTP 413). Guard: lowering the step with
        RANDOM (incompressible) frozen params must cost no more module bytes than
        with all-zeros params beyond a small slack."""
        unet, vae, up, vp_zero = make_models()
        vp_rand = jax.tree.map(
            lambda x: jax.random.normal(jax.random.key(7), x.shape, x.dtype), vp_zero
        )
        batch = make_batch(b=1)
        sizes = {}
        for tag, vp in (("zeros", jax.tree.map(jnp.zeros_like, vp_zero)), ("random", vp_rand)):
            cfg = TrainConfig(gradient_accumulation_steps=1, gradient_checkpointing=False)
            trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 32), np.float32))
            state = trainer.init_state(up)
            lowered = jax.jit(
                trainer._train_step_jit.__wrapped__, static_argnums=0, donate_argnums=1
            ).lower(trainer, state, batch, jax.random.key(0), trainer._frozen())
            sizes[tag] = len(lowered.compiler_ir("hlo").as_serialized_hlo_module_proto())
        # the tiny VAE is ~0.1 MB of params; embedded literals would add ~4x that
        # for the random tree vs the (run-length-encodable) zeros tree
        assert sizes["random"] <= sizes["zeros"] + 20_000, sizes
