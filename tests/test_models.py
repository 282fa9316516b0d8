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
from diffusion_e2e_ft_tpu.models.layers import timestep_embedding

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



def tiny_vae():
    return AutoencoderKL(
        VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4)
    )


class TestVAE:
    def test_encode_decode_shapes(self):
        vae = tiny_vae()
        x = jnp.ones((1, 64, 64, 3))
        params = vae.init(jax.random.key(0), x)
        z = vae.apply(params, x, method=vae.encode_mean)
        assert z.shape == (1, 8, 8, 4)
        moments = vae.apply(params, x, method=vae.encode_moments)
        assert moments.shape == (1, 8, 8, 8)
        out = vae.apply(params, z, method=vae.decode)
        assert out.shape == (1, 64, 64, 3)

    def test_encode_mean_is_first_half_of_moments(self):
        vae = tiny_vae()
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32)
        params = vae.init(jax.random.key(0), x)
        z = vae.apply(params, x, method=vae.encode_mean)
        moments = vae.apply(params, x, method=vae.encode_moments)
        np.testing.assert_array_equal(np.asarray(z), np.asarray(moments[..., :4]))

    def test_jit_roundtrip(self):
        vae = tiny_vae()
        x = jnp.ones((1, 32, 32, 3))
        params = vae.init(jax.random.key(0), x)
        out = jax.jit(lambda p, x: vae.apply(p, x))(params, x)
        assert out.shape == x.shape

    def test_odd_input_sizes(self):
        """Asymmetric downsample padding handles non-multiple-of-8 inputs like the
        reference VAE (floor conv arithmetic per stage: 60->30->15->7, 44->22->11->5)."""
        vae = tiny_vae()
        x = jnp.ones((1, 60, 44, 3))
        params = vae.init(jax.random.key(0), x)
        z = vae.apply(params, x, method=vae.encode_mean)
        assert z.shape == (1, 7, 5, 4)


class TestTimestepEmbedding:
    def test_shape_and_flip(self):
        t = jnp.asarray([0, 999])
        emb = timestep_embedding(t, 320)
        assert emb.shape == (2, 320)
        # flip_sin_to_cos=True => first half is cos => at t=0 all ones
        np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)

    def test_no_flip(self):
        t = jnp.asarray([0.0])
        emb = timestep_embedding(t, 8, flip_sin_to_cos=False)
        np.testing.assert_allclose(np.asarray(emb[0, :4]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(emb[0, 4:]), 1.0, atol=1e-6)


class TestUNet:
    def setup_method(self):
        self.cfg = UNetConfig.tiny()
        self.unet = UNet2DCondition(self.cfg)
        self.x = jnp.ones((1, 16, 16, 8))
        self.ctx = jnp.ones((1, 2, 32))
        self.params = self.unet.init(
            jax.random.key(0), self.x, jnp.asarray(999), self.ctx
        )

    def test_output_shape(self):
        out = self.unet.apply(self.params, self.x, jnp.asarray(999), self.ctx)
        assert out.shape == (1, 16, 16, 4)

    def test_jit_and_batch(self):
        x = jnp.ones((2, 16, 16, 8))
        ctx = jnp.ones((2, 2, 32))
        t = jnp.asarray([999, 999])
        out = jax.jit(self.unet.apply)(self.params, x, t, ctx)
        assert out.shape == (2, 16, 16, 4)

    def test_timestep_sensitivity(self):
        a = self.unet.apply(self.params, self.x, jnp.asarray(999), self.ctx)
        b = self.unet.apply(self.params, self.x, jnp.asarray(1), self.ctx)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_context_sensitivity(self):
        a = self.unet.apply(self.params, self.x, jnp.asarray(999), self.ctx)
        b = self.unet.apply(self.params, self.x, jnp.asarray(999), self.ctx * 2.0)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_param_count_sd2_config(self):
        """Full SD2 config must land at the known ~865M parameter count."""
        cfg = UNetConfig()  # SD2, 8-channel input
        unet = UNet2DCondition(cfg)
        x = jax.ShapeDtypeStruct((1, 8, 8, 8), jnp.float32)
        t = jax.ShapeDtypeStruct((1,), jnp.int32)
        ctx = jax.ShapeDtypeStruct((1, 2, 1024), jnp.float32)
        params = jax.eval_shape(unet.init, jax.random.key(0), x, t, ctx)
        n = sum(np.prod(l.shape) for l in jax.tree.leaves(params))
        # diffusers SD2 UNet with 8ch conv_in: 865,915,332 params
        assert abs(n - 865_915_332) / 865_915_332 < 0.001, f"got {n:,}"

    def test_class_labels_required_for_geowizard(self):
        cfg = UNetConfig.tiny(class_embed_proj_dim=10, joint_attention=True)
        unet = UNet2DCondition(cfg)
        x = jnp.ones((2, 16, 16, 8))
        ctx = jnp.ones((2, 2, 32))
        cls = jnp.ones((2, 10))
        params = unet.init(jax.random.key(0), x, jnp.asarray(999), ctx, cls)
        out = unet.apply(params, x, jnp.asarray(999), ctx, cls)
        assert out.shape == (2, 16, 16, 4)
        with pytest.raises(ValueError):
            unet.apply(params, x, jnp.asarray(999), ctx)

    def test_geowizard_joint_attention_couples_halves(self):
        """With joint attention, perturbing the normal half changes the depth half."""
        cfg = UNetConfig.tiny(class_embed_proj_dim=10, joint_attention=True)
        unet = UNet2DCondition(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
        ctx = jnp.ones((2, 2, 32))
        cls = jnp.ones((2, 10))
        params = unet.init(jax.random.key(0), x, jnp.asarray(999), ctx, cls)
        base = unet.apply(params, x, jnp.asarray(999), ctx, cls)
        x2 = x.at[1].add(1.0)  # perturb ONLY the second (normal) half
        out = unet.apply(params, x2, jnp.asarray(999), ctx, cls)
        # depth half (index 0) must change because its attention saw the other half
        assert not np.allclose(np.asarray(base[0]), np.asarray(out[0]))

    def test_no_joint_attention_keeps_halves_independent(self):
        cfg = UNetConfig.tiny()
        unet = UNet2DCondition(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
        ctx = jnp.ones((2, 2, 32))
        params = unet.init(jax.random.key(0), x, jnp.asarray(999), ctx)
        base = unet.apply(params, x, jnp.asarray(999), ctx)
        x2 = x.at[1].add(1.0)
        out = unet.apply(params, x2, jnp.asarray(999), ctx)
        np.testing.assert_allclose(np.asarray(base[0]), np.asarray(out[0]), atol=1e-5)
