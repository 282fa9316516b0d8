import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min

from diffusion_e2e_ft_tpu.models import UNet2DCondition, UNetConfig, AutoencoderKL, VAEConfig
from diffusion_e2e_ft_tpu.models import convert as C


def tiny_unet_params():
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    params = unet.init(
        jax.random.key(0), jnp.ones((1, 16, 16, 8)), jnp.asarray(999), jnp.ones((1, 2, 32))
    )["params"]
    return cfg, unet, params


class TestKeyMapping:
    def test_roundtrip_paths(self):
        cases = [
            ("down_blocks.0.resnets.1.conv1.weight", 4, ("down_blocks_0", "resnets_1", "conv1", "kernel")),
            ("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight", 2,
             ("down_blocks_0", "attentions_0", "transformer_blocks_0", "attn1", "to_q", "kernel")),
            ("down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight", 2,
             ("down_blocks_0", "attentions_0", "transformer_blocks_0", "ff", "net_0", "proj", "kernel")),
            ("mid_block.resnets.0.norm1.weight", 1, ("mid_block", "resnets_0", "norm1", "scale")),
            ("time_embedding.linear_1.bias", 1, ("time_embedding", "linear_1", "bias")),
            ("up_blocks.3.attentions.2.transformer_blocks.0.attn2.to_out.0.weight", 2,
             ("up_blocks_3", "attentions_2", "transformer_blocks_0", "attn2", "to_out_0", "kernel")),
            ("down_blocks.1.downsamplers.0.conv.weight", 4, ("down_blocks_1", "downsamplers_0", "conv", "kernel")),
        ]
        for key, ndim, path in cases:
            assert C.torch_key_to_flax_path(key, ndim) == path, key
            assert C.flax_path_to_torch_key(path) == key, path

    def test_vae_attn_aliases(self):
        assert C.torch_key_to_flax_path("mid_block.attentions.0.query.weight", 2) == (
            "mid_block", "attentions_0", "to_q", "kernel",
        )
        assert C.torch_key_to_flax_path("mid_block.attentions.0.proj_attn.weight", 2) == (
            "mid_block", "attentions_0", "to_out_0", "kernel",
        )


class TestStateDictRoundtrip:
    def test_unet_roundtrip(self):
        _, _, params = tiny_unet_params()
        sd = C.params_to_state_dict(params)
        back = C.state_dict_to_params(sd)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = jax.tree_util.tree_leaves_with_path(back)
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(sorted(flat_a, key=str), sorted(flat_b, key=str)):
            assert str(pa) == str(pb)
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    def test_canonical_hf_key_names_exist(self):
        """The exported key set must speak the diffusers dialect exactly."""
        _, _, params = tiny_unet_params()
        sd = C.params_to_state_dict(params)
        expected = [
            "conv_in.weight",
            "conv_in.bias",
            "time_embedding.linear_1.weight",
            "time_embedding.linear_2.weight",
            "down_blocks.0.resnets.0.norm1.weight",
            "down_blocks.0.resnets.0.conv1.weight",
            "down_blocks.0.resnets.0.time_emb_proj.weight",
            "down_blocks.0.attentions.0.proj_in.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.norm3.weight",
            "down_blocks.0.downsamplers.0.conv.weight",
            "mid_block.resnets.0.conv1.weight",
            "mid_block.attentions.0.transformer_blocks.0.attn1.to_v.weight",
            "up_blocks.0.resnets.2.conv_shortcut.weight",
            "up_blocks.1.upsamplers.0.conv.weight",
            "conv_norm_out.weight",
            "conv_out.weight",
        ]
        for k in expected:
            assert k in sd, f"missing {k}"

    def test_conv_kernel_layouts(self):
        _, _, params = tiny_unet_params()
        sd = C.params_to_state_dict(params)
        # torch conv layout: (out, in, kh, kw)
        assert sd["conv_in.weight"].shape == (32, 8, 3, 3)
        assert sd["conv_out.weight"].shape == (4, 32, 3, 3)
        back = C.state_dict_to_params(sd)
        # flax conv layout: (kh, kw, in, out)
        assert np.asarray(back["conv_in"]["kernel"]).shape == (3, 3, 8, 32)

    def test_vae_roundtrip(self):
        vae = AutoencoderKL(VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4))
        params = vae.init(jax.random.key(0), jnp.ones((1, 32, 32, 3)))["params"]
        sd = C.params_to_state_dict(params)
        for k in [
            "encoder.conv_in.weight",
            "encoder.down_blocks.0.resnets.0.norm1.weight",
            "encoder.down_blocks.0.downsamplers.0.conv.weight",
            "encoder.mid_block.attentions.0.to_q.weight",
            "encoder.mid_block.attentions.0.group_norm.weight",
            "encoder.conv_out.weight",
            "decoder.up_blocks.0.resnets.0.conv1.weight",
            "decoder.up_blocks.0.upsamplers.0.conv.weight",
            "quant_conv.weight",
            "post_quant_conv.weight",
        ]:
            assert k in sd, f"missing {k}"
        back = C.state_dict_to_params(sd)
        z = vae.apply({"params": back}, jnp.ones((1, 32, 32, 3)), method=vae.encode_mean)
        z0 = vae.apply({"params": params}, jnp.ones((1, 32, 32, 3)), method=vae.encode_mean)
        np.testing.assert_array_equal(np.asarray(z), np.asarray(z0))


class TestConvInSurgery:
    def test_replace_conv_in(self):
        """4->8 channel duplication halves weights and bias; a duplicated input then
        reproduces the original activations minus the bias halving effect."""
        cfg = UNetConfig.tiny(in_channels=4)
        unet = UNet2DCondition(cfg)
        params = unet.init(
            jax.random.key(0), jnp.ones((1, 16, 16, 4)), jnp.asarray(999), jnp.ones((1, 2, 32))
        )["params"]
        k0 = np.asarray(params["conv_in"]["kernel"])
        b0 = np.asarray(params["conv_in"]["bias"])
        new = C.replace_conv_in(params, repeat=2)
        k1 = np.asarray(new["conv_in"]["kernel"])
        b1 = np.asarray(new["conv_in"]["bias"])
        assert k1.shape == (3, 3, 8, k0.shape[-1])
        np.testing.assert_allclose(k1[:, :, :4, :], k0 / 2)
        np.testing.assert_allclose(k1[:, :, 4:, :], k0 / 2)
        np.testing.assert_allclose(b1, b0 / 2)
        # other params untouched
        np.testing.assert_array_equal(
            np.asarray(new["conv_out"]["kernel"]), np.asarray(params["conv_out"]["kernel"])
        )

    def test_surgered_params_run_in_8ch_model(self):
        cfg4 = UNetConfig.tiny(in_channels=4)
        cfg8 = UNetConfig.tiny(in_channels=8)
        unet4 = UNet2DCondition(cfg4)
        unet8 = UNet2DCondition(cfg8)
        params4 = unet4.init(
            jax.random.key(0), jnp.ones((1, 16, 16, 4)), jnp.asarray(999), jnp.ones((1, 2, 32))
        )["params"]
        params8 = C.replace_conv_in(params4, repeat=2)
        out = unet8.apply(
            {"params": params8}, jnp.ones((1, 16, 16, 8)), jnp.asarray(999), jnp.ones((1, 2, 32))
        )
        assert out.shape == (1, 16, 16, 4)


def test_save_load_state_dict(tmp_path):
    sd = {"a.weight": np.ones((2, 3), np.float32), "b.bias": np.zeros((5,), np.float32)}
    path = str(tmp_path / "model.safetensors")
    C.save_state_dict(sd, path)
    back = C.load_state_dict(path)
    assert set(back) == set(sd)
    np.testing.assert_array_equal(back["a.weight"], sd["a.weight"])
