"""Parity of our Flax CLIP encoders against HuggingFace transformers (torch CPU),
including weight conversion — validates the exact path used to load the published
checkpoints' text/image encoders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_e2e_ft_tpu.models import clip as C
from diffusion_e2e_ft_tpu.models.convert import clip_state_dict_to_params

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



def _torch_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestTextParity:
    @pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
    def test_tiny_text_model(self, act):
        from transformers import CLIPTextConfig as HFTextConfig
        from transformers import CLIPTextModel as HFTextModel

        hf_cfg = HFTextConfig(
            vocab_size=100,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=16,
            hidden_act=act,
        )
        torch.manual_seed(0)
        hf = HFTextModel(hf_cfg).eval()
        ids = np.array([[49406 % 100, 5, 7, 49407 % 100]], np.int64) % 100
        with torch.no_grad():
            ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

        ours = C.CLIPTextModel(
            C.CLIPTextConfig(
                vocab_size=100, hidden_size=32, intermediate_size=64, num_layers=2,
                num_heads=4, max_position_embeddings=16, hidden_act=act,
            )
        )
        params = clip_state_dict_to_params(_torch_sd(hf))
        out = ours.apply({"params": params}, jnp.asarray(ids.astype(np.int32)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


class TestVisionParity:
    def test_tiny_vision_model_with_projection(self):
        from transformers import CLIPVisionConfig as HFVisionConfig
        from transformers import CLIPVisionModelWithProjection as HFVisionModel

        hf_cfg = HFVisionConfig(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=28,
            patch_size=14,
            projection_dim=24,
            hidden_act="quick_gelu",
        )
        torch.manual_seed(0)
        hf = HFVisionModel(hf_cfg).eval()
        rng = np.random.default_rng(0)
        pix = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.from_numpy(pix)).image_embeds.numpy()

        ours = C.CLIPVisionModelWithProjection(
            C.CLIPVisionConfig(
                hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
                image_size=28, patch_size=14, projection_dim=24, hidden_act="quick_gelu",
            )
        )
        params = clip_state_dict_to_params(_torch_sd(hf))
        out = ours.apply({"params": params}, jnp.asarray(np.moveaxis(pix, 1, -1)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_empty_prompt_ids():
    ids = C.empty_prompt_ids()
    np.testing.assert_array_equal(ids, [[49406, 49407]])
    padded = C.empty_prompt_ids(pad_to=77)
    assert padded.shape == (1, 77)
    assert padded[0, -1] == 49407


def test_clip_preprocess_shape_and_range():
    imgs = jnp.ones((2, 64, 48, 3)) * 0.5
    out = C.clip_preprocess(imgs)
    assert out.shape == (2, 224, 224, 3)
    # 0.5 normalized: (0.5 - mean)/std
    expect = (0.5 - np.array(C.CLIP_IMAGE_MEAN)) / np.array(C.CLIP_IMAGE_STD)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expect, atol=1e-5)
