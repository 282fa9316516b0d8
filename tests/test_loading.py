"""Round-trip a tiny pipeline through the HF directory layout and reload it."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_e2e_ft_tpu.models import UNetConfig, VAEConfig
from diffusion_e2e_ft_tpu.ops import scheduler as S
from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline
from diffusion_e2e_ft_tpu.pipelines import loading

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



def test_config_translations_roundtrip():
    ucfg = UNetConfig()  # SD2
    back = loading.unet_config_from_hf(loading.unet_config_to_hf(ucfg))
    assert back == ucfg
    g = UNetConfig.geowizard()
    back = loading.unet_config_from_hf(loading.unet_config_to_hf(g))
    # joint_attention is a runtime behavior flag, not an HF config field
    assert back == g.replace(joint_attention=False)

    vcfg = VAEConfig()
    assert loading.vae_config_from_hf(loading.vae_config_to_hf(vcfg)) == vcfg

    scfg = S.SchedulerConfig()
    assert loading.scheduler_config_from_hf(loading.scheduler_config_to_hf(scfg)) == scfg


def test_sd2_defaults_from_hf_config():
    """An SD2-style config dict translates to our SD2 defaults (the published
    checkpoints' unet/config.json shape)."""
    hf = {
        "in_channels": 8,
        "block_out_channels": [320, 640, 1280, 1280],
        "down_block_types": [
            "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D",
        ],
        "attention_head_dim": [5, 10, 20, 20],
        "cross_attention_dim": 1024,
        "use_linear_projection": True,
    }
    cfg = loading.unet_config_from_hf(hf)
    assert cfg == UNetConfig()


def test_save_load_pipeline_dir(tmp_path):
    path = str(tmp_path / "ckpt")
    pipe = MarigoldPipeline.from_random(jax.random.key(0))
    loading.save_pipeline_dir(
        path,
        pipe.unet.config,
        jax.tree.map(np.asarray, pipe.params["unet"]),
        pipe.vae.config,
        jax.tree.map(np.asarray, pipe.params["vae"]),
        pipe.scheduler_config.replace(timestep_spacing="trailing"),
    )
    assert os.path.exists(os.path.join(path, "model_index.json"))
    sched_cfg = json.load(open(os.path.join(path, "scheduler", "scheduler_config.json")))
    assert sched_cfg["timestep_spacing"] == "trailing"
    assert sched_cfg["prediction_type"] == "v_prediction"

    # a checkpoint without text_encoder/ is not the trained model: loading must
    # refuse unless explicitly overridden (no silent zeros substitution)
    import pytest

    with pytest.raises(FileNotFoundError, match="text_encoder"):
        MarigoldPipeline.from_hf_dir(path)
    with pytest.warns(UserWarning, match="ZEROS"):
        pipe2 = MarigoldPipeline.from_hf_dir(path, allow_missing_text_encoder=True)
    # identical weights -> identical outputs
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    a = pipe(img, processing_res=0, color_map=None)
    b = pipe2(img, processing_res=0, color_map=None)
    np.testing.assert_allclose(a.depth_np, b.depth_np, atol=1e-6)
