"""Final HF export must be self-contained: frozen towers (text_encoder, tokenizer,
image_encoder, feature_extractor) travel from the base checkpoint into the export,
and the reloaded artifact reproduces the trainer's conditioning bit-for-bit —
matching the reference's full-pipeline saves (`training/train.py:610-630`,
`GeoWizard/geowizard/training/train_depth_normal.py:852-871`)."""

import json
import os

import jax
import numpy as np
import pytest

from diffusion_e2e_ft_tpu.pipelines import GeoWizardPipeline, MarigoldPipeline, loading
from diffusion_e2e_ft_tpu.training import checkpoints as C

from test_cli_train import make_tiny_hf_dir

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



def test_frozen_tower_subfolders_contract(tmp_path):
    base = tmp_path / "base"
    (base / "text_encoder").mkdir(parents=True)
    (base / "tokenizer").mkdir()
    got = loading.frozen_tower_subfolders(str(base), "depth")
    assert set(got) == {"text_encoder", "tokenizer"}
    # joint requires image_encoder, which this base lacks
    with pytest.raises(FileNotFoundError, match="image_encoder"):
        loading.frozen_tower_subfolders(str(base), "joint")
    # depth/normals require text_encoder
    with pytest.raises(FileNotFoundError, match="text_encoder"):
        loading.frozen_tower_subfolders(str(tmp_path), "normals")


def test_depth_export_is_self_contained(tmp_path):
    base = tmp_path / "base"
    ucfg, vcfg = make_tiny_hf_dir(str(base), in_channels=8)
    # a tokenizer subfolder (content is opaque to us; must be copied verbatim)
    tok = base / "tokenizer"
    tok.mkdir()
    (tok / "vocab.json").write_text('{"!": 0}')

    up = loading.load_unet(str(base / "unet"))[1]
    vp = loading.load_vae(str(base / "vae"))[1]
    scfg = loading.scheduler_config_from_hf(
        json.load(open(base / "scheduler" / "scheduler_config.json"))
    )

    export = str(tmp_path / "export")
    C.export_hf_pipeline(
        export, ucfg, up, vcfg, vp, scfg,
        source_checkpoint=str(base), modality="depth",
    )

    # towers copied verbatim
    assert (
        open(os.path.join(export, "tokenizer", "vocab.json")).read()
        == (tok / "vocab.json").read_text()
    )
    assert os.path.exists(os.path.join(export, "text_encoder", "config.json"))
    index = json.load(open(os.path.join(export, "model_index.json")))
    assert index["text_encoder"] == ["transformers", "CLIPTextModel"]
    assert index["tokenizer"] == ["transformers", "CLIPTokenizer"]

    # strict reload (no override flag) now works and uses the REAL text tower:
    pipe = MarigoldPipeline.from_hf_dir(export)
    # the embedding the trainer conditioned on (same padding) is reproduced
    # bit-for-bit from the exported encoder
    trainer_embed = loading.compute_empty_text_embed(str(base / "text_encoder"), pad_to=77)
    reload_embed = loading.compute_empty_text_embed(
        os.path.join(export, "text_encoder"), pad_to=77
    )
    np.testing.assert_array_equal(trainer_embed, reload_embed)
    # and the pipeline's inference embedding (reference uses do_not_pad at
    # inference: marigold_pipeline.py:356-369) matches the base tower bit-for-bit
    np.testing.assert_array_equal(
        np.asarray(pipe.params["empty_text_embed"], np.float32),
        loading.compute_empty_text_embed(str(base / "text_encoder")),
    )
    assert np.abs(np.asarray(pipe.params["empty_text_embed"])).sum() > 0


def test_joint_export_roundtrips_through_geowizard_loader(tmp_path):
    pipe = GeoWizardPipeline.from_random(jax.random.key(0))
    base = str(tmp_path / "base")
    loading.save_pipeline_dir(
        base,
        pipe.unet.config,
        jax.tree.map(np.asarray, pipe.params["unet"]),
        pipe.vae.config,
        jax.tree.map(np.asarray, pipe.params["vae"]),
        pipe.scheduler_config,
        pipeline_class="DepthNormalEstimationPipeline",
        image_encoder_config=pipe.image_encoder.config,
        image_encoder_params=jax.tree.map(np.asarray, pipe.params["image_encoder"]),
    )

    export = str(tmp_path / "export")
    C.export_hf_pipeline(
        export,
        pipe.unet.config,
        jax.tree.map(np.asarray, pipe.params["unet"]),
        pipe.vae.config,
        jax.tree.map(np.asarray, pipe.params["vae"]),
        pipe.scheduler_config,
        source_checkpoint=base,
        modality="joint",
    )
    index = json.load(open(os.path.join(export, "model_index.json")))
    assert index["image_encoder"] == ["transformers", "CLIPVisionModelWithProjection"]

    pipe2 = GeoWizardPipeline.from_hf_dir(export)
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    a = pipe(img, processing_res=0, color_map=None)
    b = pipe2(img, processing_res=0, color_map=None)
    np.testing.assert_allclose(a.depth_np, b.depth_np, atol=1e-5)
    np.testing.assert_allclose(a.normal_np, b.normal_np, atol=1e-5)
