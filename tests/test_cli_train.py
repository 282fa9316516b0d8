"""Full `cli.train` smoke test: tiny HF checkpoint directory (unet/vae/scheduler/
text_encoder) + synthetic Hypersim and VKITTI trees -> 2 optimizer steps on the
virtual mesh -> checkpoint + HF export -> reload and run inference."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from diffusion_e2e_ft_tpu.models import (
    AutoencoderKL,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from diffusion_e2e_ft_tpu.models import clip as clip_models
from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline, loading


def make_tiny_hf_dir(path, in_channels=4):
    """A complete tiny HF pipeline dir, raw-SD2-style (4ch conv_in)."""
    ucfg = UNetConfig.tiny(in_channels=in_channels)
    vcfg = VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4)
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vcfg)
    up = unet.init(
        jax.random.key(0), jnp.ones((1, 8, 8, in_channels)), jnp.asarray(999),
        jnp.ones((1, 2, ucfg.cross_attention_dim)),
    )["params"]
    vp = vae.init(jax.random.key(1), jnp.ones((1, 32, 32, 3)))["params"]
    from diffusion_e2e_ft_tpu.ops import scheduler as S

    loading.save_pipeline_dir(
        path, ucfg, jax.tree.map(np.asarray, up), vcfg, jax.tree.map(np.asarray, vp),
        S.SchedulerConfig(), scheduler_class="DDPMScheduler",
    )
    tcfg = clip_models.CLIPTextConfig(
        vocab_size=49408, hidden_size=ucfg.cross_attention_dim, num_layers=1,
        num_heads=2, intermediate_size=64, max_position_embeddings=77,
    )
    text = clip_models.CLIPTextModel(tcfg)
    tp = text.init(jax.random.key(2), jnp.ones((1, 2), jnp.int32))["params"]
    loading.save_text_encoder(
        os.path.join(path, "text_encoder"), tcfg, jax.tree.map(np.asarray, tp)
    )
    return ucfg, vcfg


def make_hypersim_tree(root, n=3):
    import pandas as pd

    rng = np.random.default_rng(0)
    rows = []
    scene, cam = "ai_001_001", "cam_00"
    (root / "train" / scene / "rgb").mkdir(parents=True)
    (root / "train" / scene / "depth").mkdir(parents=True)
    ndir = root / "normals" / scene / "images" / f"scene_{cam}_geometry_preview"
    ndir.mkdir(parents=True)
    for i in range(n):
        rgb_rel = f"{scene}/rgb/frame.{i:04d}.png"
        depth_rel = f"{scene}/depth/frame.{i:04d}.png"
        Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)).save(root / "train" / rgb_rel)
        Image.fromarray(rng.integers(500, 60000, (96, 128)).astype(np.int32), mode="I").save(root / "train" / depth_rel)
        Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)).save(
            ndir / f"frame.{i:04d}.normal_cam.png"
        )
        rows.append(
            {
                "rgb_path": rgb_rel, "depth_path": depth_rel, "scene_name": scene,
                "camera_name": cam, "frame_id": i,
                "included_in_public_release": True, "split_partition_name": "train",
            }
        )
    csv = root / "meta.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv)


def make_vkitti_tree(root, n=2):
    import cv2

    rng = np.random.default_rng(1)
    rgb_dir = root / "vkitti_2.0.3_rgb" / "Scene01" / "morning" / "frames" / "rgb" / "Camera_0"
    depth_dir = root / "vkitti_2.0.3_depth" / "Scene01" / "morning" / "frames" / "depth" / "Camera_0"
    normal_dir = root / "vkitti_DAG_normals" / "Scene01" / "morning" / "frames" / "normal" / "Camera_0"
    for d in (rgb_dir, depth_dir, normal_dir):
        d.mkdir(parents=True)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)).save(rgb_dir / f"rgb_{i:05d}.jpg")
        cv2.imwrite(str(depth_dir / f"depth_{i:05d}.png"), rng.integers(100, 8000, (375, 1242)).astype(np.uint16))
        Image.fromarray(rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)).save(normal_dir / f"normal_{i:05d}.png")


@pytest.mark.slow
def test_cli_train_end_to_end(tmp_path, monkeypatch):
    from diffusion_e2e_ft_tpu.cli import train as train_cli

    ckpt_dir = tmp_path / "base"
    make_tiny_hf_dir(str(ckpt_dir), in_channels=4)  # raw-SD start: exercises surgery
    hyper_csv = make_hypersim_tree(tmp_path / "hypersim")
    make_vkitti_tree(tmp_path / "vkitti")
    out_dir = tmp_path / "run"

    train_cli.main(
        [
            "--pretrained_model_name_or_path", str(ckpt_dir),
            "--modality", "depth",
            "--noise_type", "zeros",
            "--output_dir", str(out_dir),
            "--hypersim_root", str(tmp_path / "hypersim"),
            "--hypersim_split_csv", hyper_csv,
            "--vkitti_root", str(tmp_path / "vkitti"),
            "--train_batch_size", "1",
            "--gradient_accumulation_steps", "1",
            "--max_train_steps", "2",
            "--checkpointing_steps", "2",
            "--lr_warmup_steps", "0",
            "--num_devices", "2",
            "--seed", "0",
        ]
    )

    # training checkpoint written
    from diffusion_e2e_ft_tpu.training import checkpoints as C

    assert C.list_checkpoints(str(out_dir))
    # exported HF pipeline reloads and runs (trailing spacing baked in)
    export = out_dir / "export"
    sched = json.load(open(export / "scheduler" / "scheduler_config.json"))
    assert sched["timestep_spacing"] == "trailing"
    # conv_in surgery happened: exported unet is 8-channel
    ucfg = json.load(open(export / "unet" / "config.json"))
    assert ucfg["in_channels"] == 8

    # the export is self-contained: frozen text tower travels with it, and the
    # strict loader (no override) accepts it
    assert (export / "text_encoder" / "config.json").exists()
    assert json.load(open(export / "model_index.json"))["text_encoder"] == [
        "transformers", "CLIPTextModel",
    ]
    pipe = MarigoldPipeline.from_hf_dir(str(export))
    assert np.abs(np.asarray(pipe.params["empty_text_embed"])).sum() > 0
    img = np.zeros((64, 64, 3), np.uint8)
    out = pipe(img, processing_res=0, color_map=None)
    assert np.isfinite(out.depth_np).all()
