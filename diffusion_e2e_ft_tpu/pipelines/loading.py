"""HF (diffusers-layout) pipeline directory loading and export.

Capability parity: consumes the published checkpoint directories
(`GonzaloMG/marigold-e2e-ft-depth`, `.../normals`, `stable-diffusion-e2e-ft-*`,
`lemonaddie/geowizard`, `prs-eth/marigold-*`) with `model_index.json` + per-module
subfolders, and exports trained models back in the same layout with the trailing
timestep spacing baked into the scheduler config, mirroring the reference's final
save (`/root/reference/training/train.py:610-630`).

The empty-prompt text embedding is computed ONCE at load time from the checkpoint's
text encoder and baked as a constant (the reference also precomputes it,
`training/train.py:455-458`); the text tower is then dropped from device memory.
"""

from __future__ import annotations

import json
import os
import shutil
import warnings
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_e2e_ft_tpu.models import (
    AutoencoderKL,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from diffusion_e2e_ft_tpu.models import clip as clip_models
from diffusion_e2e_ft_tpu.models import convert
from diffusion_e2e_ft_tpu.ops import scheduler as sched_ops

WEIGHT_NAMES = (
    "diffusion_pytorch_model.safetensors",
    "diffusion_pytorch_model.bin",
    "model.safetensors",
    "pytorch_model.bin",
)


def _read_json(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def _find_weights(subdir: str) -> str:
    for name in WEIGHT_NAMES:
        p = os.path.join(subdir, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no weights file in {subdir} (tried {WEIGHT_NAMES})")


# ---------------------------------------------------------------------------
# Config translation
# ---------------------------------------------------------------------------


def unet_config_from_hf(cfg: Dict[str, Any]) -> UNetConfig:
    down_types = cfg.get("down_block_types", ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"])
    cross_levels = tuple("CrossAttn" in t for t in down_types)
    heads = cfg.get("num_attention_heads") or cfg.get("attention_head_dim", 8)
    if isinstance(heads, int):
        heads = (heads,) * len(down_types)
    return UNetConfig(
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (320, 640, 1280, 1280))),
        layers_per_block=cfg.get("layers_per_block", 2),
        cross_attention_levels=cross_levels,
        num_attention_heads=tuple(heads),
        cross_attention_dim=cfg.get("cross_attention_dim", 1024),
        transformer_depth=cfg.get("transformer_layers_per_block", 1)
        if isinstance(cfg.get("transformer_layers_per_block", 1), int)
        else 1,
        norm_num_groups=cfg.get("norm_num_groups", 32),
        norm_eps=cfg.get("norm_eps", 1e-5),
        use_linear_projection=cfg.get("use_linear_projection", False),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        freq_shift=cfg.get("freq_shift", 0),
        class_embed_proj_dim=cfg.get("projection_class_embeddings_input_dim")
        if cfg.get("class_embed_type") == "projection"
        else None,
    )


def unet_config_to_hf(c: UNetConfig) -> Dict[str, Any]:
    down, up = [], []
    for has in c.cross_attention_levels:
        down.append("CrossAttnDownBlock2D" if has else "DownBlock2D")
    for has in reversed(c.cross_attention_levels):
        up.append("CrossAttnUpBlock2D" if has else "UpBlock2D")
    out = {
        "_class_name": "UNet2DConditionModel",
        "in_channels": c.in_channels,
        "out_channels": c.out_channels,
        "block_out_channels": list(c.block_out_channels),
        "layers_per_block": c.layers_per_block,
        "down_block_types": down,
        "up_block_types": up,
        "attention_head_dim": list(c.num_attention_heads),
        "cross_attention_dim": c.cross_attention_dim,
        "norm_num_groups": c.norm_num_groups,
        "norm_eps": c.norm_eps,
        "use_linear_projection": c.use_linear_projection,
        "flip_sin_to_cos": c.flip_sin_to_cos,
        "freq_shift": c.freq_shift,
        "sample_size": 96,
        "act_fn": "silu",
        "center_input_sample": False,
        "downsample_padding": 1,
        "mid_block_scale_factor": 1,
    }
    if c.class_embed_proj_dim is not None:
        out["class_embed_type"] = "projection"
        out["projection_class_embeddings_input_dim"] = c.class_embed_proj_dim
    return out


def vae_config_from_hf(cfg: Dict[str, Any]) -> VAEConfig:
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def vae_config_to_hf(c: VAEConfig) -> Dict[str, Any]:
    n = len(c.block_out_channels)
    return {
        "_class_name": "AutoencoderKL",
        "in_channels": c.in_channels,
        "out_channels": c.out_channels,
        "latent_channels": c.latent_channels,
        "block_out_channels": list(c.block_out_channels),
        "layers_per_block": c.layers_per_block,
        "norm_num_groups": c.norm_num_groups,
        "scaling_factor": c.scaling_factor,
        "down_block_types": ["DownEncoderBlock2D"] * n,
        "up_block_types": ["UpDecoderBlock2D"] * n,
        "act_fn": "silu",
        "sample_size": 768,
    }


def scheduler_config_from_hf(cfg: Dict[str, Any]) -> sched_ops.SchedulerConfig:
    return sched_ops.SchedulerConfig(
        num_train_timesteps=cfg.get("num_train_timesteps", 1000),
        beta_start=cfg.get("beta_start", 0.00085),
        beta_end=cfg.get("beta_end", 0.012),
        beta_schedule=cfg.get("beta_schedule", "scaled_linear"),
        prediction_type=cfg.get("prediction_type", "v_prediction"),
        timestep_spacing=cfg.get("timestep_spacing", "leading"),
        steps_offset=cfg.get("steps_offset", 1),
        clip_sample=cfg.get("clip_sample", False),
        clip_sample_range=cfg.get("clip_sample_range", 1.0),
        set_alpha_to_one=cfg.get("set_alpha_to_one", False),
        rescale_betas_zero_snr=cfg.get("rescale_betas_zero_snr", False),
        original_inference_steps=cfg.get("original_inference_steps", 50),
        timestep_scaling=cfg.get("timestep_scaling", 10.0),
    )


def scheduler_config_to_hf(
    c: sched_ops.SchedulerConfig, class_name: str = "DDIMScheduler"
) -> Dict[str, Any]:
    if "LCM" in class_name:
        return {
            "_class_name": class_name,
            "num_train_timesteps": c.num_train_timesteps,
            "beta_start": c.beta_start,
            "beta_end": c.beta_end,
            "beta_schedule": c.beta_schedule,
            "prediction_type": c.prediction_type,
            "timestep_spacing": c.timestep_spacing,
            "steps_offset": c.steps_offset,
            "clip_sample": c.clip_sample,
            "clip_sample_range": c.clip_sample_range,
            "set_alpha_to_one": c.set_alpha_to_one,
            "rescale_betas_zero_snr": c.rescale_betas_zero_snr,
            "original_inference_steps": c.original_inference_steps,
            "timestep_scaling": c.timestep_scaling,
            "trained_betas": None,
        }
    return {
        "_class_name": class_name,
        "num_train_timesteps": c.num_train_timesteps,
        "beta_start": c.beta_start,
        "beta_end": c.beta_end,
        "beta_schedule": c.beta_schedule,
        "prediction_type": c.prediction_type,
        "timestep_spacing": c.timestep_spacing,
        "steps_offset": c.steps_offset,
        "clip_sample": c.clip_sample,
        "clip_sample_range": c.clip_sample_range,
        "set_alpha_to_one": c.set_alpha_to_one,
        "rescale_betas_zero_snr": c.rescale_betas_zero_snr,
        "trained_betas": None,
    }


def text_config_from_hf(cfg: Dict[str, Any]) -> clip_models.CLIPTextConfig:
    return clip_models.CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden_size=cfg.get("hidden_size", 1024),
        num_layers=cfg.get("num_hidden_layers", 23),
        num_heads=cfg.get("num_attention_heads", 16),
        intermediate_size=cfg.get("intermediate_size", 4096),
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "gelu"),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
    )


def vision_config_from_hf(cfg: Dict[str, Any]) -> clip_models.CLIPVisionConfig:
    return clip_models.CLIPVisionConfig(
        hidden_size=cfg.get("hidden_size", 1024),
        num_layers=cfg.get("num_hidden_layers", 24),
        num_heads=cfg.get("num_attention_heads", 16),
        intermediate_size=cfg.get("intermediate_size", 4096),
        image_size=cfg.get("image_size", 224),
        patch_size=cfg.get("patch_size", 14),
        projection_dim=cfg.get("projection_dim", 768),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
    )


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------


def load_unet(path: str) -> Tuple[UNet2DCondition, Any, UNetConfig]:
    cfg = unet_config_from_hf(_read_json(os.path.join(path, "config.json")))
    params = convert.state_dict_to_params(convert.load_state_dict(_find_weights(path)))
    return UNet2DCondition(cfg), params, cfg


def load_vae(path: str) -> Tuple[AutoencoderKL, Any, VAEConfig]:
    cfg = vae_config_from_hf(_read_json(os.path.join(path, "config.json")))
    params = convert.state_dict_to_params(convert.load_state_dict(_find_weights(path)))
    return AutoencoderKL(cfg), params, cfg


def compute_empty_text_embed(text_encoder_dir: str, pad_to: Optional[int] = None) -> np.ndarray:
    """Run the checkpoint's text tower on the empty prompt once; return [1, L, D]."""
    cfg = text_config_from_hf(_read_json(os.path.join(text_encoder_dir, "config.json")))
    params = convert.clip_state_dict_to_params(
        convert.load_state_dict(_find_weights(text_encoder_dir))
    )
    model = clip_models.CLIPTextModel(cfg)
    ids = clip_models.empty_prompt_ids(pad_to)
    out = model.apply({"params": params}, jnp.asarray(ids))
    return np.asarray(out)


def load_marigold_pipeline(path: str, dtype=jnp.float32, allow_missing_text_encoder=False):
    """Assemble a MarigoldPipeline from an HF pipeline directory.

    The checkpoint's `text_encoder/` is REQUIRED: the UNet was conditioned on the
    real CLIP empty-prompt embedding during training (`training/train.py:455-458`),
    so substituting anything else changes the model's numbers. Pass
    `allow_missing_text_encoder=True` only for synthetic/test checkpoints — a zeros
    embedding is substituted with a loud warning."""
    from diffusion_e2e_ft_tpu.pipelines.marigold import MarigoldPipeline

    unet, unet_params, _ = load_unet(os.path.join(path, "unet"))
    vae, vae_params, _ = load_vae(os.path.join(path, "vae"))
    sched_json = _read_json(os.path.join(path, "scheduler", "scheduler_config.json"))
    sched_cfg = scheduler_config_from_hf(sched_json)
    cls_name = sched_json.get("_class_name", "")
    scheduler_type = "lcm" if "LCM" in cls_name else ("ddpm" if "DDPM" in cls_name else "ddim")
    te_dir = os.path.join(path, "text_encoder")
    if os.path.isdir(te_dir):
        empty = compute_empty_text_embed(te_dir)
    elif allow_missing_text_encoder:
        warnings.warn(
            f"{path} has no text_encoder/ subfolder; substituting a ZEROS empty-text "
            "embedding. Inference will NOT reproduce the trained model's outputs.",
            stacklevel=2,
        )
        empty = np.zeros((1, 2, unet.config.cross_attention_dim), np.float32)
    else:
        raise FileNotFoundError(
            f"{path} has no text_encoder/ subfolder. The empty-prompt CLIP embedding "
            "is part of the model; a checkpoint without it cannot reproduce the "
            "trained numbers. Re-export with the text encoder included "
            "(training.checkpoints.export_hf_pipeline does this since round 2), "
            "upgrade an older export by copying text_encoder/ (and tokenizer/) from "
            "the base SD2 checkpoint into it, or pass "
            "allow_missing_text_encoder=True for synthetic checkpoints."
        )
    return MarigoldPipeline(
        unet, vae, unet_params, vae_params, sched_cfg, empty, dtype=dtype,
        scheduler_type=scheduler_type,
    )


def load_geowizard_pipeline(path: str, dtype=jnp.float32):
    """Assemble a GeoWizardPipeline from an HF pipeline directory (expects an
    `image_encoder` subfolder with a CLIP vision tower + projection)."""
    from diffusion_e2e_ft_tpu.pipelines.geowizard import GeoWizardPipeline

    unet, unet_params, ucfg = load_unet(os.path.join(path, "unet"))
    if ucfg.class_embed_proj_dim is not None and not ucfg.joint_attention:
        # the joint cross-task attention is a runtime flag, not an HF config field
        ucfg = ucfg.replace(joint_attention=True)
        unet = UNet2DCondition(ucfg)
    vae, vae_params, _ = load_vae(os.path.join(path, "vae"))
    sched_cfg = scheduler_config_from_hf(
        _read_json(os.path.join(path, "scheduler", "scheduler_config.json"))
    )
    enc_dir = os.path.join(path, "image_encoder")
    vis_cfg = vision_config_from_hf(_read_json(os.path.join(enc_dir, "config.json")))
    enc = clip_models.CLIPVisionModelWithProjection(vis_cfg)
    enc_params = convert.clip_state_dict_to_params(
        convert.load_state_dict(_find_weights(enc_dir))
    )
    return GeoWizardPipeline(
        unet, vae, enc, unet_params, vae_params, enc_params, sched_cfg, dtype=dtype
    )


# ---------------------------------------------------------------------------
# Export (HF layout)
# ---------------------------------------------------------------------------


def vision_config_to_hf(c: clip_models.CLIPVisionConfig) -> Dict[str, Any]:
    return {
        "architectures": ["CLIPVisionModelWithProjection"],
        "model_type": "clip_vision_model",
        "hidden_size": c.hidden_size,
        "num_hidden_layers": c.num_layers,
        "num_attention_heads": c.num_heads,
        "intermediate_size": c.intermediate_size,
        "image_size": c.image_size,
        "patch_size": c.patch_size,
        "projection_dim": c.projection_dim,
        "hidden_act": c.hidden_act,
        "layer_norm_eps": c.layer_norm_eps,
    }


def text_config_to_hf(c: clip_models.CLIPTextConfig) -> Dict[str, Any]:
    return {
        "architectures": ["CLIPTextModel"],
        "model_type": "clip_text_model",
        "vocab_size": c.vocab_size,
        "hidden_size": c.hidden_size,
        "num_hidden_layers": c.num_layers,
        "num_attention_heads": c.num_heads,
        "intermediate_size": c.intermediate_size,
        "max_position_embeddings": c.max_position_embeddings,
        "hidden_act": c.hidden_act,
        "layer_norm_eps": c.layer_norm_eps,
    }


def save_text_encoder(path: str, config: clip_models.CLIPTextConfig, params: Any) -> None:
    """Write a text_encoder subfolder in the HF layout (config.json + safetensors)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(text_config_to_hf(config), f, indent=2)
    convert.save_state_dict(
        _clip_params_to_state_dict(params, "text"), os.path.join(path, "model.safetensors")
    )


def _clip_params_to_state_dict(params: Any, kind: str) -> Dict[str, np.ndarray]:
    """Inverse of clip_state_dict_to_params for export (vision towers)."""
    prefix = "vision_model." if kind == "vision" else "text_model."
    flat = convert.params_to_state_dict(params)
    out: Dict[str, np.ndarray] = {}
    for key, value in flat.items():
        if key.startswith("visual_projection"):
            out[key] = value
            continue
        # embeddings live under `<prefix>embeddings.`; layers under `<prefix>encoder.`
        if key.startswith(("class_embedding", "patch_embedding", "position_embedding", "token_embedding")):
            k = key.replace(".embedding", ".weight")
            if key == "class_embedding":
                k = key
            out[prefix + "embeddings." + k] = value
        elif key.startswith("layers."):
            out[prefix + "encoder." + key] = value
        else:
            out[prefix + key] = value
    return out


def save_pipeline_dir(
    path: str,
    unet_config: UNetConfig,
    unet_params: Any,
    vae_config: VAEConfig,
    vae_params: Any,
    scheduler_config: sched_ops.SchedulerConfig,
    scheduler_class: str = "DDIMScheduler",
    pipeline_class: str = "MarigoldPipeline",
    extra_model_index: Optional[Dict[str, Any]] = None,
    image_encoder_config: Optional[clip_models.CLIPVisionConfig] = None,
    image_encoder_params: Optional[Any] = None,
    copy_subfolders: Optional[Dict[str, str]] = None,
) -> None:
    """Write an HF-layout pipeline directory (model_index.json + subfolders).

    The scheduler config carries whatever timestep spacing the caller set — trainers
    pass trailing, reproducing the reference's fixed final export.

    `copy_subfolders` maps subfolder name -> source directory; each is copied in
    verbatim (bit-identical). This is how frozen towers (text_encoder, tokenizer,
    image_encoder, feature_extractor) travel from the base checkpoint into the
    export, matching the reference's full-pipeline save
    (`/root/reference/training/train.py:610-630`)."""
    os.makedirs(path, exist_ok=True)
    index = {
        "_class_name": pipeline_class,
        "_diffusers_version": "0.30.2",
        "unet": ["diffusers", "UNet2DConditionModel"],
        "vae": ["diffusers", "AutoencoderKL"],
        "scheduler": ["diffusers", scheduler_class],
    }
    for sub in copy_subfolders or ():
        cls = _MODEL_INDEX_CLASSES.get(sub)
        if cls is not None:
            index[sub] = cls
    index.update(extra_model_index or {})
    with open(os.path.join(path, "model_index.json"), "w") as f:
        json.dump(index, f, indent=2)

    for sub, cfg in (
        ("unet", unet_config_to_hf(unet_config)),
        ("vae", vae_config_to_hf(vae_config)),
    ):
        os.makedirs(os.path.join(path, sub), exist_ok=True)
        with open(os.path.join(path, sub, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2)
    convert.save_state_dict(
        convert.params_to_state_dict(unet_params),
        os.path.join(path, "unet", "diffusion_pytorch_model.safetensors"),
    )
    convert.save_state_dict(
        convert.params_to_state_dict(vae_params),
        os.path.join(path, "vae", "diffusion_pytorch_model.safetensors"),
    )
    os.makedirs(os.path.join(path, "scheduler"), exist_ok=True)
    with open(os.path.join(path, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump(scheduler_config_to_hf(scheduler_config, scheduler_class), f, indent=2)

    if image_encoder_config is not None and image_encoder_params is not None:
        enc_dir = os.path.join(path, "image_encoder")
        os.makedirs(enc_dir, exist_ok=True)
        with open(os.path.join(enc_dir, "config.json"), "w") as f:
            json.dump(vision_config_to_hf(image_encoder_config), f, indent=2)
        convert.save_state_dict(
            _clip_params_to_state_dict(image_encoder_params, "vision"),
            os.path.join(enc_dir, "model.safetensors"),
        )

    for sub, src in (copy_subfolders or {}).items():
        dst = os.path.join(path, sub)
        if os.path.abspath(src) == os.path.abspath(dst):
            continue
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)


_MODEL_INDEX_CLASSES = {
    "text_encoder": ["transformers", "CLIPTextModel"],
    "tokenizer": ["transformers", "CLIPTokenizer"],
    "image_encoder": ["transformers", "CLIPVisionModelWithProjection"],
    "feature_extractor": ["transformers", "CLIPImageProcessor"],
}


def frozen_tower_subfolders(source_checkpoint: str, modality: str) -> Dict[str, str]:
    """Which frozen-tower subfolders a final export must carry, resolved against the
    base checkpoint. depth/normals runs need text_encoder (+tokenizer when present);
    joint (GeoWizard) runs need image_encoder (+feature_extractor when present) —
    mirroring the reference saves (`training/train.py:619-627`,
    `GeoWizard/geowizard/training/train_depth_normal.py:862-869`). Raises if a
    REQUIRED tower is missing from the source."""
    required: Sequence[str]
    optional: Sequence[str]
    if modality == "joint":
        required, optional = ("image_encoder",), ("feature_extractor",)
    else:
        required, optional = ("text_encoder",), ("tokenizer", "feature_extractor")
    out: Dict[str, str] = {}
    for sub in required:
        src = os.path.join(source_checkpoint, sub)
        if not os.path.isdir(src):
            raise FileNotFoundError(
                f"base checkpoint {source_checkpoint} has no {sub}/ subfolder; the "
                f"final export for modality={modality!r} must include it"
            )
        out[sub] = src
    for sub in optional:
        src = os.path.join(source_checkpoint, sub)
        if os.path.isdir(src):
            out[sub] = src
    return out
