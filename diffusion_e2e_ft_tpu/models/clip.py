"""CLIP text and vision encoders in Flax (inference-only, fp32/bf16).

Capability parity: the reference's two uses of CLIP —
  * empty-prompt text embedding for Marigold/SD conditioning
    (`/root/reference/training/train.py:455-458`,
    `/root/reference/Marigold/marigold/marigold_pipeline.py:356-369`): SD2's OpenCLIP
    ViT-H text tower (23 layers, width 1024, gelu).
  * image conditioning for GeoWizard
    (`/root/reference/GeoWizard/geowizard/training/train_depth_normal.py:613-621`):
    CLIP ViT-L/14 vision tower with projection to 768 (the
    `lambdalabs/sd-image-variations-diffusers` image encoder), fed 224x224
    CLIP-normalized crops; output `image_embeds` [B, 1, 768].

Module names mirror HF keys for mechanical weight conversion (see models/convert.py;
embedding tables are mapped without transposition).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

from diffusion_e2e_ft_tpu.models.layers import NORM_DTYPE  # noqa: E402

BOS_TOKEN_ID = 49406
EOS_TOKEN_ID = 49407

# CLIP image preprocessing constants (224x224 bicubic + normalize)
CLIP_IMAGE_SIZE = 224
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"  # SD2/OpenCLIP-H: gelu; SD1.5/CLIP-L: quick_gelu
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"Unknown activation: {name}")


class _CLIPAttention(nn.Module):
    num_heads: int
    causal: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, l, d = x.shape
        h = self.num_heads
        hd = d // h
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x) * (hd**-0.5)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, l, h, hd)
        k = k.reshape(b, l, h, hd)
        v = v.reshape(b, l, h, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
        if self.causal:
            mask = jnp.tril(jnp.ones((l, l), bool))
            logits = jnp.where(mask[None, None], logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, l, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class _CLIPMLP(nn.Module):
    intermediate_size: int
    out_size: int
    hidden_act: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(x)
        x = _act(self.hidden_act)(x)
        return nn.Dense(self.out_size, dtype=self.dtype, name="fc2")(x)


class _CLIPLayer(nn.Module):
    num_heads: int
    intermediate_size: int
    hidden_act: str
    causal: bool
    eps: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=self.eps, dtype=NORM_DTYPE, name="layer_norm1")(x).astype(self.dtype)
        x = x + _CLIPAttention(self.num_heads, self.causal, self.dtype, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=self.eps, dtype=NORM_DTYPE, name="layer_norm2")(x).astype(self.dtype)
        return x + _CLIPMLP(
            self.intermediate_size, x.shape[-1], self.hidden_act, self.dtype, name="mlp"
        )(h)


class CLIPTextModel(nn.Module):
    """Returns the last hidden state [B, L, D] (post final_layer_norm)."""

    config: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, input_ids: Array) -> Array:
        c = self.config
        dt = jnp.dtype(c.dtype)
        b, l = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=dt, name="token_embedding")(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=dt, name="position_embedding")(
            jnp.arange(l)[None, :]
        )
        x = tok + pos
        for i in range(c.num_layers):
            x = _CLIPLayer(
                c.num_heads, c.intermediate_size, c.hidden_act, causal=True,
                eps=c.layer_norm_eps, dtype=dt, name=f"layers_{i}",
            )(x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=NORM_DTYPE, name="final_layer_norm")(x)


class CLIPVisionModelWithProjection(nn.Module):
    """Returns projected image embeds [B, projection_dim]."""

    config: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, pixel_values: Array) -> Array:
        """pixel_values: [B, H, W, 3], CLIP-normalized."""
        c = self.config
        dt = jnp.dtype(c.dtype)
        b = pixel_values.shape[0]
        patches = nn.Conv(
            c.hidden_size,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=dt,
            name="patch_embedding",
        )(pixel_values.astype(dt))
        patches = patches.reshape(b, -1, c.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,), jnp.float32
        )
        x = jnp.concatenate([jnp.broadcast_to(cls[None, None], (b, 1, c.hidden_size)).astype(dt), patches], axis=1)
        n_pos = x.shape[1]
        pos = nn.Embed(n_pos, c.hidden_size, dtype=dt, name="position_embedding")(
            jnp.arange(n_pos)[None, :]
        )
        x = x + pos
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=NORM_DTYPE, name="pre_layrnorm")(x).astype(dt)
        for i in range(c.num_layers):
            x = _CLIPLayer(
                c.num_heads, c.intermediate_size, c.hidden_act, causal=False,
                eps=c.layer_norm_eps, dtype=dt, name=f"layers_{i}",
            )(x)
        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=NORM_DTYPE, name="post_layernorm")(
            x[:, 0]
        ).astype(dt)
        return nn.Dense(c.projection_dim, use_bias=False, dtype=dt, name="visual_projection")(pooled)


def clip_preprocess(images: Array, antialias: bool = True) -> Array:
    """[B, H, W, 3] in [0, 1] -> 224x224 bicubic + CLIP normalization (the GeoWizard
    conditioning transform: bicubic resize then Normalize(CLIP mean/std))."""
    b = images.shape[0]
    x = jax.image.resize(
        images, (b, CLIP_IMAGE_SIZE, CLIP_IMAGE_SIZE, 3), method="cubic", antialias=antialias
    )
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


def empty_prompt_ids(pad_to: Optional[int] = None) -> np.ndarray:
    """Token ids of the empty prompt: [BOS, EOS], optionally EOS-padded to length."""
    ids = [BOS_TOKEN_ID, EOS_TOKEN_ID]
    if pad_to is not None:
        ids = ids + [EOS_TOKEN_ID] * (pad_to - len(ids))
    return np.asarray([ids], np.int32)
