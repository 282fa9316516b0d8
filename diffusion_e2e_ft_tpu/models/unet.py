"""SD2-family conditional UNet in Flax (NHWC), covering all three model families:

  * Marigold / SD E2E-FT depth & normals: 8-channel input (image latent ++ noisy
    latent), cross-attention over a CLIP text embedding, v-prediction
    (`/root/reference/training/train.py:292-301` behavior; conv_in surgery is a
    converter-time weight transform, see `models/convert.py`).
  * Raw SD2 mode: 4-channel input, no latent concatenation
    (`/root/reference/training/train.py:60-63,495-499`).
  * GeoWizard: SD1.5-shaped UNet (8 heads/level, cross_attention_dim 768, conv
    projections), `class_embed_type='projection'` MLP on the 10-dim task/domain
    switcher added to the time embedding
    (`/root/reference/GeoWizard/geowizard/models/unet_2d_condition.py:360-386,984-999`),
    and joint cross-task self-attention at every transformer block
    (`/root/reference/GeoWizard/geowizard/models/attention.py:480-497`), here a single
    `joint_attention` flag on the attention module rather than a class fork.

TPU-first notes: NHWC convs (MXU-friendly), attention via kernels.attention (Pallas
flash attention on TPU), fp32 GroupNorm/LayerNorm islands with configurable compute
dtype (bf16 on TPU), and `jax.checkpoint`-compatible pure apply.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_e2e_ft_tpu.models.layers import (
    Downsample,
    GroupNormAct,
    ResnetBlock,
    SpatialTransformer,
    TimestepEmbedding,
    Upsample,
    timestep_embedding,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD2 defaults; `sd15()` / `geowizard()` build the SD1.5-family variants."""

    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # per-level attention presence: CrossAttn{Down,Up}Block vs plain {Down,Up}Block
    cross_attention_levels: Tuple[bool, ...] = (True, True, True, False)
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    transformer_depth: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    use_linear_projection: bool = True
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    # GeoWizard extensions
    class_embed_proj_dim: Optional[int] = None  # 10 for GeoWizard's switcher
    joint_attention: bool = False
    dtype: str = "float32"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def replace(self, **kw) -> "UNetConfig":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def sd2(**kw) -> "UNetConfig":
        return UNetConfig(**kw)

    @staticmethod
    def sd15(**kw) -> "UNetConfig":
        base = dict(
            num_attention_heads=(8, 8, 8, 8),
            cross_attention_dim=768,
            use_linear_projection=False,
        )
        base.update(kw)
        return UNetConfig(**base)

    @staticmethod
    def geowizard(**kw) -> "UNetConfig":
        base = dict(class_embed_proj_dim=10, joint_attention=True)
        base.update(kw)
        return UNetConfig.sd15(**base)

    @staticmethod
    def tiny(**kw) -> "UNetConfig":
        """Test-sized config: same topology, 16x fewer channels."""
        base = dict(
            block_out_channels=(32, 64, 64, 64),
            num_attention_heads=(2, 2, 2, 2),
            cross_attention_dim=32,
        )
        base.update(kw)
        return UNetConfig(**base)


class _DownBlock(nn.Module):
    config: UNetConfig
    level: int

    @nn.compact
    def __call__(self, x: Array, temb: Array, context: Array):
        c = self.config
        dt = c.jnp_dtype
        out_ch = c.block_out_channels[self.level]
        heads = c.num_attention_heads[self.level]
        has_attn = c.cross_attention_levels[self.level]
        is_last = self.level == len(c.block_out_channels) - 1

        skips = []
        for j in range(c.layers_per_block):
            x = ResnetBlock(
                out_ch, groups=c.norm_num_groups, eps=c.norm_eps, dtype=dt,
                name=f"resnets_{j}",
            )(x, temb)
            if has_attn:
                x = SpatialTransformer(
                    heads, out_ch // heads, depth=c.transformer_depth,
                    groups=c.norm_num_groups, joint_attention=c.joint_attention,
                    use_linear_projection=c.use_linear_projection, dtype=dt,
                    name=f"attentions_{j}",
                )(x, context)
            skips.append(x)
        if not is_last:
            x = Downsample(out_ch, dtype=dt, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class _MidBlock(nn.Module):
    config: UNetConfig

    @nn.compact
    def __call__(self, x: Array, temb: Array, context: Array) -> Array:
        c = self.config
        dt = c.jnp_dtype
        ch = c.block_out_channels[-1]
        heads = c.num_attention_heads[-1]
        x = ResnetBlock(ch, groups=c.norm_num_groups, eps=c.norm_eps, dtype=dt, name="resnets_0")(x, temb)
        x = SpatialTransformer(
            heads, ch // heads, depth=c.transformer_depth, groups=c.norm_num_groups,
            joint_attention=c.joint_attention,
            use_linear_projection=c.use_linear_projection, dtype=dt, name="attentions_0",
        )(x, context)
        return ResnetBlock(ch, groups=c.norm_num_groups, eps=c.norm_eps, dtype=dt, name="resnets_1")(x, temb)


class _UpBlock(nn.Module):
    config: UNetConfig
    level: int  # index into reversed(block_out_channels)

    @nn.compact
    def __call__(self, x: Array, skips, temb: Array, context: Array, upsample_hw=None) -> Array:
        c = self.config
        dt = c.jnp_dtype
        rev_channels = tuple(reversed(c.block_out_channels))
        rev_attn = tuple(reversed(c.cross_attention_levels))
        rev_heads = tuple(reversed(c.num_attention_heads))
        out_ch = rev_channels[self.level]
        heads = rev_heads[self.level]
        has_attn = rev_attn[self.level]
        is_last = self.level == len(rev_channels) - 1

        for j in range(c.layers_per_block + 1):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock(
                out_ch, groups=c.norm_num_groups, eps=c.norm_eps, dtype=dt,
                name=f"resnets_{j}",
            )(x, temb)
            if has_attn:
                x = SpatialTransformer(
                    heads, out_ch // heads, depth=c.transformer_depth,
                    groups=c.norm_num_groups, joint_attention=c.joint_attention,
                    use_linear_projection=c.use_linear_projection, dtype=dt,
                    name=f"attentions_{j}",
                )(x, context)
        if not is_last:
            x = Upsample(out_ch, dtype=dt, name="upsamplers_0")(x, upsample_hw)
        return x


class UNet2DCondition(nn.Module):
    """Conditional UNet: (latent NHWC, timestep, text/image context[, class vector])
    -> predicted v / epsilon / sample (NHWC)."""

    config: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(
        self,
        sample: Array,  # [B, H, W, in_channels]
        timesteps: Array,  # [] or [B]
        encoder_hidden_states: Array,  # [B, L, cross_attention_dim]
        class_labels: Optional[Array] = None,  # [B, class_embed_proj_dim]
    ) -> Array:
        c = self.config
        dt = c.jnp_dtype
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_feat = timestep_embedding(
            timesteps, c.block_out_channels[0],
            flip_sin_to_cos=c.flip_sin_to_cos, downscale_freq_shift=c.freq_shift,
        ).astype(dt)
        temb = TimestepEmbedding(c.time_embed_dim, dtype=dt, name="time_embedding")(t_feat)

        if c.class_embed_proj_dim is not None:
            if class_labels is None:
                raise ValueError("this UNet config requires class_labels")
            cemb = TimestepEmbedding(c.time_embed_dim, dtype=dt, name="class_embedding")(
                class_labels.astype(dt)
            )
            temb = temb + cemb

        context = encoder_hidden_states.astype(dt)
        x = nn.Conv(c.block_out_channels[0], (3, 3), padding=1, dtype=dt, name="conv_in")(
            sample.astype(dt)
        )

        skips = [x]
        for i in range(len(c.block_out_channels)):
            x, s = _DownBlock(c, i, name=f"down_blocks_{i}")(x, temb, context)
            skips.extend(s)

        x = _MidBlock(c, name="mid_block")(x, temb, context)

        for i in range(len(c.block_out_channels)):
            n_skips = c.layers_per_block + 1
            block_skips = skips[-n_skips:]
            del skips[-n_skips:]
            # odd spatial sizes: upsample to the NEXT skip's resolution, not naive 2x
            up_hw = skips[-1].shape[1:3] if skips else None
            x = _UpBlock(c, i, name=f"up_blocks_{i}")(x, block_skips, temb, context, up_hw)

        x = GroupNormAct(c.norm_num_groups, eps=c.norm_eps, dtype=dt, name="conv_norm_out")(x)
        return nn.Conv(c.out_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(x)
