"""SD2 AutoencoderKL (VAE) in Flax, NHWC, deterministic-mean latent path.

Capability parity: the diffusers `AutoencoderKL` as used by the reference pipelines —
which bypass posterior sampling and take the moments' mean
(`/root/reference/Marigold/marigold/marigold_pipeline.py:481-538`) — and the frozen
decoder the E2E loss differentiates through (`/root/reference/training/train.py:527-529`).

Architecture (SD2 `vae` subfolder config): block_out_channels (128, 256, 512, 512),
2 resnets per encoder block / 3 per decoder block, single-head mid attention,
GroupNorm(32, eps=1e-6), latent_channels 4, scaling_factor 0.18215.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_e2e_ft_tpu.models.layers import Downsample, GroupNormAct, ResnetBlock, Upsample, VAEAttention

Array = jax.Array

SD_LATENT_SCALE = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = SD_LATENT_SCALE
    # Dispatch resnet GN+SiLU->conv pairs to the fused Pallas kernel on TPU
    # (kernels/gn_conv.py); identical param tree and math, XLA fallback elsewhere.
    # Default OFF: at 768px inference-decode shapes the fused kernel LOSES to
    # XLA's fusion chain (measured 10.24 -> 6.26 img/s); it WINS on the training
    # step (494 -> 420 ms/step), so E2ETrainer turns it on for its own VAE.
    fused_gn_conv: bool = False
    # Exact sub-pixel (depth-to-space) decomposition of the decoder's
    # nearest2x->conv3x3 upsamplers (layers._SubpixelConv3x3): 2.25x fewer conv
    # FLOPs, no [2H, 2W, C] materialization. Identical params + math; default
    # OFF pending the in-pipeline on-chip A/B (r3 lesson: standalone kernel
    # wins have lost in-pipeline to XLA layout wars).
    subpixel_upsample: bool = False
    dtype: str = "float32"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


class _EncoderDown(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    groups: int
    dtype: jnp.dtype
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for j in range(self.num_layers):
            x = ResnetBlock(
                self.out_channels, groups=self.groups, eps=1e-6, use_time_emb=False,
                fused=self.fused, dtype=self.dtype, name=f"resnets_{j}",
            )(x)
        if self.add_downsample:
            x = Downsample(
                self.out_channels, asymmetric=True, dtype=self.dtype,
                name="downsamplers_0",
            )(x)
        return x


class _Mid(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = ResnetBlock(self.channels, groups=self.groups, eps=1e-6, use_time_emb=False, fused=self.fused, dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(self.channels, groups=self.groups, dtype=self.dtype, name="attentions_0")(x)
        return ResnetBlock(self.channels, groups=self.groups, eps=1e-6, use_time_emb=False, fused=self.fused, dtype=self.dtype, name="resnets_1")(x)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.config
        dt = c.jnp_dtype
        x = nn.Conv(c.block_out_channels[0], (3, 3), padding=1, dtype=dt, name="conv_in")(x)
        for i, ch in enumerate(c.block_out_channels):
            x = _EncoderDown(
                ch, c.layers_per_block,
                add_downsample=(i < len(c.block_out_channels) - 1),
                groups=c.norm_num_groups, dtype=dt, fused=c.fused_gn_conv,
                name=f"down_blocks_{i}",
            )(x)
        x = _Mid(c.block_out_channels[-1], groups=c.norm_num_groups, dtype=dt, fused=c.fused_gn_conv, name="mid_block")(x)
        x = GroupNormAct(c.norm_num_groups, eps=1e-6, dtype=dt, name="conv_norm_out")(x)
        return nn.Conv(2 * c.latent_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(x)


class _DecoderUp(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    groups: int
    dtype: jnp.dtype
    fused: bool = False
    subpixel: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for j in range(self.num_layers):
            x = ResnetBlock(
                self.out_channels, groups=self.groups, eps=1e-6, use_time_emb=False,
                fused=self.fused, dtype=self.dtype, name=f"resnets_{j}",
            )(x)
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype,
                         subpixel=self.subpixel, name="upsamplers_0")(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z: Array) -> Array:
        c = self.config
        dt = c.jnp_dtype
        x = nn.Conv(c.block_out_channels[-1], (3, 3), padding=1, dtype=dt, name="conv_in")(z)
        x = _Mid(c.block_out_channels[-1], groups=c.norm_num_groups, dtype=dt, fused=c.fused_gn_conv, name="mid_block")(x)
        up_channels = tuple(reversed(c.block_out_channels))
        for i, ch in enumerate(up_channels):
            x = _DecoderUp(
                ch, c.layers_per_block + 1,
                add_upsample=(i < len(up_channels) - 1),
                groups=c.norm_num_groups, dtype=dt, fused=c.fused_gn_conv,
                subpixel=c.subpixel_upsample, name=f"up_blocks_{i}",
            )(x)
        x = GroupNormAct(c.norm_num_groups, eps=1e-6, dtype=dt, name="conv_norm_out")(x)
        return nn.Conv(c.out_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """Encoder + decoder + quant convs. `encode_mean` is the deterministic path the
    whole framework uses: moments' mean, no posterior sampling."""

    config: VAEConfig = VAEConfig()

    def setup(self):
        dt = self.config.jnp_dtype
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=dt, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=dt, name="post_quant_conv")

    def encode_moments(self, x: Array) -> Array:
        """[B,H,W,3] in [-1,1] -> [B,H/8,W/8,8] (mean ++ logvar)."""
        return self.quant_conv(self.encoder(x))

    def encode_mean(self, x: Array) -> Array:
        """Deterministic latent: posterior mean (NOT scaled by scaling_factor)."""
        moments = self.encode_moments(x)
        mean, _ = jnp.split(moments, 2, axis=-1)
        return mean

    def decode(self, z: Array) -> Array:
        """[B,h,w,4] (unscaled) -> [B,8h,8w,3]."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: Array) -> Array:
        """Deterministic autoencode roundtrip (for tests / init)."""
        return self.decode(self.encode_mean(x))
