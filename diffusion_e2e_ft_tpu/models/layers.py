"""Shared building blocks for the SD2 model zoo (NHWC, Flax linen).

Sub-module names intentionally mirror the HF checkpoint key structure (with `.N` list
indices flattened to `_N`) so `models/convert.py` can map published weights with one
generic rule instead of a hand-written table per layer.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_e2e_ft_tpu import kernels

Array = jax.Array

# Normalization layers run in fp32 islands by default (the precision-critical spots
# for checkpoint parity); perf experiments may set this to jnp.bfloat16.
NORM_DTYPE = jnp.float32


def timestep_embedding(
    timesteps: Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> Array:
    """Sinusoidal timestep features [B, dim] (SD2 layout: cos-first)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = jnp.asarray(timesteps, jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def sincos_projection(x: Array, dim: int, *, flip_sin_to_cos: bool = True) -> Array:
    """Sin/cos featurization of a flat conditioning vector (GeoWizard's switcher path:
    each scalar is embedded like a timestep, features concatenated)."""
    b, n = x.shape
    flat = timestep_embedding(
        x.reshape(-1), dim, flip_sin_to_cos=flip_sin_to_cos, downscale_freq_shift=1.0
    )
    return flat.reshape(b, n * dim)


class TimestepEmbedding(nn.Module):
    """Two-layer MLP lifting sinusoidal features to the embedding width."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear_2")(x)


class GroupNormAct(nn.Module):
    """GroupNorm with optional fused SiLU; parameter tree identical to nn.GroupNorm
    (scale/bias leaves), compute dispatched to the fused Pallas kernel on TPU
    (kernels/groupnorm.py) with fp32 statistics either way."""

    groups: int
    eps: float = 1e-5
    silu: bool = True
    dtype: jnp.dtype = jnp.float32  # output dtype

    @nn.compact
    def __call__(self, x: Array, return_params: bool = False):
        from diffusion_e2e_ft_tpu.kernels.groupnorm import group_norm_silu

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if return_params:  # fused GN->conv path reads the params, skips the apply
            return scale, bias
        return group_norm_silu(x, scale, bias, self.groups, self.eps, self.silu).astype(
            self.dtype
        )


class _Conv3x3Params(nn.Module):
    """Parameter holder tree-identical to `nn.Conv(features, (3, 3))` (kernel HWIO
    fp32 lecun-normal, bias zeros) for the fused GN+SiLU->conv dispatch."""

    features: int

    @nn.compact
    def __call__(self, in_channels: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, in_channels, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class ResnetBlock(nn.Module):
    """GN -> SiLU -> conv3x3 (+ time-emb shift) -> GN -> SiLU -> conv3x3, residual.

    With `fused=True` both GN+SiLU->conv pairs dispatch to the fused Pallas kernel
    (`kernels/gn_conv.py` — one VMEM-resident pass instead of XLA's slow stats
    reduce + materialized normalize; falls back to the identical-math XLA
    composite off-TPU or at ineligible shapes). The parameter tree is identical
    in both modes, so checkpoints are interchangeable."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    use_time_emb: bool = True
    fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None) -> Array:
        if self.fused:
            return self._fused_call(x, temb)
        residual = x
        h = GroupNormAct(self.groups, eps=self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = GroupNormAct(self.groups, eps=self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return residual + h

    def _fused_call(self, x: Array, temb: Optional[Array]) -> Array:
        from diffusion_e2e_ft_tpu.kernels.gn_conv import gn_silu_conv3x3

        residual = x
        x = x.astype(self.dtype)
        s1, b1 = GroupNormAct(self.groups, eps=self.eps, dtype=self.dtype, name="norm1")(
            x, return_params=True
        )
        k1, cb1 = _Conv3x3Params(self.out_channels, name="conv1")(x.shape[-1])
        h = gn_silu_conv3x3(x, s1, b1, self.groups, self.eps, k1, cb1)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        s2, b2 = GroupNormAct(self.groups, eps=self.eps, dtype=self.dtype, name="norm2")(
            h, return_params=True
        )
        k2, cb2 = _Conv3x3Params(self.out_channels, name="conv2")(h.shape[-1])
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return gn_silu_conv3x3(
            h, s2, b2, self.groups, self.eps, k2, cb2, residual=residual
        )


class Downsample(nn.Module):
    """Stride-2 conv. The VAE encoder variant pads bottom/right only (asymmetric),
    matching the reference weights' expected spatial phase."""

    channels: int
    asymmetric: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.asymmetric:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = ((1, 1), (1, 1))
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=pad,
            dtype=self.dtype, name="conv",
        )(x)


class _SubpixelConv3x3(nn.Module):
    """conv3x3(nearest2x(x)) computed WITHOUT materializing the 2x tensor.

    A 3x3 conv over a nearest-2x-upsampled grid decomposes exactly by output
    parity (a, b): out[2i+a, 2j+b] sees x rows {i+a-1, i+a} and cols
    {j+b-1, j+b} with 2x2 effective kernels whose taps are sums of the 3x3
    taps (rows a=0 -> (w0, w1+w2), a=1 -> (w0+w1, w2); same for columns).
    That is one [2, 2, C, 4*Cout] conv over the (H+1)x(W+1)-padded input plus
    a depth-to-space interleave — 16 vs 36 MACs per (cin, cout, output-pixel)
    (2.25x fewer FLOPs) and the [2H, 2W, C] upsampled tensor (302 MB at the
    768px decoder's last stage) never touches HBM. Weight sums fold in fp32
    at trace time; math is exact up to fp reassociation (pinned by
    tests/test_subpixel_upsample.py).

    Param tree matches `nn.Conv(name="conv")` (kernel [3,3,C,Cout] + bias) so
    checkpoints and the HF converter are oblivious to which path runs."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        bsz, h, w, cin = x.shape
        cout = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, cout), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)

        wk = kernel.astype(jnp.float32)
        rows = (
            jnp.stack([wk[0], wk[1] + wk[2]]),  # even output rows
            jnp.stack([wk[0] + wk[1], wk[2]]),  # odd output rows
        )
        quads = []
        for a in (0, 1):
            r = rows[a]
            quads.append(jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1))  # b = 0
            quads.append(jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1))  # b = 1
        w4 = jnp.concatenate(quads, axis=-1).astype(self.dtype)  # [2, 2, C, 4*Cout]

        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, w4, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )  # [B, H+1, W+1, 4*Cout]; window (p, q) covers x[p-1..p, q-1..q]
        y00 = y[:, 0:h, 0:w, 0 * cout : 1 * cout]
        y01 = y[:, 0:h, 1 : w + 1, 1 * cout : 2 * cout]
        y10 = y[:, 1 : h + 1, 0:w, 2 * cout : 3 * cout]
        y11 = y[:, 1 : h + 1, 1 : w + 1, 3 * cout : 4 * cout]
        z = jnp.stack(
            [jnp.stack([y00, y01], axis=3), jnp.stack([y10, y11], axis=3)], axis=2
        )  # [B, H, 2, W, 2, Cout]
        out = z.reshape(bsz, 2 * h, 2 * w, cout) + bias.astype(self.dtype)
        return out


class Upsample(nn.Module):
    """Nearest 2x (or to an explicit target size, so odd skip sizes reconnect) + conv.

    `subpixel=True` routes the exact-2x case through the depth-to-space
    decomposition (`_SubpixelConv3x3`, identical params and math); explicit
    odd targets always take the resize path."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    subpixel: bool = False

    @nn.compact
    def __call__(self, x: Array, out_hw: Optional[tuple] = None) -> Array:
        b, h, w, c = x.shape
        target = out_hw if out_hw is not None else (h * 2, w * 2)
        if self.subpixel and target == (h * 2, w * 2):
            return _SubpixelConv3x3(self.channels, dtype=self.dtype, name="conv")(x)
        x = jax.image.resize(x, (b, target[0], target[1], c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None; `joint=True` runs the
    GeoWizard cross-task variant (K/V unioned across the two task halves)."""

    num_heads: int
    head_dim: int
    joint: bool = False
    out_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, lq = q.shape[0], q.shape[1]
        lk = k.shape[1]
        q = q.reshape(b, lq, self.num_heads, self.head_dim)
        k = k.reshape(b, lk, self.num_heads, self.head_dim)
        v = v.reshape(b, lk, self.num_heads, self.head_dim)

        if self.joint and context is None:
            out = kernels.joint_attention(q, k, v)
        else:
            out = kernels.attention(q, k, v)
        out = out.reshape(b, lq, inner)
        return nn.Dense(inner, use_bias=self.out_bias, dtype=self.dtype, name="to_out_0")(out)


class GEGLU(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.out_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers' GEGLU uses EXACT (erf) gelu, not the tanh approximation
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class TransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU-FF, all residual (SD2 basic block)."""

    num_heads: int
    head_dim: int
    joint_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=NORM_DTYPE, name="norm1")(x).astype(self.dtype)
        x = x + CrossAttention(
            self.num_heads, self.head_dim, joint=self.joint_attention,
            dtype=self.dtype, name="attn1",
        )(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=NORM_DTYPE, name="norm2")(x).astype(self.dtype)
        x = x + CrossAttention(
            self.num_heads, self.head_dim, dtype=self.dtype, name="attn2"
        )(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=NORM_DTYPE, name="norm3")(x).astype(self.dtype)
        return x + FeedForward(self.num_heads * self.head_dim, dtype=self.dtype, name="ff")(h)


class SpatialTransformer(nn.Module):
    """GN -> linear proj_in -> N transformer blocks -> linear proj_out, residual.

    SD2 uses linear (not 1x1-conv) projections (`use_linear_projection=True`).
    """

    num_heads: int
    head_dim: int
    depth: int = 1
    groups: int = 32
    joint_attention: bool = False
    use_linear_projection: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, h, w, c = x.shape
        residual = x
        inner = self.num_heads * self.head_dim
        hidden = GroupNormAct(self.groups, eps=1e-6, silu=False, dtype=self.dtype, name="norm")(x)
        hidden = hidden.reshape(b, h * w, c)
        if self.use_linear_projection:
            hidden = nn.Dense(inner, dtype=self.dtype, name="proj_in")(hidden)
        else:
            hidden = hidden.reshape(b, h, w, c)
            hidden = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(hidden)
            hidden = hidden.reshape(b, h * w, inner)
        for i in range(self.depth):
            hidden = TransformerBlock(
                self.num_heads, self.head_dim, joint_attention=self.joint_attention,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(hidden, context)
        if self.use_linear_projection:
            hidden = nn.Dense(c, dtype=self.dtype, name="proj_out")(hidden)
            hidden = hidden.reshape(b, h, w, c)
        else:
            hidden = hidden.reshape(b, h, w, inner)
            hidden = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(hidden)
        return hidden + residual


class VAEAttention(nn.Module):
    """Single-head spatial self-attention used by the VAE mid blocks."""

    channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        residual = x
        hidden = GroupNormAct(self.groups, eps=self.eps, silu=False, dtype=self.dtype, name="group_norm")(x)
        hidden = hidden.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(hidden)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(hidden)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(hidden)
        out = kernels.attention(
            q.reshape(b, h * w, 1, c), k.reshape(b, h * w, 1, c), v.reshape(b, h * w, 1, c)
        ).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, h, w, c) + residual
