"""Composite-block parity vs torch: ResnetBlock, SpatialTransformer (linear + conv
projections, incl. GeoWizard joint attention), full down/up blocks, the VAE
mid-attention block, the timestep/class embedding path, and the FULL UNet tower —
all with shared random weights routed through `models/convert.py`.

The torch modules below are golden references re-implementing the SD2/diffusers
block semantics from primitives (reference structure:
`GeoWizard/geowizard/models/unet_2d_condition.py:360-386,984-999`,
`unet_2d_blocks.py`, `attention.py`), with diffusers-matching state-dict names so
one `state_dict_to_params` call maps them onto our NHWC Flax modules. This is the
no-published-weights substitute for checkpoint-level parity: when real weights
arrive, any divergence is already localized to a block.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

from diffusion_e2e_ft_tpu.models import UNet2DCondition, UNetConfig
from diffusion_e2e_ft_tpu.models.convert import state_dict_to_params
from diffusion_e2e_ft_tpu.models.layers import (
    ResnetBlock,
    SpatialTransformer,
    TimestepEmbedding,
    VAEAttention,
    timestep_embedding,
)

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min

torch.manual_seed(0)


def _sd(module: tnn.Module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1))


def _to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


# ---------------------------------------------------------------------------
# Torch golden blocks (diffusers-matching names)
# ---------------------------------------------------------------------------


class TResnetBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, groups=4, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_dim, out_ch)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class TAttention(tnn.Module):
    def __init__(self, dim, heads, dim_head, context_dim=None, joint=False):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head, self.joint = heads, dim_head, joint
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(context_dim or dim, inner, bias=False)
        self.to_v = tnn.Linear(context_dim or dim, inner, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, dim)])

    def _heads(self, t):
        b, l, _ = t.shape
        return t.reshape(b, l, self.heads, self.dim_head).permute(0, 2, 1, 3)

    def forward(self, x, context=None):
        ctx = x if context is None else context
        q, k, v = self._heads(self.to_q(x)), self._heads(self.to_k(ctx)), self._heads(self.to_v(ctx))
        if self.joint and context is None:
            # GeoWizard cross-task attention: each task-half attends over the
            # sequence-concat of BOTH halves' K/V (attention.py:480-497)
            b = q.shape[0] // 2
            k = torch.cat([torch.cat([k[:b], k[b:]], dim=2)] * 2, dim=0)
            v = torch.cat([torch.cat([v[:b], v[b:]], dim=2)] * 2, dim=0)
        out = F.scaled_dot_product_attention(q, k, v)
        b, h, l, d = out.shape
        out = out.permute(0, 2, 1, 3).reshape(b, l, h * d)
        return self.to_out[0](out)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TFeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = tnn.ModuleList([TGEGLU(dim, dim * mult), tnn.Dropout(0.0), tnn.Linear(dim * mult, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, dim_head, context_dim, joint=False):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TAttention(dim, heads, dim_head, joint=joint)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TAttention(dim, heads, dim_head, context_dim=context_dim)
        self.norm3 = tnn.LayerNorm(dim, eps=1e-5)
        self.ff = TFeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class TSpatialTransformer(tnn.Module):
    def __init__(self, c, heads, dim_head, context_dim, groups=4, linear=True, joint=False, depth=1):
        super().__init__()
        inner = heads * dim_head
        self.linear = linear
        self.norm = tnn.GroupNorm(groups, c, eps=1e-6)
        if linear:
            self.proj_in = tnn.Linear(c, inner)
            self.proj_out = tnn.Linear(inner, c)
        else:
            self.proj_in = tnn.Conv2d(c, inner, 1)
            self.proj_out = tnn.Conv2d(inner, c, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TTransformerBlock(inner, heads, dim_head, context_dim, joint=joint) for _ in range(depth)]
        )

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        hidden = self.norm(x)
        if self.linear:
            hidden = hidden.permute(0, 2, 3, 1).reshape(b, h * w, c)
            hidden = self.proj_in(hidden)
        else:
            hidden = self.proj_in(hidden)
            hidden = hidden.permute(0, 2, 3, 1).reshape(b, h * w, -1)
        for blk in self.transformer_blocks:
            hidden = blk(hidden, context)
        if self.linear:
            hidden = self.proj_out(hidden)
            hidden = hidden.reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            hidden = hidden.reshape(b, h, w, -1).permute(0, 3, 1, 2)
            hidden = self.proj_out(hidden)
        return hidden + res


class TVAEAttention(tnn.Module):
    def __init__(self, c, groups=4, eps=1e-6):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, c, eps=eps)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        hidden = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(hidden), self.to_k(hidden), self.to_v(hidden)
        out = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        out = self.to_out[0](out)
        return out.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


class TTimestepEmbedding(tnn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.linear_1 = tnn.Linear(in_dim, out_dim)
        self.linear_2 = tnn.Linear(out_dim, out_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


def t_sinusoid(timesteps, dim, flip_sin_to_cos=True, shift=0.0):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / (half - shift))
    args = timesteps.float()[:, None] * freqs[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


# ---------------------------------------------------------------------------
# Block-level tests
# ---------------------------------------------------------------------------

ATOL = 1e-4


def test_resnet_block_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 10, 16)).astype(np.float32)  # NHWC, in_ch 16
    temb = rng.normal(size=(2, 24)).astype(np.float32)
    ref_mod = TResnetBlock(16, 32, 24)
    ref = ref_mod(_nchw(x), torch.from_numpy(temb))

    blk = ResnetBlock(32, groups=4)
    params = state_dict_to_params(_sd(ref_mod))
    out = blk.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb))
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), atol=ATOL)


def test_resnet_block_same_channels_no_shortcut():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 6, 16)).astype(np.float32)
    temb = rng.normal(size=(1, 24)).astype(np.float32)
    ref_mod = TResnetBlock(16, 16, 24)
    ref = ref_mod(_nchw(x), torch.from_numpy(temb))
    blk = ResnetBlock(16, groups=4)
    out = blk.apply({"params": state_dict_to_params(_sd(ref_mod))}, jnp.asarray(x), jnp.asarray(temb))
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), atol=ATOL)


@pytest.mark.parametrize("linear", [True, False])
def test_spatial_transformer_parity(linear):
    rng = np.random.default_rng(2)
    C, heads, dh = 32, 2, 16
    x = rng.normal(size=(2, 6, 8, C)).astype(np.float32)
    ctx = rng.normal(size=(2, 5, 24)).astype(np.float32)
    ref_mod = TSpatialTransformer(C, heads, dh, context_dim=24, linear=linear)
    ref = ref_mod(_nchw(x), torch.from_numpy(ctx))

    st = SpatialTransformer(heads, dh, groups=4, use_linear_projection=linear)
    out = st.apply(
        {"params": state_dict_to_params(_sd(ref_mod))}, jnp.asarray(x), jnp.asarray(ctx)
    )
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), atol=ATOL)


def test_spatial_transformer_joint_attention_parity():
    """GeoWizard variant: attn1 unions K/V across the two task-batch halves."""
    rng = np.random.default_rng(3)
    C, heads, dh, B = 32, 2, 16, 2
    x = rng.normal(size=(2 * B, 4, 6, C)).astype(np.float32)
    ctx = rng.normal(size=(2 * B, 3, 24)).astype(np.float32)
    ref_mod = TSpatialTransformer(C, heads, dh, context_dim=24, linear=False, joint=True)
    ref = ref_mod(_nchw(x), torch.from_numpy(ctx))

    st = SpatialTransformer(heads, dh, groups=4, use_linear_projection=False, joint_attention=True)
    out = st.apply(
        {"params": state_dict_to_params(_sd(ref_mod))}, jnp.asarray(x), jnp.asarray(ctx)
    )
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), atol=ATOL)
    # sanity: the joint coupling is real — perturbing the second task half changes
    # the FIRST half's output (a constant shift won't do: GroupNorm removes it)
    x2 = np.array(x)
    x2[B:] = rng.normal(size=x2[B:].shape).astype(np.float32)
    out2 = st.apply({"params": state_dict_to_params(_sd(ref_mod))}, jnp.asarray(x2), jnp.asarray(ctx))
    assert np.abs(np.asarray(out2)[:B] - np.asarray(out)[:B]).max() > 1e-3


def test_vae_attention_parity():
    rng = np.random.default_rng(4)
    C = 32
    x = rng.normal(size=(2, 5, 7, C)).astype(np.float32)
    ref_mod = TVAEAttention(C)
    ref = ref_mod(_nchw(x))
    blk = VAEAttention(C, groups=4)
    out = blk.apply({"params": state_dict_to_params(_sd(ref_mod))}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), atol=ATOL)


def test_timestep_embedding_path_parity():
    """Sinusoidal featurization + 2-layer MLP, SD2 settings (cos-first, shift 0)."""
    t = np.array([0, 1, 999, 42], np.int64)
    sin_ref = t_sinusoid(torch.from_numpy(t), 32).numpy()
    sin_ours = np.asarray(timestep_embedding(jnp.asarray(t), 32))
    np.testing.assert_allclose(sin_ours, sin_ref, atol=1e-5)

    ref_mod = TTimestepEmbedding(32, 64)
    ref = ref_mod(torch.from_numpy(sin_ref))
    emb = TimestepEmbedding(64)
    out = emb.apply({"params": state_dict_to_params(_sd(ref_mod))}, jnp.asarray(sin_ref))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), atol=ATOL)


def test_class_projection_embedding_parity():
    """GeoWizard `class_embed_type='projection'`: the 10-dim switcher vector goes
    STRAIGHT into the TimestepEmbedding MLP — no sinusoidal featurization
    (unet_2d_condition.py:366-378)."""
    rng = np.random.default_rng(5)
    cls = rng.normal(size=(4, 10)).astype(np.float32)
    ref_mod = TTimestepEmbedding(10, 64)
    ref = ref_mod(torch.from_numpy(cls))
    emb = TimestepEmbedding(64)
    out = emb.apply({"params": state_dict_to_params(_sd(ref_mod))}, jnp.asarray(cls))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), atol=ATOL)


# ---------------------------------------------------------------------------
# Full down/up blocks and the whole tower
# ---------------------------------------------------------------------------


class TDownBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, heads, ctx_dim, layers=2, attn=True,
                 last=False, groups=4, linear=True, joint=False):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnetBlock(in_ch if j == 0 else out_ch, out_ch, temb_dim, groups) for j in range(layers)]
        )
        self.attentions = tnn.ModuleList(
            [TSpatialTransformer(out_ch, heads, out_ch // heads, ctx_dim, groups, linear, joint) for _ in range(layers)]
        ) if attn else None
        if not last:
            ds = tnn.Module()
            ds.conv = tnn.Conv2d(out_ch, out_ch, 3, stride=2, padding=1)
            self.downsamplers = tnn.ModuleList([ds])
        else:
            self.downsamplers = None

    def forward(self, x, temb, ctx):
        skips = []
        for j, res in enumerate(self.resnets):
            x = res(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, ctx)
            skips.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0].conv(x)
            skips.append(x)
        return x, skips


class TUpBlock(tnn.Module):
    def __init__(self, prev_ch, skip_chs, out_ch, temb_dim, heads, ctx_dim, attn=True,
                 last=False, groups=4, linear=True, joint=False):
        super().__init__()
        self.resnets = tnn.ModuleList()
        self.attentions = tnn.ModuleList() if attn else None
        ch = prev_ch
        for j, sc in enumerate(skip_chs):
            self.resnets.append(TResnetBlock(ch + sc, out_ch, temb_dim, groups))
            if attn:
                self.attentions.append(
                    TSpatialTransformer(out_ch, heads, out_ch // heads, ctx_dim, groups, linear, joint)
                )
            ch = out_ch
        if not last:
            us = tnn.Module()
            us.conv = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
            self.upsamplers = tnn.ModuleList([us])
        else:
            self.upsamplers = None

    def forward(self, x, skips, temb, ctx):
        for j, res in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = res(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, ctx)
        if self.upsamplers is not None:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class TUNet(tnn.Module):
    """Full SD2-topology tower at tiny width, mirroring UNet2DCondition's layout."""

    def __init__(self, cfg: UNetConfig, groups=4):
        super().__init__()
        chs = cfg.block_out_channels
        ted = cfg.time_embed_dim
        ctx = cfg.cross_attention_dim
        lin, joint = cfg.use_linear_projection, cfg.joint_attention
        self.cfg = cfg
        self.conv_in = tnn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        self.time_embedding = TTimestepEmbedding(chs[0], ted)
        if cfg.class_embed_proj_dim is not None:
            self.class_embedding = TTimestepEmbedding(cfg.class_embed_proj_dim, ted)
        self.down_blocks = tnn.ModuleList()
        in_ch = chs[0]
        for i, out_ch in enumerate(chs):
            self.down_blocks.append(
                TDownBlock(in_ch, out_ch, ted, cfg.num_attention_heads[i], ctx,
                           cfg.layers_per_block, cfg.cross_attention_levels[i],
                           last=i == len(chs) - 1, groups=groups, linear=lin, joint=joint)
            )
            in_ch = out_ch
        mid = tnn.Module()
        mid.resnets = tnn.ModuleList([TResnetBlock(chs[-1], chs[-1], ted, groups) for _ in range(2)])
        mid.attentions = tnn.ModuleList([
            TSpatialTransformer(chs[-1], cfg.num_attention_heads[-1], chs[-1] // cfg.num_attention_heads[-1],
                                ctx, groups, lin, joint)
        ])
        self.mid_block = mid
        self.up_blocks = tnn.ModuleList()
        rev = list(reversed(chs))
        rev_attn = list(reversed(cfg.cross_attention_levels))
        rev_heads = list(reversed(cfg.num_attention_heads))
        # skip channels per up block, mirroring the down-path skip stack
        skip_stack = [chs[0]]
        for i, out_ch in enumerate(chs):
            skip_stack += [out_ch] * cfg.layers_per_block
            if i != len(chs) - 1:
                skip_stack.append(out_ch)
        prev = chs[-1]
        for i, out_ch in enumerate(rev):
            n = cfg.layers_per_block + 1
            skips = list(reversed(skip_stack[-n:]))
            del skip_stack[-n:]
            self.up_blocks.append(
                TUpBlock(prev, skips, out_ch, ted, rev_heads[i], ctx, rev_attn[i],
                         last=i == len(rev) - 1, groups=groups, linear=lin, joint=joint)
            )
            prev = out_ch
        self.conv_norm_out = tnn.GroupNorm(groups, chs[0], eps=cfg.norm_eps)
        self.conv_out = tnn.Conv2d(chs[0], cfg.out_channels, 3, padding=1)

    def forward(self, x, t, ctx, class_labels=None):
        temb = self.time_embedding(t_sinusoid(t, self.cfg.block_out_channels[0]))
        if class_labels is not None:
            temb = temb + self.class_embedding(class_labels)
        x = self.conv_in(x)
        skips = [x]
        for blk in self.down_blocks:
            x, s = blk(x, temb, ctx)
            skips.extend(s)
        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, temb)
        for blk in self.up_blocks:
            n = self.cfg.layers_per_block + 1
            blk_skips = skips[-n:]
            del skips[-n:]
            x = blk(x, blk_skips, temb, ctx)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


def test_full_down_block_parity():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    temb = rng.normal(size=(2, 64)).astype(np.float32)
    ctx = rng.normal(size=(2, 4, 24)).astype(np.float32)
    ref_mod = TDownBlock(16, 32, 64, heads=2, ctx_dim=24)
    ref_x, ref_skips = ref_mod(_nchw(x), torch.from_numpy(temb), torch.from_numpy(ctx))

    from diffusion_e2e_ft_tpu.models.unet import _DownBlock

    cfg = UNetConfig.tiny(
        block_out_channels=(32, 32, 32, 32), cross_attention_dim=24,
        norm_num_groups=4,
    )
    blk = _DownBlock(cfg, level=0)
    params = state_dict_to_params(_sd(ref_mod))
    out, skips = blk.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref_x), atol=ATOL)
    assert len(skips) == len(ref_skips)
    for s, rs in zip(skips, ref_skips):
        np.testing.assert_allclose(np.asarray(s), _to_nhwc(rs), atol=ATOL)


def test_full_up_block_parity():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 4, 4, 32)).astype(np.float32)
    skips_np = [rng.normal(size=(2, 4, 4, 16)).astype(np.float32) for _ in range(3)]
    temb = rng.normal(size=(2, 64)).astype(np.float32)
    ctx = rng.normal(size=(2, 4, 24)).astype(np.float32)
    ref_mod = TUpBlock(32, [16, 16, 16], 32, 64, heads=2, ctx_dim=24)
    ref = ref_mod(_nchw(x), [_nchw(s) for s in skips_np], torch.from_numpy(temb), torch.from_numpy(ctx))

    from diffusion_e2e_ft_tpu.models.unet import _UpBlock

    cfg = UNetConfig.tiny(
        block_out_channels=(32, 32, 32, 32), cross_attention_dim=24, norm_num_groups=4,
        cross_attention_levels=(True, True, True, True),  # level 0 of the REVERSED
        # topology must have attention for this cross-attn up-block test
    )
    blk = _UpBlock(cfg, level=0)
    out = blk.apply(
        {"params": state_dict_to_params(_sd(ref_mod))},
        jnp.asarray(x), [jnp.asarray(s) for s in skips_np],
        jnp.asarray(temb), jnp.asarray(ctx),
    )
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), atol=ATOL)


@pytest.mark.parametrize(
    "cfg_kw",
    [
        # SD2-style: linear projections, cross-attn on first 3 levels
        dict(),
        # GeoWizard-style: conv projections, class embedding, joint attention
        dict(use_linear_projection=False, class_embed_proj_dim=10, joint_attention=True),
    ],
    ids=["sd2", "geowizard"],
)
def test_full_unet_tower_parity(cfg_kw):
    cfg = UNetConfig.tiny(norm_num_groups=4, **cfg_kw)
    rng = np.random.default_rng(8)
    joint = cfg.joint_attention
    B = 4 if joint else 2  # joint attention pairs batch halves
    x = rng.normal(size=(B, 16, 16, cfg.in_channels)).astype(np.float32)
    t = np.full((B,), 999, np.int64)
    ctx = rng.normal(size=(B, 3, cfg.cross_attention_dim)).astype(np.float32)
    cls = rng.normal(size=(B, 10)).astype(np.float32) if cfg.class_embed_proj_dim else None

    ref_mod = TUNet(cfg)
    with torch.no_grad():
        ref = ref_mod(
            _nchw(x), torch.from_numpy(t), torch.from_numpy(ctx),
            None if cls is None else torch.from_numpy(cls),
        )

    unet = UNet2DCondition(cfg)
    params = state_dict_to_params(_sd(ref_mod))
    out = unet.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        None if cls is None else jnp.asarray(cls),
    )
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), atol=2e-4)
