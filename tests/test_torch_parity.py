"""Micro-parity tests of our NHWC Flax layers against torch (CPU) reference ops.

These pin down the layout/numeric contracts the HF weight converter relies on:
conv OIHW->HWIO, linear transpose, GroupNorm channel grouping, attention math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from flax import linen as nn

from diffusion_e2e_ft_tpu.kernels.attention import _xla_attention, joint_attention
from diffusion_e2e_ft_tpu.models.convert import state_dict_to_params


def test_conv3x3_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 10, 12)).astype(np.float32)  # NCHW for torch
    w = rng.normal(size=(7, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=(7,)).astype(np.float32)

    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), padding=1).numpy()

    params = state_dict_to_params({"conv.weight": w, "conv.bias": b})
    conv = nn.Conv(7, (3, 3), padding=1)
    out = conv.apply({"params": params["conv"]}, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=1e-4)


def test_strided_conv_parity():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 16, 16)).astype(np.float32)
    w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)
    b = np.zeros((8,), np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=2, padding=1).numpy()
    params = state_dict_to_params({"conv.weight": w, "conv.bias": b})
    conv = nn.Conv(8, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    out = conv.apply({"params": params["conv"]}, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=1e-4)


def test_asymmetric_downsample_parity():
    """The VAE encoder downsample: pad (0,1,0,1) then stride-2 VALID conv."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 15, 17)).astype(np.float32)
    w = rng.normal(size=(4, 4, 3, 3)).astype(np.float32)
    b = rng.normal(size=(4,)).astype(np.float32)
    xt = F.pad(torch.from_numpy(x), (0, 1, 0, 1))
    ref = F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b), stride=2).numpy()

    from diffusion_e2e_ft_tpu.models.layers import Downsample

    params = state_dict_to_params({"conv.weight": w, "conv.bias": b})
    ds = Downsample(4, asymmetric=True)
    out = ds.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=1e-4)


def test_groupnorm_parity():
    """flax GroupNorm on NHWC == torch GroupNorm on NCHW (consecutive-channel groups)."""
    rng = np.random.default_rng(3)
    C = 16
    x = rng.normal(size=(2, C, 6, 6)).astype(np.float32)
    w = rng.normal(size=(C,)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    tgn = torch.nn.GroupNorm(4, C, eps=1e-6)
    with torch.no_grad():
        tgn.weight.copy_(torch.from_numpy(w))
        tgn.bias.copy_(torch.from_numpy(b))
    with torch.no_grad():
        ref = tgn(torch.from_numpy(x)).numpy()

    gn = nn.GroupNorm(4, epsilon=1e-6)
    out = gn.apply(
        {"params": {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}},
        jnp.asarray(np.moveaxis(x, 1, -1)),
    )
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=1e-4)


def test_layernorm_parity():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 5, 8)).astype(np.float32)
    w = rng.normal(size=(8,)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    ref = F.layer_norm(torch.from_numpy(x), (8,), torch.from_numpy(w), torch.from_numpy(b), eps=1e-5).numpy()
    ln = nn.LayerNorm(epsilon=1e-5)
    out = ln.apply({"params": {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_linear_parity():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 6)).astype(np.float32)
    w = rng.normal(size=(4, 6)).astype(np.float32)  # torch (out, in)
    b = rng.normal(size=(4,)).astype(np.float32)
    ref = (torch.from_numpy(x) @ torch.from_numpy(w).T + torch.from_numpy(b)).numpy()
    params = state_dict_to_params({"fc.weight": w, "fc.bias": b})
    out = nn.Dense(4).apply({"params": params["fc"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_attention_parity():
    """Our attention == torch scaled_dot_product_attention (BTNH vs BNTD layouts)."""
    rng = np.random.default_rng(6)
    B, L, N, D = 2, 9, 3, 8
    q = rng.normal(size=(B, L, N, D)).astype(np.float32)
    k = rng.normal(size=(B, L, N, D)).astype(np.float32)
    v = rng.normal(size=(B, L, N, D)).astype(np.float32)
    ref = F.scaled_dot_product_attention(
        torch.from_numpy(np.transpose(q, (0, 2, 1, 3))),
        torch.from_numpy(np.transpose(k, (0, 2, 1, 3))),
        torch.from_numpy(np.transpose(v, (0, 2, 1, 3))),
    ).numpy()
    out = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 2, 1, 3)), ref, atol=1e-5)


def test_joint_attention_parity():
    """Joint attention == torch attention with KV concatenated across batch halves."""
    rng = np.random.default_rng(7)
    B, L, N, D = 2, 5, 2, 4  # total batch 2B = 4... here B pairs: 2 halves of 2
    q = rng.normal(size=(2 * B, L, N, D)).astype(np.float32)
    k = rng.normal(size=(2 * B, L, N, D)).astype(np.float32)
    v = rng.normal(size=(2 * B, L, N, D)).astype(np.float32)

    def tt(x):  # BTNH -> BNTD torch tensor
        return torch.from_numpy(np.transpose(x, (0, 2, 1, 3)))

    outs = []
    for half in range(2):
        for i in range(B):
            qi = tt(q[half * B + i : half * B + i + 1])
            k_cat = torch.cat([tt(k[i : i + 1]), tt(k[B + i : B + i + 1])], dim=2)
            v_cat = torch.cat([tt(v[i : i + 1]), tt(v[B + i : B + i + 1])], dim=2)
            outs.append(F.scaled_dot_product_attention(qi, k_cat, v_cat).numpy())
    ref = np.concatenate(outs, axis=0)
    out = joint_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 2, 1, 3)), ref, atol=1e-5)


def test_silu_gelu_parity():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(4, 7)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(nn.silu(jnp.asarray(x))), F.silu(torch.from_numpy(x)).numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(nn.gelu(jnp.asarray(x))), F.gelu(torch.from_numpy(x), approximate="tanh").numpy(), atol=1e-4
    )
    # the GEGLU path needs the EXACT erf gelu (diffusers semantics)
    np.testing.assert_allclose(
        np.asarray(nn.gelu(jnp.asarray(x), approximate=False)),
        F.gelu(torch.from_numpy(x)).numpy(), atol=1e-6,
    )


def test_nearest_upsample_parity():
    rng = np.random.default_rng(9)
    x = rng.normal(size=(1, 3, 5, 6)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    out = jax.image.resize(xj, (1, 10, 12, 3), method="nearest")
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=1e-6)


def test_bilinear_resize_parity():
    """jax bilinear (antialias on downscale) vs torch antialiased bilinear."""
    rng = np.random.default_rng(10)
    x = rng.normal(size=(1, 3, 32, 48)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), size=(16, 24), mode="bilinear", antialias=True
    ).numpy()
    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    out = jax.image.resize(xj, (1, 16, 24, 3), method="bilinear", antialias=True)
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=2e-2)
