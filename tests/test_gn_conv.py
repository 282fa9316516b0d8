"""Fused GN(+SiLU)->conv3x3 kernel numerics (Pallas interpreter) vs XLA and torch,
plus ResnetBlock fused/standard interchangeability (same param tree, same math).

Replaces the decoder resnet hot path the reference gets from diffusers
(`/root/reference/Marigold/marigold/marigold_pipeline.py:481-538` ->
diffusers AutoencoderKL GN->SiLU->conv pairs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_e2e_ft_tpu.kernels import gn_conv, groupnorm

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



@pytest.fixture(autouse=True)
def interpret_mode():
    gn_conv.INTERPRET = True
    groupnorm.INTERPRET = True
    yield
    gn_conv.INTERPRET = False
    groupnorm.INTERPRET = False


def _torch_pair(x, scale, bias, groups, eps, silu, kernel, conv_bias):
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NCHW
    gn = torch.nn.GroupNorm(groups, x.shape[-1], eps=eps)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        y = gn(t)
        if silu:
            y = torch.nn.functional.silu(y)
        w = torch.from_numpy(np.transpose(kernel, (3, 2, 0, 1)))  # OIHW
        out = torch.nn.functional.conv2d(y, w, torch.from_numpy(conv_bias), padding=1)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("impl", ["v1", "v2"])
@pytest.mark.parametrize(
    "b,h,w,c,co,silu",
    [(1, 16, 24, 128, 128, True), (2, 8, 10, 128, 256, True), (1, 16, 12, 256, 128, False)],
)
def test_matches_torch(b, h, w, c, co, silu, impl):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    s = rng.normal(size=(c,)).astype(np.float32)
    bi = rng.normal(size=(c,)).astype(np.float32)
    k = (rng.normal(size=(3, 3, c, co)) * 0.05).astype(np.float32)
    cb = rng.normal(size=(co,)).astype(np.float32)
    fn = gn_conv._pallas_gn_conv if impl == "v1" else gn_conv._pallas_gn_conv_v2
    out = fn(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(bi), 32, 1e-6, silu,
        jnp.asarray(k), jnp.asarray(cb),
    )
    ref = _torch_pair(x, s, bi, 32, 1e-6, silu, k, cb)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_single_row_block():
    """h == row block: both halo branches masked out (grid of one row block)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 8, 12, 128)).astype(np.float32)
    s = np.ones(128, np.float32)
    bi = np.zeros(128, np.float32)
    k = (rng.normal(size=(3, 3, 128, 128)) * 0.05).astype(np.float32)
    cb = np.zeros(128, np.float32)
    out = gn_conv._pallas_gn_conv(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(bi), 32, 1e-6, True,
        jnp.asarray(k), jnp.asarray(cb),
    )
    ref = _torch_pair(x, s, bi, 32, 1e-6, True, k, cb)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_gradient_through_dispatch():
    """custom_vjp backward (XLA recompute) equals differentiating the composite."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 8, 128)).astype(np.float32))
    s = jnp.ones((128,), jnp.float32)
    bi = jnp.zeros((128,), jnp.float32)
    k = jnp.asarray((rng.normal(size=(3, 3, 128, 128)) * 0.05).astype(np.float32))
    cb = jnp.zeros((128,), jnp.float32)

    def f(x):
        return gn_conv.gn_silu_conv3x3(x, s, bi, 32, 1e-6, k, cb).sum()

    g_fused = jax.grad(f)(x)
    g_ref = jax.grad(
        lambda x: gn_conv._xla_gn_conv(x, s, bi, 32, 1e-6, True, k, cb, None).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-4, rtol=1e-4)


def test_dispatch_falls_back_on_ineligible_shapes():
    """Non-lane-aligned channels route to the XLA composite (same answer)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 96)).astype(np.float32))
    s = jnp.ones((96,), jnp.float32)
    bi = jnp.zeros((96,), jnp.float32)
    k = jnp.asarray((rng.normal(size=(3, 3, 96, 96)) * 0.05).astype(np.float32))
    out = gn_conv.gn_silu_conv3x3(x, s, bi, 32, 1e-6, k, None)
    ref = gn_conv._xla_gn_conv(x, s, bi, 32, 1e-6, True, k, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0, rtol=0)


def test_resnet_block_fused_matches_standard():
    """Same params, fused=True vs fused=False ResnetBlock: identical math
    (fp32, CPU path) and interchangeable param trees."""
    from diffusion_e2e_ft_tpu.models.layers import ResnetBlock

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 128)).astype(np.float32))
    std = ResnetBlock(128, groups=32, eps=1e-6, use_time_emb=False, fused=False)
    fused = ResnetBlock(128, groups=32, eps=1e-6, use_time_emb=False, fused=True)
    params = std.init(jax.random.key(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(
        fused.init(jax.random.key(0), x)
    )
    y_std = std.apply(params, x)
    y_fused = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_std), atol=2e-5, rtol=2e-5)


def test_resnet_block_fused_with_temb_and_shortcut():
    from diffusion_e2e_ft_tpu.models.layers import ResnetBlock

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 128)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
    std = ResnetBlock(256, groups=32, eps=1e-6, use_time_emb=True, fused=False)
    fused = ResnetBlock(256, groups=32, eps=1e-6, use_time_emb=True, fused=True)
    params = std.init(jax.random.key(0), x, temb)
    y_std = std.apply(params, x, temb)
    y_fused = fused.apply(params, x, temb)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_std), atol=2e-5, rtol=2e-5)
