"""Sub-pixel upsampler decomposition (`layers._SubpixelConv3x3`) — exactness vs
the materialized nearest2x->conv3x3 path, param-tree identity, and VAE wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_e2e_ft_tpu.models.layers import Upsample
from diffusion_e2e_ft_tpu.models.vae import AutoencoderKL, VAEConfig


def _pair(h=12, w=10, c=8, cout=16, seed=0):
    x = jnp.asarray(np.random.default_rng(seed).normal(size=(2, h, w, c)), jnp.float32)
    ref_mod = Upsample(cout)
    sub_mod = Upsample(cout, subpixel=True)
    params = ref_mod.init(jax.random.key(seed), x)
    return x, ref_mod, sub_mod, params


def test_matches_resize_conv_exactly():
    x, ref_mod, sub_mod, params = _pair()
    ref = ref_mod.apply(params, x)
    out = sub_mod.apply(params, x)
    assert out.shape == ref.shape == (2, 24, 20, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_param_tree_identical():
    """Same init tree either way: checkpoints/converter never see the flag."""
    x, ref_mod, sub_mod, _ = _pair()
    pr = jax.tree.map(lambda a: (a.shape, str(a.dtype)), ref_mod.init(jax.random.key(1), x))
    ps = jax.tree.map(lambda a: (a.shape, str(a.dtype)), sub_mod.init(jax.random.key(1), x))
    assert pr == ps


def test_odd_target_uses_resize_path():
    """Explicit odd out_hw (skip-reconnect) must keep the resize path."""
    x, _, sub_mod, params = _pair(h=6, w=5)
    out = sub_mod.apply(params, x, out_hw=(13, 11))
    assert out.shape == (2, 13, 11, 16)


def test_gradients_match():
    x, ref_mod, sub_mod, params = _pair(h=8, w=8, c=4, cout=4, seed=3)

    def loss(mod):
        def f(p, x):
            return jnp.sum(jnp.sin(mod.apply(p, x)))
        return jax.grad(f, argnums=(0, 1))(params, x)

    gr, gs = loss(ref_mod), loss(sub_mod)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_vae_decoder_flag_equivalence():
    """Whole-decoder output identical with subpixel_upsample on/off."""
    cfg = dict(block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4)
    vae_off = AutoencoderKL(VAEConfig(**cfg))
    vae_on = AutoencoderKL(VAEConfig(subpixel_upsample=True, **cfg))
    z = jnp.asarray(np.random.default_rng(5).normal(size=(1, 8, 8, 4)), jnp.float32)
    params = jax.jit(vae_off.init)(jax.random.key(7), jnp.ones((1, 64, 64, 3)))
    dec_off = vae_off.apply(params, z, method=AutoencoderKL.decode)
    dec_on = vae_on.apply(params, z, method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec_on), np.asarray(dec_off), atol=3e-5)
