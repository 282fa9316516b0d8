import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_e2e_ft_tpu.ops import noise as N


def test_zeros():
    z = N.zeros((2, 8, 8, 4))
    assert z.shape == (2, 8, 8, 4)
    assert float(jnp.abs(z).max()) == 0.0


def test_gaussian_deterministic_in_key():
    k = jax.random.key(0)
    a = N.gaussian(k, (2, 16, 16, 4))
    b = N.gaussian(k, (2, 16, 16, 4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = N.gaussian(jax.random.key(1), (2, 16, 16, 4))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_pyramid_unit_std_and_shape():
    k = jax.random.key(0)
    x = N.pyramid(k, (2, 32, 40, 4))
    assert x.shape == (2, 32, 40, 4)
    np.testing.assert_allclose(float(jnp.std(x, ddof=1)), 1.0, rtol=1e-5)


def test_pyramid_deterministic_in_key():
    k = jax.random.key(7)
    a = N.pyramid(k, (1, 16, 16, 4))
    b = N.pyramid(k, (1, 16, 16, 4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_octave_sizes_break_at_one():
    sizes = N._octave_sizes(64, 64, np.array([2.0] * 10))
    assert sizes[0] == (64, 64)
    # strictly shrinking, stops at 1
    assert sizes[-1][0] == 1 or sizes[-1][1] == 1 or len(sizes) == 10
    for (h0, w0), (h1, w1) in zip(sizes, sizes[1:]):
        assert h1 <= h0 and w1 <= w0


def test_pyramid_geowizard_timestep_scaling():
    k = jax.random.key(0)
    x = N.pyramid_geowizard(k, (2, 16, 16, 4), jnp.asarray([999, 999]))
    assert x.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(float(jnp.std(x, ddof=1)), 1.0, rtol=1e-5)
    # t=0 scales away every octave => result is the (normalized) base gaussian
    y = N.pyramid_geowizard(k, (2, 16, 16, 4), jnp.asarray([0, 0]))
    base = N.pyramid(k, (2, 16, 16, 4), timestep_scale=jnp.asarray([0.0, 0.0]), base=1.5, spread=1.5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(base), atol=1e-6)


def test_make_noise_dispatch():
    k = jax.random.key(0)
    assert float(jnp.abs(N.make_noise(None, None, (1, 4, 4, 4))).max()) == 0.0
    assert float(jnp.abs(N.make_noise("zeros", None, (1, 4, 4, 4))).max()) == 0.0
    g = N.make_noise("gaussian", k, (1, 4, 4, 4))
    assert float(jnp.abs(g).max()) > 0
    p = N.make_noise("pyramid", k, (1, 16, 16, 4))
    assert p.shape == (1, 16, 16, 4)
    with pytest.raises(ValueError):
        N.make_noise("bogus", k, (1, 4, 4, 4))
    with pytest.raises(ValueError):
        N.make_noise("gaussian", None, (1, 4, 4, 4))
