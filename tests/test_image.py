import jax.numpy as jnp
import numpy as np

from diffusion_e2e_ft_tpu.ops import image as I


def test_max_edge_size():
    assert I.max_edge_size(480, 640, 768) == (576, 768)
    assert I.max_edge_size(640, 480, 768) == (768, 576)
    assert I.max_edge_size(100, 100, 768) == (768, 768)
    # non-integer factor floors like the reference's int()
    assert I.max_edge_size(375, 500, 768) == (576, 768)


def test_resize_shapes():
    img = jnp.ones((480, 640, 3))
    out = I.resize_max_res(img, 768)
    assert out.shape == (576, 768, 3)
    batched = jnp.ones((2, 480, 640, 3))
    out = I.resize_max_res(batched, 64)
    assert out.shape == (2, 48, 64, 3)


def test_resize_preserves_constant():
    img = jnp.full((64, 64, 3), 0.5)
    for m in ["bilinear", "bicubic", "nearest"]:
        out = I.resize(img, (32, 48), method=m)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_normalize_roundtrip():
    img = jnp.asarray(np.arange(256, dtype=np.float32).reshape(16, 16, 1))
    n = I.normalize_rgb(img)
    assert float(n.min()) >= -1.0 and float(n.max()) <= 1.0
    back = I.denormalize_rgb(n)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-4)


def test_pad_unpad_roundtrip():
    img = jnp.asarray(np.random.default_rng(0).normal(size=(1, 37, 50, 3)).astype(np.float32))
    padded, hw = I.pad_to_multiple(img, 32)
    assert padded.shape == (1, 64, 64, 3)
    out = I.unpad(padded, hw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    # already-aligned input is unchanged
    img2 = jnp.ones((32, 64, 3))
    padded2, _ = I.pad_to_multiple(img2, 32)
    assert padded2.shape == (32, 64, 3)


def test_colorize_depth():
    depth = np.linspace(0, 1, 64 * 64, dtype=np.float32).reshape(64, 64)
    rgb = I.colorize_depth(depth)
    assert rgb.shape == (64, 64, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    mask = np.zeros((64, 64), bool)
    rgb = I.colorize_depth(depth, valid_mask=mask)
    np.testing.assert_array_equal(rgb, 0.0)


def test_colorize_normals():
    n = np.zeros((8, 8, 3), np.float32)
    n[..., 2] = 1.0
    rgb = I.colorize_normals(n)
    assert rgb.dtype == np.uint8
    np.testing.assert_array_equal(rgb[..., 2], 255)
    np.testing.assert_array_equal(rgb[..., 0], 127)


def test_uint16_export():
    d = np.asarray([0.0, 0.5, 1.0], np.float32)
    u = I.to_uint16(d)
    assert u.dtype == np.uint16
    np.testing.assert_array_equal(u, [0, 32767, 65535])


def test_chw_hwc():
    x = np.arange(2 * 3 * 4).reshape(3, 2, 4)
    hwc = I.chw2hwc(x)
    assert hwc.shape == (2, 4, 3)
    np.testing.assert_array_equal(I.hwc2chw(hwc), x)
