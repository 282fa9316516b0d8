"""Native C++ IO layer vs PIL/tarfile reference behavior."""

import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from diffusion_e2e_ft_tpu import native_io

pytestmark = pytest.mark.skipif(
    not native_io.build(), reason="native library could not be built"
)


def _png_bytes(arr, mode=None):
    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


class TestPngDecode:
    def test_rgb8(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
        out = native_io.decode_png(_png_bytes(img))
        np.testing.assert_array_equal(out, img)

    def test_gray16(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 65535, (24, 31), dtype=np.uint16)
        out = native_io.decode_png(_png_bytes(img, mode="I;16"))
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, img)

    def test_gray8(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        out = native_io.decode_png(_png_bytes(img))
        np.testing.assert_array_equal(out, img)

    def test_rgba(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (9, 11, 4), dtype=np.uint8)
        out = native_io.decode_png(_png_bytes(img))
        np.testing.assert_array_equal(out, img)

    def test_fused_depth_decode(self):
        depth_mm = np.random.default_rng(3).integers(0, 20000, (16, 16)).astype(np.uint16)
        out = native_io.decode_png16_depth(_png_bytes(depth_mm, mode="I;16"), 1000.0)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, depth_mm.astype(np.float32) / 1000.0, rtol=1e-6)

    def test_bad_data_raises(self):
        with pytest.raises(ValueError):
            native_io.decode_png(b"not a png")


class TestJpegDecode:
    def test_rgb_roundtrip_close(self):
        rng = np.random.default_rng(4)
        # smooth image so jpeg loss is small
        x = np.linspace(0, 255, 64, dtype=np.float32)
        img = np.stack([np.tile(x, (48, 1))] * 3, axis=-1).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=95)
        out = native_io.decode_jpeg(buf.getvalue())
        assert out.shape == img.shape
        ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())))
        np.testing.assert_allclose(out.astype(int), ref.astype(int), atol=2)

    def test_sniffing(self):
        img = np.zeros((8, 8, 3), np.uint8)
        png = _png_bytes(img)
        assert native_io.decode_image(png).shape == (8, 8, 3)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG")
        assert native_io.decode_image(buf.getvalue()).shape == (8, 8, 3)
        with pytest.raises(ValueError):
            native_io.decode_image(b"????")


class TestNativeTar:
    def test_index_and_reads(self, tmp_path):
        tar_path = str(tmp_path / "x.tar")
        payloads = {f"dir/file{i}.bin": os.urandom(100 + i * 37) for i in range(5)}
        with tarfile.open(tar_path, "w") as tar:
            for name, data in payloads.items():
                info = tarfile.TarInfo("./" + name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
        t = native_io.NativeTar(tar_path)
        assert len(t) == 5
        names = list(t.names())
        assert "./dir/file0.bin" in names
        for name, data in payloads.items():
            assert t.read(name) == data  # lookup without leading ./
            assert t.read("./" + name) == data
        with pytest.raises(KeyError):
            t.read("missing")
        t.close()

    def test_long_names(self, tmp_path):
        tar_path = str(tmp_path / "long.tar")
        long_name = "a/" * 60 + "leaf.bin"  # > 100 chars triggers GNU longname
        data = b"hello world" * 10
        with tarfile.open(tar_path, "w", format=tarfile.GNU_FORMAT) as tar:
            info = tarfile.TarInfo(long_name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        t = native_io.NativeTar(tar_path)
        assert t.read(long_name) == data


class TestDatasetIntegration:
    def test_eval_dataset_uses_native_path(self, tmp_path):
        """The tar-backed depth dataset must produce identical samples through the
        native reader and the tarfile/PIL fallback."""
        from diffusion_e2e_ft_tpu.data import depth_eval as D

        rng = np.random.default_rng(0)
        tar_path = str(tmp_path / "nyu.tar")
        with tarfile.open(tar_path, "w") as tar:
            rgb = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
            depth = rng.integers(500, 9000, (480, 640), dtype=np.uint16)
            for name, data in (
                ("rgb_00000.png", _png_bytes(rgb)),
                ("depth_00000.png", _png_bytes(depth, mode="I;16")),
            ):
                info = tarfile.TarInfo("./" + name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
        lp = str(tmp_path / "l.txt")
        with open(lp, "w") as f:
            f.write("rgb_00000.png depth_00000.png depth_00000.png\n")

        ds = D.DepthEvalDataset(D.SPECS["nyu_v2"], tar_path, lp)
        native_sample = ds[0]

        # force the fallback path
        was = native_io.AVAILABLE
        native_io.AVAILABLE = False
        try:
            ds2 = D.DepthEvalDataset(D.SPECS["nyu_v2"], tar_path, lp)
            pil_sample = ds2[0]
        finally:
            native_io.AVAILABLE = was

        np.testing.assert_array_equal(native_sample["rgb_int"], pil_sample["rgb_int"])
        np.testing.assert_allclose(
            native_sample["depth_raw_linear"], pil_sample["depth_raw_linear"], rtol=1e-6
        )
