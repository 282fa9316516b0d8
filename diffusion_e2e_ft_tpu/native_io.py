"""ctypes bindings for the native IO library (native/e2eft_io.cc).

The C++ layer supplies the host-side hot path the reference delegates to PIL/cv2
inside torch DataLoader workers: libpng/libjpeg decode, a fused 16-bit-PNG ->
float32 depth decode, and an indexed POSIX-tar reader for the tar-backed eval
datasets. Falls back transparently (`AVAILABLE = False`) when the .so hasn't been
built (`make -C native`); callers use `decode_image`/`NativeTar` only when
AVAILABLE, via the same numpy-array contracts as the PIL/tarfile path.
"""

from __future__ import annotations

import ctypes
import os


import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "libe2eft_io.so")

_lib = None
AVAILABLE = False


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.png_probe.restype = ctypes.c_int
    lib.png_probe.argtypes = [u8p, ctypes.c_size_t, i32p, i32p, i32p, i32p]
    lib.png_decode.restype = ctypes.c_int
    lib.png_decode.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.c_size_t]
    lib.png16_to_depth_f32.restype = ctypes.c_int
    lib.png16_to_depth_f32.argtypes = [
        u8p, ctypes.c_size_t, ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
    ]
    lib.jpeg_probe.restype = ctypes.c_int
    lib.jpeg_probe.argtypes = [u8p, ctypes.c_size_t, i32p, i32p, i32p]
    lib.jpeg_decode_rgb.restype = ctypes.c_int
    lib.jpeg_decode_rgb.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.c_size_t]
    lib.tar_open.restype = ctypes.c_void_p
    lib.tar_open.argtypes = [ctypes.c_char_p]
    lib.tar_num_entries.restype = ctypes.c_int64
    lib.tar_num_entries.argtypes = [ctypes.c_void_p]
    lib.tar_entry_name.restype = ctypes.c_int64
    lib.tar_entry_name.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    lib.tar_entry_size.restype = ctypes.c_int64
    lib.tar_entry_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.tar_find.restype = ctypes.c_int64
    lib.tar_find.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.tar_read.restype = ctypes.c_int
    lib.tar_read.argtypes = [ctypes.c_void_p, ctypes.c_int64, u8p, ctypes.c_int64]
    lib.tar_close.restype = None
    lib.tar_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    AVAILABLE = True
    return lib


def build(force: bool = False) -> bool:
    """Compile the library with make if missing; returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return _load() is not None
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(_LIB_PATH)], check=True, capture_output=True
        )
    except Exception:
        return False
    return _load() is not None


def _as_u8p(buf: bytes):
    return ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8))


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> numpy array [H, W] or [H, W, C], uint8 or uint16."""
    lib = _load()
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    c = ctypes.c_int32()
    depth = ctypes.c_int32()
    rc = lib.png_probe(_as_u8p(buf), len(buf), h, w, c, depth)
    if rc != 0:
        raise ValueError(f"png_probe failed: {rc}")
    dtype = np.uint16 if depth.value == 16 else np.uint8
    shape = (h.value, w.value) if c.value == 1 else (h.value, w.value, c.value)
    out = np.empty(shape, dtype)
    rc = lib.png_decode(
        _as_u8p(buf), len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.nbytes
    )
    if rc != 0:
        raise ValueError(f"png_decode failed: {rc}")
    return out


def decode_png16_depth(buf: bytes, scale: float) -> np.ndarray:
    """16-bit grayscale PNG -> float32 depth / scale (fused native path)."""
    lib = _load()
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    c = ctypes.c_int32()
    depth = ctypes.c_int32()
    rc = lib.png_probe(_as_u8p(buf), len(buf), h, w, c, depth)
    if rc != 0:
        raise ValueError(f"png_probe failed: {rc}")
    out = np.empty((h.value, w.value), np.float32)
    rc = lib.png16_to_depth_f32(
        _as_u8p(buf), len(buf), ctypes.c_float(scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
    )
    if rc != 0:
        raise ValueError(f"png16_to_depth_f32 failed: {rc}")
    return out


def decode_jpeg(buf: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 RGB [H, W, 3]."""
    lib = _load()
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    c = ctypes.c_int32()
    rc = lib.jpeg_probe(_as_u8p(buf), len(buf), h, w, c)
    if rc != 0:
        raise ValueError(f"jpeg_probe failed: {rc}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.jpeg_decode_rgb(
        _as_u8p(buf), len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.nbytes
    )
    if rc != 0:
        raise ValueError(f"jpeg_decode_rgb failed: {rc}")
    return out


def decode_image(buf: bytes) -> np.ndarray:
    """Sniff PNG vs JPEG and decode."""
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(buf)
    if buf[:2] == b"\xff\xd8":
        return decode_jpeg(buf)
    raise ValueError("unknown image format")


class NativeTar:
    """Indexed random-access reads from a POSIX tar (the eval datasets' layout)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library not built (run `make -C native`)")
        self._lib = lib
        self._handle = lib.tar_open(path.encode())
        if not self._handle:
            raise FileNotFoundError(path)

    def __len__(self) -> int:
        return int(self._lib.tar_num_entries(self._handle))

    def names(self):
        buf = ctypes.create_string_buffer(4096)
        for i in range(len(self)):
            n = self._lib.tar_entry_name(self._handle, i, buf, 4096)
            if n >= 0:
                yield buf.value.decode()

    def read(self, name: str) -> bytes:
        idx = self._lib.tar_find(self._handle, name.encode())
        if idx < 0:
            raise KeyError(name)
        size = self._lib.tar_entry_size(self._handle, idx)
        out = np.empty(size, np.uint8)
        rc = self._lib.tar_read(
            self._handle, idx, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size
        )
        if rc != 0:
            raise IOError(f"tar_read failed: {rc}")
        return out.tobytes()

    def close(self):
        if self._handle:
            self._lib.tar_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


_load()
