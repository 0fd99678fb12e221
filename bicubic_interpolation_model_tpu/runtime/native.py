"""ctypes bindings to the native IO runtime (csrc/bimio.cpp → libbimio.so).

The native library carries the roles the reference outsources to libvips
(sharp) and pngjs: PNG↔raw-RGBA codec and the float32 tensor-file format.
Built with ``make -C csrc`` (auto-attempted once per process); every entry
point degrades gracefully (returns None/False) so callers fall back to PIL.
Set BIM_TPU_NO_NATIVE=1 to disable.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_LIB_PATH = pathlib.Path(__file__).parent / "libbimio.so"
_lib = None
_build_attempted = False


def _load():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if os.environ.get("BIM_TPU_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists() and not _build_attempted:
        _build_attempted = True
        csrc = pathlib.Path(__file__).resolve().parents[2] / "csrc"
        try:
            subprocess.run(["make", "-C", str(csrc)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    u32 = ctypes.c_uint32

    lib.bim_decode_png_file.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(u8p),
                                        ctypes.POINTER(u32),
                                        ctypes.POINTER(u32)]
    lib.bim_decode_png_file.restype = ctypes.c_int
    if hasattr(lib, "bim_decode_jpeg_file"):
        lib.bim_decode_jpeg_file.argtypes = lib.bim_decode_png_file.argtypes
        lib.bim_decode_jpeg_file.restype = ctypes.c_int
    if hasattr(lib, "bim_encode_jpeg_file"):
        lib.bim_encode_jpeg_file.argtypes = [ctypes.c_char_p, u8p, u32, u32,
                                             ctypes.c_int, ctypes.c_int]
        lib.bim_encode_jpeg_file.restype = ctypes.c_int
    lib.bim_encode_png_file.argtypes = [ctypes.c_char_p, u8p, u32, u32]
    lib.bim_encode_png_file.restype = ctypes.c_int
    lib.bim_read_tensor.argtypes = [ctypes.c_char_p, ctypes.POINTER(f32p),
                                    ctypes.POINTER(u32), ctypes.POINTER(u32),
                                    ctypes.POINTER(u32)]
    lib.bim_read_tensor.restype = ctypes.c_int
    lib.bim_write_tensor.argtypes = [ctypes.c_char_p, f32p, u32, u32, u32]
    lib.bim_write_tensor.restype = ctypes.c_int
    lib.bim_free.argtypes = [ctypes.c_void_p]
    lib.bim_free.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_png(path) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    rc = lib.bim_decode_png_file(str(path).encode(), ctypes.byref(out),
                                 ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    try:
        n = int(w.value) * int(h.value) * 4
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
        return arr.reshape(int(h.value), int(w.value), 4)
    finally:
        lib.bim_free(out)


def decode_jpeg(path) -> np.ndarray | None:
    """Baseline/extended-sequential Huffman JPEG via the from-scratch C++
    decoder (csrc/bimjpeg.cpp). Returns None for progressive/arithmetic
    files (or an old .so without the symbol) — callers fall back to PIL."""
    lib = _load()
    if lib is None or not hasattr(lib, "bim_decode_jpeg_file"):
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    rc = lib.bim_decode_jpeg_file(str(path).encode(), ctypes.byref(out),
                                  ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    try:
        n = int(w.value) * int(h.value) * 4
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
        return arr.reshape(int(h.value), int(w.value), 4)
    finally:
        lib.bim_free(out)


def encode_png(path, rgba_u8: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(rgba_u8, dtype=np.uint8)
    h, w = arr.shape[:2]
    rc = lib.bim_encode_png_file(
        str(path).encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_uint32(w), ctypes.c_uint32(h))
    return rc == 0


def encode_jpeg(path, rgba_u8: np.ndarray, quality: int = 92,
                gray: bool = False) -> bool:
    """Baseline 4:4:4 JPEG via the from-scratch encoder (csrc/bimjpeg.cpp).
    ``gray`` emits a single-component scan from the R channel."""
    lib = _load()
    if lib is None or not hasattr(lib, "bim_encode_jpeg_file"):
        return False
    arr = np.ascontiguousarray(rgba_u8, dtype=np.uint8)
    h, w = arr.shape[:2]
    rc = lib.bim_encode_jpeg_file(
        str(path).encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_uint32(w), ctypes.c_uint32(h),
        ctypes.c_int(int(quality)), ctypes.c_int(1 if gray else 0))
    return rc == 0


def read_tensor_bin(path) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_float)()
    h = ctypes.c_uint32()
    w = ctypes.c_uint32()
    c = ctypes.c_uint32()
    rc = lib.bim_read_tensor(str(path).encode(), ctypes.byref(data),
                             ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        return None
    try:
        n = int(h.value) * int(w.value) * int(c.value)
        arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
        return arr.reshape(int(h.value), int(w.value), int(c.value))
    finally:
        lib.bim_free(data)


def write_tensor_bin(path, arr: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(arr, dtype=np.float32)
    h, w, c = a.shape
    rc = lib.bim_write_tensor(
        str(path).encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_uint32(h), ctypes.c_uint32(w), ctypes.c_uint32(c))
    return rc == 0
