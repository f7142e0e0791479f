"""ctypes bridge to the SYSTEM libwebp — the differential-test
reference for the engine's from-scratch VP8 (lossy) decoder.

This is test infrastructure only: the engine itself never imports it.
It gives the tests a second, independent implementation of the same
public spec (RFC 6386) so the from-scratch decoder can be pinned
bit-exactly against real encoder output.  Import is gated: when the
shared library is absent the tests that need it skip.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB = None


def load():
    """Load libwebp, or return None when unavailable."""
    global _LIB
    if _LIB is not None:
        return _LIB
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPEncodeRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib
    return None


def encode_rgb(arr: np.ndarray, quality: float = 75.0) -> bytes:
    """Encode (H, W, 3) uint8 RGB as lossy WebP via libwebp."""
    lib = load()
    assert lib is not None
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(
        a.tobytes(), w, h, w * 3, ctypes.c_float(quality),
        ctypes.byref(out),
    )
    assert n > 0, "libwebp encode failed"
    blob = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return blob


def encode_rgba(arr: np.ndarray, quality: float = 75.0) -> bytes:
    """Encode (H, W, 4) uint8 RGBA as lossy WebP + ALPH plane."""
    lib = load()
    assert lib is not None
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(
        a.tobytes(), w, h, w * 4, ctypes.c_float(quality),
        ctypes.byref(out),
    )
    assert n > 0, "libwebp RGBA encode failed"
    blob = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return blob


def decode_rgba(blob: bytes) -> np.ndarray:
    """Decode via libwebp to (H, W, 4) RGBA (its own fancy YUV→RGB —
    compare ALPHA bytes against this, not the color channels)."""
    lib = load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w),
                           ctypes.byref(h))
    assert p, "libwebp RGBA decode failed"
    a = np.ctypeslib.as_array(p, (h.value, w.value * 4)).reshape(
        h.value, w.value, 4).copy()
    lib.WebPFree(p)
    return a


def decode_yuv(blob: bytes):
    """Decode via libwebp to raw (Y, U, V) uint8 planes (4:2:0)."""
    lib = load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = lib.WebPDecodeYUV(
        blob, len(blob), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    assert yp, "libwebp YUV decode failed"
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y = np.ctypeslib.as_array(yp, (H, stride.value))[:, :W].copy()
    u = np.ctypeslib.as_array(up, (ch, uv_stride.value))[:, :cw].copy()
    v = np.ctypeslib.as_array(vp, (ch, uv_stride.value))[:, :cw].copy()
    lib.WebPFree(yp)
    return y, u, v
