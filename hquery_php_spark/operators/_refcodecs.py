"""Optional cross-validation harness against the system reference codecs.

This module is NOT on any production decode path — the engine's codecs
(png/jpeg/gif/webp/tiff/...) are pure Python so they run on any executor
with zero native dependencies.  When the host happens to ship the
reference libraries (libwebp etc.), tests use this ctypes shim to

* generate *real* encoder output as fixtures (e.g. lossy VP8 streams we
  could not otherwise produce in this container), and
* verify our pure-Python decoders are bit-exact against the reference
  implementation — true conformance evidence, stronger than
  encoder/decoder self-consistency.

Everything is dlopen-gated: ``load_libwebp()`` returns ``None`` when the
library is absent and the dependent tests skip.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional

import numpy as np

__all__ = ["load_libwebp", "LibWebP"]


class LibWebP:
    """Thin ctypes wrapper over libwebp's *simple* encode/decode API.

    Only stable, struct-free entry points are used (the simple API takes
    scalars and buffers and mallocs its output), so the binding is not
    sensitive to libwebp's internal ABI structs.
    """

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u8pp = ctypes.POINTER(u8p)
        ip = ctypes.POINTER(ctypes.c_int)

        lib.WebPEncodeRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeRGBA.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float, u8pp,
        ]
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8pp,
        ]
        lib.WebPDecodeRGBA.restype = u8p
        lib.WebPDecodeRGBA.argtypes = [u8p, ctypes.c_size_t, ip, ip]
        lib.WebPDecodeYUV.restype = u8p
        lib.WebPDecodeYUV.argtypes = [
            u8p, ctypes.c_size_t, ip, ip, u8pp, u8pp, ip, ip,
        ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]

    # -- encode ---------------------------------------------------------
    def encode_rgba(self, px: np.ndarray, quality: float) -> bytes:
        """(h, w, 4) uint8 → lossy WebP (one VP8 key frame) bytes."""
        h, w, ch = px.shape
        assert ch == 4
        buf = np.ascontiguousarray(px, dtype=np.uint8)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = self._lib.WebPEncodeRGBA(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h, w * 4, float(quality), ctypes.byref(out),
        )
        if n == 0:
            raise RuntimeError("WebPEncodeRGBA failed")
        data = ctypes.string_at(out, n)
        self._lib.WebPFree(out)
        return data

    def encode_lossless_rgba(self, px: np.ndarray) -> bytes:
        h, w, ch = px.shape
        assert ch == 4
        buf = np.ascontiguousarray(px, dtype=np.uint8)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = self._lib.WebPEncodeLosslessRGBA(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h, w * 4, ctypes.byref(out),
        )
        if n == 0:
            raise RuntimeError("WebPEncodeLosslessRGBA failed")
        data = ctypes.string_at(out, n)
        self._lib.WebPFree(out)
        return data

    # -- decode ---------------------------------------------------------
    def decode_rgba(self, data: bytes) -> Optional[np.ndarray]:
        """WebP bytes → (h, w, 4) uint8, or None on decode failure."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        out = self._lib.WebPDecodeRGBA(buf, len(data), ctypes.byref(w), ctypes.byref(h))
        if not out:
            return None
        n = w.value * h.value * 4
        px = np.frombuffer(ctypes.string_at(out, n), dtype=np.uint8).copy()
        self._lib.WebPFree(out)
        return px.reshape(h.value, w.value, 4)

    def decode_yuv(self, data: bytes):
        """WebP bytes → (Y, U, V) uint8 planes (Y: h×w; U/V: ⌈h/2⌉×⌈w/2⌉).

        This is the raw VP8 reconstruction output (post loop filter),
        BEFORE any YUV→RGB conversion/upsampling — the right surface for
        bit-exact conformance comparison of a VP8 decoder.
        """
        w = ctypes.c_int()
        h = ctypes.c_int()
        up = ctypes.POINTER(ctypes.c_uint8)()
        vp = ctypes.POINTER(ctypes.c_uint8)()
        stride = ctypes.c_int()
        uv_stride = ctypes.c_int()
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        yp = self._lib.WebPDecodeYUV(
            buf, len(data), ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(up), ctypes.byref(vp),
            ctypes.byref(stride), ctypes.byref(uv_stride),
        )
        if not yp:
            return None
        W, H, S, US = w.value, h.value, stride.value, uv_stride.value
        cw, chh = (W + 1) // 2, (H + 1) // 2
        y = np.frombuffer(ctypes.string_at(yp, S * H), dtype=np.uint8).reshape(H, S)[:, :W].copy()
        u = np.frombuffer(ctypes.string_at(up, US * chh), dtype=np.uint8).reshape(chh, US)[:, :cw].copy()
        v = np.frombuffer(ctypes.string_at(vp, US * chh), dtype=np.uint8).reshape(chh, US)[:, :cw].copy()
        self._lib.WebPFree(yp)
        return y, u, v


def load_libwebp() -> Optional[LibWebP]:
    """dlopen the system libwebp; None when absent (tests then skip)."""
    for name in ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib"):
        try:
            return LibWebP(ctypes.CDLL(name))
        except OSError:
            continue
    path = ctypes.util.find_library("webp")
    if path:
        try:
            return LibWebP(ctypes.CDLL(path))
        except OSError:
            pass
    return None
