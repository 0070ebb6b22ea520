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

Everything is dlopen-gated: the ``load_*`` loaders return ``None`` when
the library is absent and the dependent tests skip.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional

import numpy as np

__all__ = ["load_libwebp", "LibWebP", "load_libpng", "LibPNG"]

_ENC_ABI = 0x020F  # libwebp 1.2.x encoder ABI (verified 1.2.4 in-container)


class _WebPConfig(ctypes.Structure):
    # layout of libwebp 1.2.x <webp/encode.h> WebPConfig
    _fields_ = [
        ("lossless", ctypes.c_int),
        ("quality", ctypes.c_float),
        ("method", ctypes.c_int),
        ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int),
        ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int),
        ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int),
        ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int),
        ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int),
        ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int),
        ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int),
        ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int),
        ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int),
        ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int),
        ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int),
        ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int),
        ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int),
    ]


class _WebPPicture(ctypes.Structure):
    # layout of libwebp 1.2.x <webp/encode.h> WebPPicture
    _fields_ = [
        ("use_argb", ctypes.c_int),
        ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("y", ctypes.c_void_p),
        ("u", ctypes.c_void_p),
        ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int),
        ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p),
        ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p),
        ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", ctypes.c_void_p),
        ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int),
        ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p),
        ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p),
        ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p),
        ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        # private (still part of the ABI struct size):
        ("memory_", ctypes.c_void_p),
        ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2),
    ]


class _WebPMemoryWriter(ctypes.Structure):
    _fields_ = [
        ("mem", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("max_size", ctypes.c_size_t),
        ("pad", ctypes.c_uint32 * 1),
    ]


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

    def encode_rgba_advanced(self, px: np.ndarray, **cfg) -> bytes:
        """Encode via the advanced WebPConfig/WebPPicture API so tests can
        pin individual encoder features (``filter_strength=0`` to disable
        the loop filter, ``partitions=2`` for multi-partition streams,
        ``segments=1`` to turn off segmentation, ...).  Keyword names are
        WebPConfig field names ('pass' may be spelled 'pass_')."""
        lib = self._lib
        lib.WebPConfigInitInternal.restype = ctypes.c_int
        lib.WebPConfigInitInternal.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ]
        lib.WebPPictureInitInternal.restype = ctypes.c_int
        lib.WebPPictureInitInternal.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.WebPPictureImportRGBA.restype = ctypes.c_int
        lib.WebPPictureImportRGBA.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.WebPEncode.restype = ctypes.c_int
        lib.WebPEncode.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.WebPPictureFree.restype = None
        lib.WebPPictureFree.argtypes = [ctypes.c_void_p]
        lib.WebPMemoryWriterInit.restype = None
        lib.WebPMemoryWriterInit.argtypes = [ctypes.c_void_p]
        lib.WebPMemoryWriterClear.restype = None
        lib.WebPMemoryWriterClear.argtypes = [ctypes.c_void_p]

        config = _WebPConfig()
        if not lib.WebPConfigInitInternal(
            ctypes.byref(config), 0, ctypes.c_float(75.0), _ENC_ABI
        ):
            raise RuntimeError("WebPConfigInit failed (ABI mismatch?)")
        for k, v in cfg.items():
            field = "pass_" if k == "pass" else k
            setattr(config, field, type(getattr(config, field))(v))
        lib.WebPValidateConfig.restype = ctypes.c_int
        lib.WebPValidateConfig.argtypes = [ctypes.c_void_p]
        if not lib.WebPValidateConfig(ctypes.byref(config)):
            raise RuntimeError(f"invalid WebPConfig: {cfg}")

        pic = _WebPPicture()
        if not lib.WebPPictureInitInternal(ctypes.byref(pic), _ENC_ABI):
            raise RuntimeError("WebPPictureInit failed")
        h, w, ch = px.shape
        assert ch == 4
        pic.width = w
        pic.height = h
        pic.use_argb = 0 if not cfg.get("lossless") else 1
        buf = np.ascontiguousarray(px, dtype=np.uint8)
        if not lib.WebPPictureImportRGBA(
            ctypes.byref(pic),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w * 4,
        ):
            raise RuntimeError("WebPPictureImportRGBA failed")

        wr = _WebPMemoryWriter()
        lib.WebPMemoryWriterInit(ctypes.byref(wr))
        pic.writer = ctypes.cast(
            lib.WebPMemoryWrite, ctypes.c_void_p
        )
        pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
        ok = lib.WebPEncode(ctypes.byref(config), ctypes.byref(pic))
        lib.WebPPictureFree(ctypes.byref(pic))
        if not ok:
            lib.WebPMemoryWriterClear(ctypes.byref(wr))
            raise RuntimeError(f"WebPEncode failed: error {pic.error_code}")
        data = ctypes.string_at(wr.mem, wr.size)
        lib.WebPMemoryWriterClear(ctypes.byref(wr))
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


class _PngImage(ctypes.Structure):
    # libpng 1.6 <png.h> png_image (simplified API control struct)
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


_PNG_IMAGE_VERSION = 1
_PNG_FORMAT_RGBA = 0x03  # COLOR | ALPHA


class LibPNG:
    """ctypes wrapper over libpng 1.6's simplified (png_image) API —
    struct-light, no setjmp exposure, RGBA-only."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.png_image_begin_read_from_memory.restype = ctypes.c_int
        lib.png_image_begin_read_from_memory.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ]
        lib.png_image_finish_read.restype = ctypes.c_int
        lib.png_image_finish_read.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.png_image_write_to_memory.restype = ctypes.c_int
        lib.png_image_write_to_memory.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.png_image_free.restype = None
        lib.png_image_free.argtypes = [ctypes.c_void_p]

    def decode_rgba(self, data: bytes) -> Optional[np.ndarray]:
        img = _PngImage()
        img.version = _PNG_IMAGE_VERSION
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        if not self._lib.png_image_begin_read_from_memory(
            ctypes.byref(img), buf, len(data)
        ):
            return None
        img.format = _PNG_FORMAT_RGBA
        out = np.empty((img.height, img.width, 4), np.uint8)
        ok = self._lib.png_image_finish_read(
            ctypes.byref(img), None,
            out.ctypes.data_as(ctypes.c_void_p), 0, None,
        )
        if not ok:
            self._lib.png_image_free(ctypes.byref(img))
            return None
        return out

    def encode_rgba(self, px: np.ndarray) -> bytes:
        h, w, ch = px.shape
        assert ch == 4
        img = _PngImage()
        img.version = _PNG_IMAGE_VERSION
        img.width = w
        img.height = h
        img.format = _PNG_FORMAT_RGBA
        buf = np.ascontiguousarray(px, dtype=np.uint8)
        size = ctypes.c_size_t(0)
        # first call with NULL memory computes the required size
        self._lib.png_image_write_to_memory(
            ctypes.byref(img), None, ctypes.byref(size), 0,
            buf.ctypes.data_as(ctypes.c_void_p), 0, None,
        )
        if size.value == 0:
            raise RuntimeError(f"libpng write sizing failed: {img.message!r}")
        mem = ctypes.create_string_buffer(size.value)
        if not self._lib.png_image_write_to_memory(
            ctypes.byref(img), mem, ctypes.byref(size), 0,
            buf.ctypes.data_as(ctypes.c_void_p), 0, None,
        ):
            raise RuntimeError(f"libpng write failed: {img.message!r}")
        return mem.raw[: size.value]


def load_libpng() -> Optional[LibPNG]:
    for name in ("libpng16.so.16", "libpng16.so", "libpng.so", "libpng16.dylib"):
        try:
            return LibPNG(ctypes.CDLL(name))
        except OSError:
            continue
    path = ctypes.util.find_library("png16") or ctypes.util.find_library("png")
    if path:
        try:
            return LibPNG(ctypes.CDLL(path))
        except OSError:
            pass
    return None


# -- giflib (5.x ABI) -------------------------------------------------

class _GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_uint8), ("Green", ctypes.c_uint8),
                ("Blue", ctypes.c_uint8)]


class _ColorMapObject(ctypes.Structure):
    _fields_ = [
        ("ColorCount", ctypes.c_int),
        ("BitsPerPixel", ctypes.c_int),
        ("SortFlag", ctypes.c_int),
        ("Colors", ctypes.POINTER(_GifColorType)),
    ]


class _GifImageDesc(ctypes.Structure):
    _fields_ = [
        ("Left", ctypes.c_int), ("Top", ctypes.c_int),
        ("Width", ctypes.c_int), ("Height", ctypes.c_int),
        ("Interlace", ctypes.c_int),
        ("ColorMap", ctypes.POINTER(_ColorMapObject)),
    ]


class _SavedImage(ctypes.Structure):
    _fields_ = [
        ("ImageDesc", _GifImageDesc),
        ("RasterBits", ctypes.POINTER(ctypes.c_uint8)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
    ]


class _GifFileType(ctypes.Structure):
    _fields_ = [
        ("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
        ("SColorResolution", ctypes.c_int),
        ("SBackGroundColor", ctypes.c_int),
        ("AspectByte", ctypes.c_uint8),
        ("SColorMap", ctypes.POINTER(_ColorMapObject)),
        ("ImageCount", ctypes.c_int),
        ("Image", _GifImageDesc),
        ("SavedImages", ctypes.POINTER(_SavedImage)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
        ("Error", ctypes.c_int),
        ("UserData", ctypes.c_void_p),
        ("Private", ctypes.c_void_p),
    ]


_GIF_READ_FUNC = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.POINTER(_GifFileType),
    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
)


class LibGIF:
    """ctypes wrapper over giflib 5.x: DGifOpen + DGifSlurp, returning
    per-frame palette-indexed rasters + their palettes (undisposed,
    uncomposited — the raw decoder output)."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.DGifOpen.restype = ctypes.POINTER(_GifFileType)
        lib.DGifOpen.argtypes = [ctypes.c_void_p, _GIF_READ_FUNC,
                                 ctypes.POINTER(ctypes.c_int)]
        lib.DGifSlurp.restype = ctypes.c_int
        lib.DGifSlurp.argtypes = [ctypes.POINTER(_GifFileType)]
        lib.DGifCloseFile.restype = ctypes.c_int
        lib.DGifCloseFile.argtypes = [ctypes.POINTER(_GifFileType),
                                      ctypes.POINTER(ctypes.c_int)]

    def decode_frames_indexed(self, data: bytes):
        """GIF bytes → (screen_w, screen_h, [(left, top, raster(h,w) uint8,
        palette(n,3) uint8)]) or None on decoder error."""
        state = {"pos": 0}

        def read_cb(_gif, buf, count):
            p = state["pos"]
            chunk = data[p : p + count]
            ctypes.memmove(buf, chunk, len(chunk))
            state["pos"] = p + len(chunk)
            return len(chunk)

        cb = _GIF_READ_FUNC(read_cb)
        err = ctypes.c_int(0)
        gif = self._lib.DGifOpen(None, cb, ctypes.byref(err))
        if not gif:
            return None
        try:
            if self._lib.DGifSlurp(gif) != 1:
                return None
            g = gif.contents
            frames = []
            for i in range(g.ImageCount):
                si = g.SavedImages[i]
                d = si.ImageDesc
                n = d.Width * d.Height
                raster = np.frombuffer(
                    ctypes.string_at(si.RasterBits, n), dtype=np.uint8
                ).reshape(d.Height, d.Width).copy()
                cm = d.ColorMap if d.ColorMap else g.SColorMap
                if not cm:
                    return None
                cc = cm.contents.ColorCount
                pal = np.frombuffer(
                    ctypes.string_at(cm.contents.Colors, cc * 3), dtype=np.uint8
                ).reshape(cc, 3).copy()
                frames.append((d.Left, d.Top, raster, pal))
            return g.SWidth, g.SHeight, frames
        finally:
            e = ctypes.c_int(0)
            self._lib.DGifCloseFile(gif, ctypes.byref(e))


def load_libgif() -> Optional[LibGIF]:
    for name in ("libgif.so.7", "libgif.so", "libgif.dylib"):
        try:
            return LibGIF(ctypes.CDLL(name))
        except OSError:
            continue
    path = ctypes.util.find_library("gif")
    if path:
        try:
            return LibGIF(ctypes.CDLL(path))
        except OSError:
            pass
    return None


class LibAvif:
    """ctypes shim over the system libavif ENCODER — used only to
    produce real AVIF files that pin the pure-Python HEIF meta walk
    (operators/heif.py); never loaded on a production path."""

    def __init__(self, lib):
        self._lib = lib
        lib.avifImageCreate.restype = ctypes.c_void_p
        lib.avifImageCreate.argtypes = [ctypes.c_uint32] * 3 + [ctypes.c_int]
        lib.avifImageAllocatePlanes.restype = ctypes.c_int
        lib.avifImageAllocatePlanes.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.avifImageDestroy.argtypes = [ctypes.c_void_p]
        lib.avifEncoderCreate.restype = ctypes.c_void_p
        lib.avifEncoderDestroy.argtypes = [ctypes.c_void_p]
        lib.avifEncoderWrite.restype = ctypes.c_int
        lib.avifEncoderWrite.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(self._RWData)
        ]
        lib.avifRWDataFree.argtypes = [ctypes.POINTER(self._RWData)]

    class _RWData(ctypes.Structure):
        _fields_ = [("data", ctypes.POINTER(ctypes.c_uint8)),
                    ("size", ctypes.c_size_t)]

    def encode(self, width: int, height: int, fmt: int = 3):
        """Encode a (zero-plane) image of the given size → AVIF bytes,
        or None on any encoder failure.  ``fmt`` is the avifPixelFormat
        enum: 1 = YUV444 (AV1 seq_profile 1), 3 = YUV420 (profile 0,
        the web default)."""
        lib = self._lib
        img = lib.avifImageCreate(width, height, 8, fmt)
        if not img:
            return None
        try:
            if lib.avifImageAllocatePlanes(img, 1):  # AVIF_PLANES_YUV
                return None
            enc = lib.avifEncoderCreate()
            if not enc:
                return None
            try:
                out = self._RWData()
                if lib.avifEncoderWrite(enc, img, ctypes.byref(out)):
                    return None
                try:
                    return ctypes.string_at(out.data, out.size)
                finally:
                    lib.avifRWDataFree(ctypes.byref(out))
            finally:
                lib.avifEncoderDestroy(enc)
        finally:
            lib.avifImageDestroy(img)


def load_libavif() -> Optional[LibAvif]:
    for name in ("libavif.so.15", "libavif.so.16", "libavif.so",
                 "libavif.dylib"):
        try:
            return LibAvif(ctypes.CDLL(name))
        except OSError:
            continue
    path = ctypes.util.find_library("avif")
    if path:
        try:
            return LibAvif(ctypes.CDLL(path))
        except OSError:
            pass
    return None
