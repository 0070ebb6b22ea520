"""Pure-Python lossless-WebP (VP8L) codec.

Decodes the VP8L lossless format per the public "WebP Lossless
Bitstream Specification": LSB-first bit reading, canonical
(deflate-convention) huffman codes incl. the code-length code with
16/17/18 repeat symbols and the max-symbol shortcut, meta-huffman
entropy images, LZ77 backward references with the 2-D distance map,
the color cache, and all four transforms (predictor [14 modes], color,
subtract-green, color-indexing with pixel bundling).  Lossy WebP (VP8
chunk) decodes through the RFC 6386 key-frame decoder in vp8.py —
including VP8X-wrapped images with an ALPH alpha chunk (raw or
VP8L-compressed, all four unfilter modes).  Animations decode through
``decode_webp_frames`` (ANIM/ANMF canvas composition with both
blending methods and dispose-to-background); the single-image
``decode_webp`` returns ``None`` for them, mirroring gif.decode_gif
vs gif.decode_gif_frames.

``encode_webp_lossless`` writes a real, conformant VP8L stream —
frequency-built canonical huffman literals, optional subtract-green /
left-predictor / palette(+bundling) transforms, optional color cache
and LZ77 — enough to exercise every decoder path in tests.  Lossless
round-trips must be EXACT, which is the test invariant.

Reference parity note: the reference engine (duzun/hQuery.php) has no
image codec — beyond-reference multimodal surface, same fault-tolerance
doctrine as its charset path (HTML_Index.php:768-803).
"""

from __future__ import annotations

import struct as _struct
from typing import Optional

import numpy as np

__all__ = [
    "encode_webp_lossless",
    "decode_webp",
    "decode_webp_frames",
    "encode_webp_anim",
    "webp_dims",
]


# ------------------------------------------------------------------ #
# Bit I/O (VP8L: LSB-first within bytes)


class _Bits:
    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("eof")
            self.acc |= self.data[self.pos] << self.n
            self.n += 8
            self.pos += 1
        v = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.n -= nbits
        return v


class _BitW:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0


# ------------------------------------------------------------------ #
# Canonical huffman (deflate convention; code bits read MSB-first,
# i.e. reversed relative to the LSB-first bit stream)


def _canon_codes(lengths) -> dict:
    """{symbol: (code, length)} — deflate-style canonical assignment."""
    maxlen = max(lengths) if lengths else 0
    bl_count = [0] * (maxlen + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (maxlen + 1)
    for ln in range(1, maxlen + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _HTree:
    """Bit-by-bit canonical huffman decoder (MSB-first code walk)."""

    __slots__ = ("table", "maxlen", "single")

    def __init__(self, lengths):
        nz = [(s, l) for s, l in enumerate(lengths) if l]
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = None
            self.maxlen = 0
            return
        self.single = None
        codes = _canon_codes(lengths)
        # over-subscribed / incomplete codes are invalid
        kraft = sum(1 / (1 << l) for _s, l in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("invalid huffman code")
        self.table = {}
        self.maxlen = max(l for _s, l in nz)
        for sym, (code, ln) in codes.items():
            self.table[(ln, code)] = sym

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.maxlen + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_code_lengths(br: _Bits, num_symbols: int) -> list:
    """The VP8L complex-code path: code-length code → symbol lengths."""
    simple = br.read(1)
    if simple:
        n = br.read(1) + 1
        first_8 = br.read(1)
        lengths = [0] * num_symbols
        s0 = br.read(8 if first_8 else 1)
        if s0 >= num_symbols:
            raise ValueError("symbol out of range")
        lengths[s0] = 1
        if n == 2:
            s1 = br.read(8)
            if s1 >= num_symbols:
                raise ValueError("symbol out of range")
            lengths[s1] = 1
        return lengths
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CLC_ORDER[i]] = br.read(3)
    cl_tree = _HTree(cl_lengths) if sum(cl_lengths) else None
    if cl_tree is None:
        raise ValueError("empty code-length code")
    if br.read(1):  # use max_symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = num_symbols
    lengths = [0] * num_symbols
    prev = 8
    i = 0
    while i < num_symbols:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        sym = cl_tree.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < num_symbols:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return lengths


# ------------------------------------------------------------------ #
# LZ77 prefix coding + the 2-D distance map

def _prefix_decode(br: _Bits, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int):
    """value ≥ 1 → (code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra = hi - 1
    code = 2 * hi + ((v >> extra) & 1)
    return code, v & ((1 << extra) - 1), extra


_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * xsize + dx
    return max(d, 1)


# ------------------------------------------------------------------ #
# Transforms (decode side = the spec's inverse transforms)


def _sub3(v: int) -> int:
    # 3.5 signed fixed-point color-transform delta from a uint8
    return v - 256 if v >= 128 else v


def _cdelta(t: int, c: int) -> int:
    # (signed t * signed c) >> 5 with C-style arithmetic on int8 values
    return (_sub3(t) * _sub3(c)) >> 5


def _avg2(a: int, b: int) -> int:
    return (a + b) // 2


def _clamp_add_sub_full(a, b, c):
    return min(255, max(0, a + b - c))


def _clamp_add_sub_half(a, b):
    return min(255, max(0, a + (a - b) // 2))


def _predict(mode, px, x, y, w):
    """The 14 VP8L spatial predictors over ARGB tuples.  px is the
    (h, w, 4) output array already filled above/left of (x, y)."""
    L = px[y, x - 1] if x > 0 else None
    T = px[y - 1, x] if y > 0 else None
    TL = px[y - 1, x - 1] if x > 0 and y > 0 else None
    TR = px[y - 1, x + 1] if y > 0 and x + 1 < w else (px[y - 1, 0] if y > 0 else None)
    black = np.array([255, 0, 0, 0], np.int64)
    if mode == 0:
        return black
    if mode == 1:
        return L if L is not None else black
    if mode == 2:
        return T if T is not None else black
    if mode == 3:
        return TR if TR is not None else black
    if mode == 4:
        return TL if TL is not None else black
    L = L if L is not None else black
    T = T if T is not None else black
    TL = TL if TL is not None else black
    TR = TR if TR is not None else black
    if mode == 5:
        return np.array([_avg2(_avg2(int(L[i]), int(TR[i])), int(T[i])) for i in range(4)], np.int64)
    if mode == 6:
        return np.array([_avg2(int(L[i]), int(TL[i])) for i in range(4)], np.int64)
    if mode == 7:
        return np.array([_avg2(int(L[i]), int(T[i])) for i in range(4)], np.int64)
    if mode == 8:
        return np.array([_avg2(int(TL[i]), int(T[i])) for i in range(4)], np.int64)
    if mode == 9:
        return np.array([_avg2(int(T[i]), int(TR[i])) for i in range(4)], np.int64)
    if mode == 10:
        return np.array(
            [_avg2(_avg2(int(L[i]), int(TL[i])), _avg2(int(T[i]), int(TR[i]))) for i in range(4)],
            np.int64,
        )
    if mode == 11:  # Select
        pa = sum(abs(int(T[i]) - int(TL[i])) for i in range(4))  # |T-TL| predicts L
        pb = sum(abs(int(L[i]) - int(TL[i])) for i in range(4))
        return L if pa <= pb else T
    if mode == 12:
        return np.array(
            [_clamp_add_sub_full(int(L[i]), int(T[i]), int(TL[i])) for i in range(4)],
            np.int64,
        )
    if mode == 13:
        return np.array(
            [_clamp_add_sub_half(_avg2(int(L[i]), int(T[i])), int(TL[i])) for i in range(4)],
            np.int64,
        )
    raise ValueError(f"bad predictor {mode}")


# ------------------------------------------------------------------ #
# Decoder


def webp_dims(payload: bytes) -> Optional[tuple]:
    """(width, height) from VP8L / VP8 / VP8X headers."""
    if not payload or len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    tag = payload[12:16]
    if tag == b"VP8L" and len(payload) >= 25 and payload[20] == 0x2F:
        bits = int.from_bytes(payload[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return w, h
    if tag == b"VP8X" and len(payload) >= 30:
        w = int.from_bytes(payload[24:27], "little") + 1
        h = int.from_bytes(payload[27:30], "little") + 1
        return w, h
    if tag == b"VP8 " and len(payload) >= 30:
        # lossy: frame tag + start code + 14-bit dims
        if payload[23:26] == b"\x9d\x01\x2a":
            w = int.from_bytes(payload[26:28], "little") & 0x3FFF
            h = int.from_bytes(payload[28:30], "little") & 0x3FFF
            return w, h
    return None


def decode_webp(payload: Optional[bytes]):
    """WebP decode → (w, h, ch, pixels) with ch = 4 (RGBA).

    VP8L losslessly; ``VP8 `` (lossy key frame) via vp8.decode_vp8_yuv
    with the documented BT.601 conversion, merging a VP8X ALPH chunk
    when present.  Animations → None."""
    try:
        return _decode_webp_impl(payload)
    except (ValueError, IndexError, _struct.error, KeyError):
        return None


def _unfilter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    """Invert the ALPH chunk's row filter (WebP container spec §Alpha;
    semantics mirror libwebp filters.c: the first pixel of each row
    predicts from the pixel above it, the first row from 0/left)."""
    if method == 0:
        return plane
    h, w = plane.shape
    out = np.zeros_like(plane)
    for yrow in range(h):
        prev = out[yrow - 1] if yrow > 0 else None
        row = plane[yrow]
        if prev is None:
            pred = 0
            for i in range(w):
                pred = (pred + int(row[i])) & 0xFF
                out[0, i] = pred
        elif method == 1:  # horizontal
            pred = int(prev[0])
            for i in range(w):
                pred = (pred + int(row[i])) & 0xFF
                out[yrow, i] = pred
        elif method == 2:  # vertical
            out[yrow] = (prev.astype(np.int32) + row) & 0xFF
        else:  # gradient
            left = top_left = int(prev[0])
            for i in range(w):
                top = int(prev[i])
                g = left + top - top_left
                g = 0 if g < 0 else 255 if g > 255 else g
                left = (int(row[i]) + g) & 0xFF
                top_left = top
                out[yrow, i] = left
    return out


def _decode_alpha_chunk(alph: bytes, w: int, h: int) -> Optional[np.ndarray]:
    """ALPH chunk → (h, w) uint8 alpha plane, or None if undecodable."""
    if not alph:
        return None
    b0 = alph[0]
    comp = b0 & 3
    filt = (b0 >> 2) & 3
    if comp == 0:  # uncompressed
        raw = alph[1 : 1 + w * h]
        if len(raw) < w * h:
            return None
        plane = np.frombuffer(raw, dtype=np.uint8).reshape(h, w).copy()
    elif comp == 1:  # VP8L image stream (no signature/size header)
        br = _Bits(alph[1:])
        argb = _decode_image_stream(br, w, h, top_level=True).reshape(h, w, 4)
        plane = argb[:, :, 1].astype(np.uint8)  # alpha rides in GREEN
    else:
        return None
    return _unfilter_alpha(plane, filt)


def _decode_webp_impl(payload):
    if (
        not payload
        or len(payload) < 21
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        return None
    # walk RIFF chunks (covers bare and VP8X-wrapped images)
    pos = 12
    data = None
    lossy = None
    alph = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = _struct.unpack("<I", payload[pos + 4 : pos + 8])
        if tag == b"VP8L":
            data = payload[pos + 8 : pos + 8 + ln]
            break
        if tag == b"VP8 ":
            lossy = payload[pos + 8 : pos + 8 + ln]
            break
        if tag == b"ALPH":
            alph = payload[pos + 8 : pos + 8 + ln]
        if tag in (b"ANIM", b"ANMF"):
            return None  # animation: out of scope
        pos += 8 + ln + (ln & 1)
    if lossy is not None:
        from .vp8 import decode_vp8_rgba  # local import: keeps module load light

        w, h, ch, rgba = decode_vp8_rgba(lossy)
        if alph is not None:
            a = _decode_alpha_chunk(alph, w, h)
            if a is not None:
                rgba = rgba.copy()
                rgba[:, :, 3] = a
        return w, h, ch, rgba
    if data is None or not data or data[0] != 0x2F:
        return None
    br = _Bits(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        return None  # version must be 0
    argb = _decode_image_stream(br, w, h, top_level=True)
    px = argb.reshape(h, w, 4)
    # ARGB → RGBA
    return w, h, 4, px[:, :, [1, 2, 3, 0]].astype(np.uint8)


def _decode_image_stream(br, w, h, top_level):
    """One VP8L image stream (top-level has transforms; entropy/
    predictor/color sub-images don't)."""
    transforms = []
    xsize = w
    if top_level:
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("duplicate transform")
            if ttype == 3:  # color indexing
                n_colors = br.read(8) + 1
                pal = _decode_image_stream(br, n_colors, 1, False).reshape(-1, 4)
                # palette is delta-coded left-to-right
                pal = np.cumsum(pal.astype(np.int64), axis=0) % 256
                if n_colors <= 2:
                    pbits = 3
                elif n_colors <= 4:
                    pbits = 2
                elif n_colors <= 16:
                    pbits = 1
                else:
                    pbits = 0
                transforms.append((3, (pal, pbits, xsize)))
                if pbits:
                    xsize = (xsize + (1 << pbits) - 1) >> pbits
            elif ttype in (0, 1):  # predictor / color transform
                size_bits = br.read(3) + 2
                tw = (xsize + (1 << size_bits) - 1) >> size_bits
                th = (h + (1 << size_bits) - 1) >> size_bits
                timg = _decode_image_stream(br, tw, th, False).reshape(th, tw, 4)
                transforms.append((ttype, (size_bits, timg)))
            elif ttype == 2:  # subtract green
                transforms.append((2, None))
    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("bad cache bits")
    # meta-huffman
    meta = None
    meta_bits = 0
    n_groups = 1
    if top_level and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        mimg = _decode_image_stream(br, mw, mh, False).reshape(mh, mw, 4)
        meta = (mimg[:, :, 1].astype(np.int64) << 8) | mimg[:, :, 2]
        n_groups = int(meta.max()) + 1
    # huffman groups: 5 trees each
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        trees = []
        for alpha_size in (green_size, 256, 256, 256, 40):
            trees.append(_HTree(_read_code_lengths(br, alpha_size)))
        groups.append(trees)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n_px = xsize * h
    out = np.zeros((n_px, 4), np.int64)  # ARGB
    i = 0
    while i < n_px:
        if meta is not None:
            x = i % xsize
            y = i // xsize
            g = int(meta[y >> meta_bits, x >> meta_bits])
            trees = groups[g]
        else:
            trees = groups[0]
        code = trees[0].decode(br)
        if code < 256:  # literal
            green = code
            red = trees[1].decode(br)
            blue = trees[2].decode(br)
            alpha = trees[3].decode(br)
            out[i] = (alpha, red, green, blue)
            if cache is not None:
                cache[_cache_key(alpha, red, green, blue, cache_bits)] = (
                    (alpha << 24) | (red << 16) | (green << 8) | blue
                )
            i += 1
        elif code < 256 + 24:  # LZ77 backward reference
            length = _prefix_decode(br, code - 256)
            dcode = trees[4].decode(br)
            dist = _plane_dist(_prefix_decode(br, dcode), xsize)
            if dist > i or i + length > n_px:
                raise ValueError("bad backref")
            for k in range(length):
                out[i + k] = out[i + k - dist]
                if cache is not None:
                    a, r, g2, b = (int(v) for v in out[i + k])
                    cache[_cache_key(a, r, g2, b, cache_bits)] = (
                        (a << 24) | (r << 16) | (g2 << 8) | b
                    )
            i += length
        else:  # color-cache hit
            if cache is None:
                raise ValueError("cache hit without cache")
            v = cache[code - 256 - 24]
            out[i] = ((v >> 24) & 255, (v >> 16) & 255, (v >> 8) & 255, v & 255)
            i += 1
    img = out.reshape(h, xsize, 4)
    # apply inverse transforms in reverse declaration order
    for ttype, tdata in reversed(transforms):
        if ttype == 2:  # add green back
            img[:, :, 1] = (img[:, :, 1] + img[:, :, 2]) % 256  # red += green
            img[:, :, 3] = (img[:, :, 3] + img[:, :, 2]) % 256  # blue += green
        elif ttype == 3:  # color indexing
            pal, pbits, orig_w = tdata
            idx = img[:, :, 2]  # green channel holds indices
            if pbits:
                # unbundle: each packed pixel's green holds (1<<pbits)
                # sub-pixels of (8 >> pbits) bits each, first sub-pixel
                # in the least-significant bits
                sub_bits = 8 >> pbits
                n_sub = 1 << pbits
                cols = []
                for sx in range(n_sub):
                    cols.append((idx >> (sx * sub_bits)) & ((1 << sub_bits) - 1))
                wide = np.stack(cols, axis=2).reshape(h, -1)[:, :orig_w]
                idx = wide
            idx = np.clip(idx, 0, pal.shape[0] - 1)
            img = pal[idx.astype(np.int64)][:, :, [0, 1, 2, 3]]
            img = img.astype(np.int64)
        elif ttype == 0:  # predictor
            size_bits, timg = tdata
            hh, ww = img.shape[0], img.shape[1]
            res = img
            px = np.zeros_like(res)
            for y in range(hh):
                for x in range(ww):
                    if x == 0 and y == 0:
                        pred = np.array([255, 0, 0, 0], np.int64)
                    elif y == 0:
                        pred = px[0, x - 1]  # first row: Left
                    elif x == 0:
                        pred = px[y - 1, 0]  # first column: Top
                    else:
                        mode = int(timg[y >> size_bits, x >> size_bits, 2])
                        pred = _predict(mode, px, x, y, ww)
                    px[y, x] = (res[y, x] + pred) % 256
            img = px
        elif ttype == 1:  # color transform
            size_bits, timg = tdata
            hh, ww = img.shape[0], img.shape[1]
            for y in range(hh):
                ty = y >> size_bits
                for x in range(ww):
                    t = timg[ty, x >> size_bits]
                    g2r, g2b, r2b = int(t[3]), int(t[2]), int(t[1])
                    g = int(img[y, x, 2])
                    r = (int(img[y, x, 1]) + _cdelta(g2r, g)) % 256
                    b = (int(img[y, x, 3]) + _cdelta(g2b, g) + _cdelta(r2b, r)) % 256
                    img[y, x, 1] = r
                    img[y, x, 3] = b
    return img.reshape(-1, 4)


def _cache_key(a, r, g, b, bits):
    v = (a << 24) | (r << 16) | (g << 8) | b
    return ((0x1E35A7BD * v) & 0xFFFFFFFF) >> (32 - bits)


# ------------------------------------------------------------------ #
# Encoder (minimal conformant VP8L)


def _write_code_lengths(bw: _BitW, lengths):
    """Emit the complex-code representation (no simple path, no repeat
    codes — plain literal code-length symbols, all 19 CLC slots)."""
    bw.write(0, 1)  # not simple
    # CLC: we give every used code-length symbol a fixed-length code.
    used = sorted(set(l for l in lengths))
    # build a canonical CLC over symbols 0..15 that can express every
    # length present: assign equal lengths (bits needed for the count)
    syms = sorted(set(lengths))
    nbits = max(1, (len(syms) - 1).bit_length())
    if len(syms) == 1:
        # single-symbol CLC: give it length 1? canonical single-code
        # needs a companion — emit lengths {sym:1, other:1} minus…
        # simplest: add a second dummy symbol
        dummy = 0 if syms[0] != 0 else 1
        clc_lengths = {syms[0]: 1, dummy: 1}
    else:
        clc_lengths = {s: nbits for s in syms}
        # make kraft-complete: pad with dummy symbols of the same length
        total = len(syms)
        cap = 1 << nbits
        dummy_pool = [s for s in range(16) if s not in clc_lengths]
        di = 0
        while total < cap:
            clc_lengths[dummy_pool[di]] = nbits
            di += 1
            total += 1
    full = [0] * 19
    for s, l in clc_lengths.items():
        full[s] = l
    bw.write(15, 4)  # num_code_lengths = 4 + 15 = 19: emit all slots
    for i in range(19):
        bw.write(full[_CLC_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol shortcut
    codes = _canon_codes(full)
    for ln in lengths:
        code, nb = codes[ln]
        bw.write(_revbits(code, nb), nb)


def _revbits(v: int, n: int) -> int:
    out = 0
    for _ in range(n):
        out = (out << 1) | (v & 1)
        v >>= 1
    return out


def _build_lengths(freqs, alpha_size, maxlen=15) -> list:
    """Package-merge-free huffman: plain huffman then clamp (safe for
    our small test alphabets), kraft-fixed by incrementing lengths."""
    import heapq

    nz = [(f, s) for s, f in enumerate(freqs) if f]
    lengths = [0] * alpha_size
    if not nz:
        lengths[0] = 1
        lengths[1 if alpha_size > 1 else 0] = 1
        return lengths
    if len(nz) == 1:
        lengths[nz[0][1]] = 1
        return lengths
    heap = [(f, [s]) for f, s in nz]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, s1 = heapq.heappop(heap)
        f2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, s1 + s2))
    if max(l for l in lengths if l) > maxlen:
        raise ValueError("code too long for test encoder")
    return lengths


def _emit_sym(bw, codes, sym):
    code, ln = codes[sym]
    bw.write(_revbits(code, ln), ln)


def encode_webp_lossless(
    pixels,
    subtract_green: bool = False,
    left_predictor: bool = False,
    palette: bool = False,
    use_cache_bits: int = 0,
    use_lz77: bool = False,
) -> bytes:
    """(h, w, 3|4) uint8 → VP8L bytes.  Transforms/features are opt-in
    so tests can exercise each decoder path; round-trips are exact."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("need (h, w, 3|4)")
    h, w = arr.shape[:2]
    if arr.shape[2] == 3:
        arr = np.dstack([arr, np.full((h, w), 255, np.uint8)])
    # ARGB working copy
    argb = arr[:, :, [3, 0, 1, 2]].astype(np.int64)

    bw = _BitW()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    xsize = w
    if palette:
        flat = argb.reshape(-1, 4)
        colors, inverse = np.unique(flat, axis=0, return_index=False, return_inverse=True)
        if colors.shape[0] > 256:
            raise ValueError("palette too large")
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(colors.shape[0] - 1, 8)
        # palette rows are delta-coded
        deltas = np.diff(np.vstack([[[0, 0, 0, 0]], colors]), axis=0) % 256
        _encode_substream(bw, deltas.reshape(1, -1, 4))
        n_colors = colors.shape[0]
        pbits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else 1 if n_colors <= 16 else 0
        idx = inverse.reshape(h, w)
        if pbits:
            sub_bits = 8 >> pbits
            n_sub = 1 << pbits
            packed_w = (w + n_sub - 1) // n_sub
            packed = np.zeros((h, packed_w), np.int64)
            for sx in range(n_sub):
                cols = idx[:, sx::n_sub]
                packed[:, : cols.shape[1]] |= cols << (sx * sub_bits)
            xsize = packed_w
            work = np.zeros((h, xsize, 4), np.int64)
            work[:, :, 0] = 255
            work[:, :, 2] = packed
        else:
            work = np.zeros((h, w, 4), np.int64)
            work[:, :, 0] = 255
            work[:, :, 2] = idx
        argb = work
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        argb = argb.copy()
        argb[:, :, 1] = (argb[:, :, 1] - argb[:, :, 2]) % 256
        argb[:, :, 3] = (argb[:, :, 3] - argb[:, :, 2]) % 256
    if left_predictor:
        bw.write(1, 1)
        bw.write(0, 2)  # predictor transform
        size_bits = 4
        bw.write(size_bits - 2, 3)
        tw = (xsize + (1 << size_bits) - 1) >> size_bits
        th = (h + (1 << size_bits) - 1) >> size_bits
        # predictor image: all tiles mode 1 (Left) in green channel
        timg = np.zeros((1, tw * th, 4), np.int64)
        timg[:, :, 0] = 255
        timg[:, :, 2] = 1
        _encode_substream(bw, timg)
        # residuals per spec edge rules: (0,0) vs BLACK, row0 vs Left,
        # col0 vs Top, else tile predictor (Left everywhere)
        out = argb
        res = np.zeros_like(out)
        for y in range(h):
            for x in range(xsize):
                if x == 0 and y == 0:
                    pred = np.array([255, 0, 0, 0], np.int64)
                elif y == 0:
                    pred = out[0, x - 1]
                elif x == 0:
                    pred = out[y - 1, 0]
                else:
                    pred = out[y, x - 1]  # mode 1 = Left
                res[y, x] = (out[y, x] - pred) % 256
        argb = res
    bw.write(0, 1)  # no more transforms
    _encode_substream(
        bw, argb.reshape(1, -1, 4), cache_bits=use_cache_bits, lz77=use_lz77,
        top_level=True,
    )
    bw.flush()
    payload = bytes(bw.out)
    vp8l = b"VP8L" + _struct.pack("<I", len(payload) + 1) + b"\x2f" + payload
    if len(vp8l) & 1:
        vp8l += b"\x00"
    riff = b"RIFF" + _struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l
    return riff


def _encode_substream(bw, argb_rows, cache_bits=0, lz77=False, top_level=False):
    """Entropy-code a pixel stream (shape (1, n, 4) or (h, w, 4) ARGB):
    optional color cache + optional trivial LZ77 (repeat-run of the
    previous pixel, distance 1 = plane code 2).  Only the top-level
    stream carries the meta-huffman bit (sub-images never read one)."""
    px = argb_rows.reshape(-1, 4)
    n = px.shape[0]
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if top_level:
        bw.write(0, 1)  # no meta-huffman
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)

    # plan the token stream first (so huffman tables match emission)
    cache = [None] * (1 << cache_bits) if cache_bits else None
    tokens = []  # ('lit', a,r,g,b) | ('cache', idx) | ('copy', len)
    i = 0
    while i < n:
        a, r, g, b = (int(v) for v in px[i])
        if lz77 and i > 0:
            run = 0
            while i + run < n and np.array_equal(px[i + run], px[i - 1]) and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("copy", run))
                if cache is not None:
                    for k in range(run):
                        aa, rr, gg, bb = (int(v) for v in px[i + k])
                        cache[_cache_key(aa, rr, gg, bb, cache_bits)] = (
                            (aa << 24) | (rr << 16) | (gg << 8) | bb
                        )
                i += run
                continue
        v32 = (a << 24) | (r << 16) | (g << 8) | b
        if cache is not None:
            key = _cache_key(a, r, g, b, cache_bits)
            if cache[key] == v32:
                tokens.append(("cache", key))
                i += 1
                continue
            cache[key] = v32
        tokens.append(("lit", a, r, g, b))
        i += 1

    gf = [0] * green_size
    rf = [0] * 256
    bf = [0] * 256
    af = [0] * 256
    df = [0] * 40
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1:]
            gf[g] += 1
            rf[r] += 1
            bf[b] += 1
            af[a] += 1
        elif t[0] == "cache":
            gf[256 + 24 + t[1]] += 1
        else:
            code, _ebv, _ebn = _prefix_encode(t[1])
            gf[256 + code] += 1
            # distance 1 (previous pixel) = plane code 2 → prefix code 1
            df[1] += 1
    trees = []
    for freqs, size in ((gf, green_size), (rf, 256), (bf, 256), (af, 256), (df, 40)):
        lengths = _build_lengths(freqs, size)
        _write_code_lengths(bw, lengths)
        codes = _canon_codes(lengths)
        if len(codes) == 1:
            # a single-symbol code consumes ZERO bits at decode time —
            # emission must write none either
            codes = {s: (0, 0) for s in codes}
        trees.append(codes)
    gtree, rtree, btree, atree, dtree = trees
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1:]
            _emit_sym(bw, gtree, g)
            _emit_sym(bw, rtree, r)
            _emit_sym(bw, btree, b)
            _emit_sym(bw, atree, a)
        elif t[0] == "cache":
            _emit_sym(bw, gtree, 256 + 24 + t[1])
        else:
            code, ebv, ebn = _prefix_encode(t[1])
            _emit_sym(bw, gtree, 256 + code)
            if ebn:
                bw.write(ebv, ebn)
            # distance 1 (previous pixel) = plane code 2 → prefix code 1
            _emit_sym(bw, dtree, 1)


# ------------------------------------------------------------------ #
# Animated WebP (VP8X + ANIM/ANMF)
#
# Frame payloads are ordinary VP8L / VP8(+ALPH) still images placed on
# a canvas.  Composition doctrine (documented; matches libwebp's
# WebPAnimDecoder): the canvas starts fully transparent black,
# blending method 0 alpha-composites the frame over the canvas with
# the exact integer over-operator below, method 1 overwrites the
# rect; disposal 1 clears the frame rect back to transparent black
# after the snapshot.  Mirrors gif.decode_gif_frames' contract.
# ------------------------------------------------------------------ #


def _blend_over(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Integer alpha 'over' per the WebP container spec formula:
    A = As + Ad*(255-As)/255; RGB = (RGBs*As + RGBd*Ad*(255-As)/255)/A."""
    sa = src[:, :, 3].astype(np.int64)
    da = dst[:, :, 3].astype(np.int64)
    keep = da * (255 - sa)  # scaled by 255
    oa255 = sa * 255 + keep  # out alpha scaled by 255
    out = np.zeros_like(src)
    rgb = (
        src[:, :, :3].astype(np.int64) * (sa * 255)[..., None]
        + dst[:, :, :3].astype(np.int64) * keep[..., None]
    )
    nz = oa255 > 0
    out_rgb = np.zeros_like(rgb)
    np.divide(rgb + (oa255[..., None] // 2), oa255[..., None],
              out=out_rgb, where=oa255[..., None] > 0, casting="unsafe")
    out[:, :, :3] = np.where(nz[..., None], out_rgb, 0).astype(np.uint8)
    out[:, :, 3] = ((oa255 + 127) // 255).astype(np.uint8)
    return out


def _decode_still_chunks(chunks, w, h):
    """Decode a (ALPH?, VP8|VP8L) chunk set to (h, w, 4) RGBA."""
    alph = chunks.get(b"ALPH")
    if b"VP8L" in chunks:
        data = chunks[b"VP8L"]
        if not data or data[0] != 0x2F:
            raise ValueError("bad VP8L frame")
        br = _Bits(data[1:])
        fw = br.read(14) + 1
        fh = br.read(14) + 1
        br.read(1)
        if br.read(3) != 0:
            raise ValueError("bad VP8L version")
        argb = _decode_image_stream(br, fw, fh, top_level=True).reshape(fh, fw, 4)
        return argb[:, :, [1, 2, 3, 0]].astype(np.uint8)
    if b"VP8 " in chunks:
        from .vp8 import decode_vp8_rgba

        fw, fh, _, rgba = decode_vp8_rgba(chunks[b"VP8 "])
        if alph is not None:
            a = _decode_alpha_chunk(alph, fw, fh)
            if a is not None:
                rgba = rgba.copy()
                rgba[:, :, 3] = a
        return rgba
    raise ValueError("frame without image chunk")


def decode_webp_frames(payload: Optional[bytes], max_frames: Optional[int] = None):
    """REAL animated-WebP decode: every ANMF frame composited onto the
    canvas.  Returns a list of ``(frame_no, duration_ms, pixels)`` with
    ``pixels`` the full canvas RGBA uint8 after the frame is drawn, or
    None for corrupt / non-animated payloads.  A plain still image
    returns a single zero-duration frame (mirrors decode_gif_frames on
    single-frame GIFs)."""
    try:
        return _decode_webp_frames_impl(payload, max_frames)
    except (ValueError, IndexError, KeyError, _struct.error):
        return None


def _decode_webp_frames_impl(payload, max_frames):
    if (
        not payload
        or len(payload) < 21
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        return None
    pos = 12
    canvas_wh = None
    frames = []
    saw_anim = False
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = _struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"VP8X" and len(body) >= 10:
            cw = int.from_bytes(body[4:7], "little") + 1
            ch = int.from_bytes(body[7:10], "little") + 1
            canvas_wh = (cw, ch)
        elif tag == b"ANIM":
            saw_anim = True
        elif tag == b"ANMF" and len(body) >= 16:
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            frames.append((fx, fy, fw, fh, dur, flags, body[16:]))
        elif tag in (b"VP8 ", b"VP8L") and not saw_anim:
            r = _decode_webp_impl(payload)
            if r is None:
                return None
            return [(0, 0, r[3])]
        pos += 8 + ln + (ln & 1)
    if not saw_anim or canvas_wh is None or not frames:
        return None
    cw, ch = canvas_wh
    canvas = np.zeros((ch, cw, 4), np.uint8)
    out = []
    for fno, (fx, fy, fw, fh, dur, flags, sub) in enumerate(frames):
        if max_frames is not None and fno >= max_frames:
            break
        # parse the frame's own chunk list
        chunks = {}
        sp = 0
        while sp + 8 <= len(sub):
            stag = sub[sp : sp + 4]
            (sln,) = _struct.unpack("<I", sub[sp + 4 : sp + 8])
            chunks[stag] = sub[sp + 8 : sp + 8 + sln]
            sp += 8 + sln + (sln & 1)
        rgba = _decode_still_chunks(chunks, fw, fh)
        fh2, fw2 = rgba.shape[:2]
        if fy + fh2 > ch or fx + fw2 > cw:
            raise ValueError("frame exceeds canvas")
        region = canvas[fy : fy + fh2, fx : fx + fw2]
        if flags & 2:  # blending method 1: do not blend
            canvas[fy : fy + fh2, fx : fx + fw2] = rgba
        else:
            canvas[fy : fy + fh2, fx : fx + fw2] = _blend_over(region, rgba)
        out.append((fno, dur, canvas.copy()))
        if flags & 1:  # disposal: clear rect to transparent black
            canvas[fy : fy + fh2, fx : fx + fw2] = 0
    return out


def encode_webp_anim(canvas_w: int, canvas_h: int, frames, loop: int = 0) -> bytes:
    """Assemble an animated WebP from lossless frames — the write half
    of the animation round trip.  ``frames`` is a list of
    ``(x, y, rgba_array, duration_ms, blend_method, dispose)`` with
    even x/y; each frame is VP8L-encoded (exact)."""
    body = bytearray()
    flags = 0x02 | 0x10  # animation + alpha
    body += b"VP8X" + _struct.pack("<I", 10)
    body += bytes([flags, 0, 0, 0])
    body += (canvas_w - 1).to_bytes(3, "little") + (canvas_h - 1).to_bytes(3, "little")
    body += b"ANIM" + _struct.pack("<I", 6) + b"\x00\x00\x00\x00" + _struct.pack("<H", loop)
    for (fx, fy, px, dur, blend, dispose) in frames:
        if fx % 2 or fy % 2:
            raise ValueError("frame offsets must be even")
        inner = encode_webp_lossless(px)[12:]  # the VP8L chunk incl. header
        fh, fw = px.shape[:2]
        anmf = bytearray()
        anmf += (fx // 2).to_bytes(3, "little") + (fy // 2).to_bytes(3, "little")
        anmf += (fw - 1).to_bytes(3, "little") + (fh - 1).to_bytes(3, "little")
        anmf += int(dur).to_bytes(3, "little")
        anmf += bytes([(2 if blend else 0) | (1 if dispose else 0)])
        anmf += inner
        body += b"ANMF" + _struct.pack("<I", len(anmf)) + bytes(anmf)
        if len(anmf) & 1:
            body += b"\x00"
    return b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WEBP" + bytes(body)
