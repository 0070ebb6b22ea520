"""Pure-numpy TIFF codec (baseline uncompressed subset).

Rounds out the in-repo image codecs (PNG, JPEG, GIF, VP8L, BMP): a
real IFD walk in BOTH byte orders ('II' little- and 'MM' big-endian),
strip assembly (StripOffsets/StripByteCounts, any RowsPerStrip),
8-bit grayscale / RGB / RGBA via SamplesPerPixel + ExtraSamples, and
PlanarConfiguration 1.  Compressed TIFFs (LZW/PackBits/JPEG-in-TIFF)
are honestly out of scope — decode returns None and callers keep the
NULL-stats doctrine.

TIFF 6.0 spec structure: 8-byte header (order, 42, first-IFD offset),
IFDs of 12-byte tags (id, type, count, value-or-offset).  Storage is
lossless integer pixels, so decoded statistics keep closed-form SQL
twins like PNG/GIF/VP8L.

Reference parity note: the reference engine (duzun/hQuery.php) has no
image codec; beyond-reference surface, same fault-tolerance doctrine.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

__all__ = ["encode_tiff", "decode_tiff", "tiff_dims", "read_ifd0_tags"]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def encode_tiff(pixels, big_endian: bool = False, rows_per_strip: int = 4) -> bytes:
    """(h, w) gray or (h, w, 3|4) uint8 → uncompressed TIFF with real
    strips.  ``big_endian`` writes 'MM' order so the decoder's swap
    path is exercised."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    bo = ">" if big_endian else "<"
    rps = max(1, rows_per_strip)
    strips = [arr[y : y + rps].tobytes() for y in range(0, h, rps)]
    n = len(strips)

    # layout: header(8) | pixel strips | BitsPerSample array (if ch>1) |
    # strip offset/count arrays (if n>2... stored inline when they fit) | IFD
    pos = 8
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    bps_off = pos
    if ch > 1:
        pos += 2 * ch
    off_arr = pos
    if n > 1:
        pos += 4 * n
    cnt_arr = pos
    if n > 1:
        pos += 4 * n
    ifd_off = pos

    def tag(tid, typ, count, value):
        return struct.pack(bo + "HHI", tid, typ, count) + value

    def long_val(v):
        return struct.pack(bo + "I", v)

    def short_val(v):
        return struct.pack(bo + "H", v) + b"\x00\x00"

    photometric = 1 if ch == 1 else 2
    tags = [
        tag(256, 4, 1, long_val(w)),                     # ImageWidth
        tag(257, 4, 1, long_val(h)),                     # ImageLength
        tag(259, 3, 1, short_val(1)),                    # Compression = none
        tag(262, 3, 1, short_val(photometric)),          # Photometric
        tag(277, 3, 1, short_val(ch)),                   # SamplesPerPixel
        tag(278, 4, 1, long_val(rps)),                   # RowsPerStrip
    ]
    if ch == 1:
        tags.insert(2, tag(258, 3, 1, short_val(8)))     # BitsPerSample
    else:
        tags.insert(2, tag(258, 3, ch, long_val(bps_off)))
    if ch == 4:
        tags.append(tag(338, 3, 1, short_val(2)))        # ExtraSamples
    if n == 1:
        tags.append(tag(273, 4, 1, long_val(offsets[0])))
        tags.append(tag(279, 4, 1, long_val(len(strips[0]))))
    else:
        tags.append(tag(273, 4, n, long_val(off_arr)))
        tags.append(tag(279, 4, n, long_val(cnt_arr)))
    tags.sort(key=lambda t: struct.unpack_from(bo + "H", t)[0])

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", ifd_off)
    for s in strips:
        out += s
    if ch > 1:
        out += struct.pack(bo + f"{ch}H", *([8] * ch))
    if n > 1:
        out += struct.pack(bo + f"{n}I", *offsets)
        out += struct.pack(bo + f"{n}I", *(len(s) for s in strips))
    out += struct.pack(bo + "H", len(tags))
    for t in tags:
        out += t
    out += struct.pack(bo + "I", 0)  # no next IFD
    return bytes(out)


def tiff_dims(payload: Optional[bytes]) -> Optional[tuple]:
    dec = decode_tiff(payload)
    return (dec[0], dec[1]) if dec else None


def decode_tiff(payload: Optional[bytes]):
    """TIFF → (w, h, ch, pixels uint8) or None (non-TIFF, compressed,
    non-8-bit, tiled, or planar-separate payloads)."""
    try:
        return _decode_impl(payload)
    except (struct.error, IndexError, ValueError, OverflowError):
        return None


def _read_values(payload, bo, typ, count, raw):
    size = _TYPE_SIZES.get(typ)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        data = payload[off : off + total]
        if len(data) < total:
            return None
    if typ in (3,):
        return list(struct.unpack(bo + f"{count}H", data))
    if typ in (4,):
        return list(struct.unpack(bo + f"{count}I", data))
    if typ in (1, 6, 7):
        return list(data)
    return None  # rationals/sbytes not needed for the baseline subset


def read_ifd0_tags(payload: Optional[bytes]):
    """First-IFD tag map of a TIFF stream: {tag_id: [values]} or None.
    Shared by the TIFF decoder and the JPEG EXIF (APP1) walk — EXIF is
    a TIFF stream embedded in a JPEG segment, same byte-order header,
    same IFD layout."""
    if payload is None or len(payload) < 8:
        return None
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        return None
    (magic,) = struct.unpack_from(bo + "H", payload, 2)
    if magic != 42:
        return None
    (ifd,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd + 2 > len(payload):
        return None
    (n_tags,) = struct.unpack_from(bo + "H", payload, ifd)
    tags = {}
    for i in range(n_tags):
        base = ifd + 2 + 12 * i
        if base + 12 > len(payload):
            return None
        tid, typ, count = struct.unpack_from(bo + "HHI", payload, base)
        vals = _read_values(payload, bo, typ, count, payload[base + 8 : base + 12])
        if vals is not None:
            tags[tid] = vals
    return tags


def _decode_impl(payload):
    tags = read_ifd0_tags(payload)
    if tags is None:
        return None
    w = tags.get(256, [None])[0]
    h = tags.get(257, [None])[0]
    if not w or not h:
        return None
    if tags.get(259, [1])[0] != 1:
        return None  # compressed: out of scope
    if tags.get(284, [1])[0] != 1:
        return None  # planar-separate: out of scope
    if 322 in tags or 323 in tags:
        return None  # tiled: out of scope
    ch = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * ch)
    if ch < 1 or ch > 4 or any(b != 8 for b in bits):
        return None
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        return None
    rps = tags.get(278, [h])[0] or h
    data = bytearray()
    need = w * ch
    for off, cnt in zip(offsets, counts):
        strip = payload[off : off + cnt]
        if len(strip) < cnt:
            return None
        data += strip
    if len(data) < w * h * ch:
        return None
    px = np.frombuffer(bytes(data), np.uint8, count=w * h * ch).reshape(h, w, ch)
    # rps only affects strip boundaries; concatenation already restored
    # row order for PlanarConfiguration 1
    return int(w), int(h), int(ch), px
