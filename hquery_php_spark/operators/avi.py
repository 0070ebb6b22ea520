"""Pure-numpy AVI demuxer (RIFF 'AVI ', uncompressed DIB frames).

The second REAL video container behind ``video_frame_sample_df``
(animated GIF is the first): a genuine RIFF walk — hdrl/avih for
dimensions and frame count, strl/strf for the bitmap depth, movi for
the frame chunks — decoding '00db' uncompressed DIB video frames
(bottom-up, BGR(A), 4-byte-aligned rows) to top-down RGB(A) arrays.
Compressed fourccs ('00dc' with a non-DIB handler, MJPG, etc.) stay
honestly out of scope: the demux walk still works, the frame decode
yields nothing, and callers fall back to the byte-window stub.

Exactness: DIB storage is lossless integer pixels, so sampled-frame
statistics admit closed-form SQL twins, same argument as PNG/GIF/VP8L.

Reference parity note: the reference engine (duzun/hQuery.php) has no
media codec; this is beyond-reference multimodal surface under its
fault-tolerance doctrine (decode what you can, NULL what you cannot).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

__all__ = ["encode_avi", "decode_avi_frames", "avi_dims"]


def _chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_offset, size) for RIFF chunks in [start, end)."""
    pos = start
    n = min(end, len(payload))
    while pos + 8 <= n:
        cc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        yield cc, body, min(size, n - body)
        pos = body + size + (size & 1)


def avi_dims(payload: Optional[bytes]) -> Optional[tuple]:
    """(width, height, n_frames, usec_per_frame) from avih, or None."""
    hdr = _parse_headers(payload)
    if hdr is None:
        return None
    w, h, nf, uspf, _bits = hdr
    return (w, h, nf, uspf)


def _parse_headers(payload: Optional[bytes]):
    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        return None
    w = h = nf = uspf = None
    bits = 24
    for cc, off, size in _chunks(payload, 12, len(payload)):
        if cc != b"LIST" or payload[off : off + 4] != b"hdrl":
            continue
        for c2, o2, s2 in _chunks(payload, off + 4, off + size):
            if c2 == b"avih" and s2 >= 40:
                uspf, = struct.unpack_from("<I", payload, o2)
                nf, = struct.unpack_from("<I", payload, o2 + 16)
                w, h = struct.unpack_from("<II", payload, o2 + 32)
            elif c2 == b"LIST" and payload[o2 : o2 + 4] == b"strl":
                for c3, o3, s3 in _chunks(payload, o2 + 4, o2 + s2):
                    if c3 == b"strf" and s3 >= 16:
                        # BITMAPINFOHEADER: biBitCount at offset 14
                        bits, = struct.unpack_from("<H", payload, o3 + 14)
        break
    if w is None or not w or not h:
        return None
    return int(w), int(h), int(nf or 0), int(uspf or 0), int(bits)


def decode_avi_frames(payload: Optional[bytes], max_frames: Optional[int] = None):
    """Demux + decode '00db' uncompressed DIB frames.  Returns a list
    of (frame_no, pixels) with pixels a top-down (h, w, 3|4) uint8 RGB
    array, or None when the container is not an AVI / has no decodable
    frames.  Bottom-up BGR(A) rows and 4-byte row alignment are undone
    here — the parts a naive reader gets wrong."""
    try:
        return _decode_impl(payload, max_frames)
    except (ValueError, IndexError, struct.error):
        return None


def _decode_impl(payload, max_frames):
    hdr = _parse_headers(payload)
    if hdr is None:
        return None
    w, h, _nf, _uspf, bits = hdr
    if bits not in (24, 32):
        return None
    bpp = bits // 8
    stride = (w * bpp + 3) & ~3
    need = stride * h
    frames = []
    for cc, off, size in _chunks(payload, 12, len(payload)):
        if cc != b"LIST" or payload[off : off + 4] != b"movi":
            continue
        for c2, o2, s2 in _chunks(payload, off + 4, off + size):
            if c2[2:4] != b"db" or s2 < need:
                continue  # compressed ('dc'), audio ('wb'), or truncated
            raw = np.frombuffer(payload, np.uint8, count=need, offset=o2)
            rows = raw.reshape(h, stride)[:, : w * bpp].reshape(h, w, bpp)
            rows = rows[::-1]  # DIB is bottom-up
            rgb = rows[:, :, [2, 1, 0]] if bpp == 3 else rows[:, :, [2, 1, 0, 3]]
            frames.append((len(frames), np.ascontiguousarray(rgb)))
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        break
    return frames or None


def encode_avi(frames, fps: int = 25) -> bytes:
    """Minimal-but-valid AVI writer: (h, w, 3|4) uint8 RGB(A) frames →
    RIFF/AVI with one 'vids'/DIB stream and '00db' chunks.  Exists so
    tests and synthetic corpora exercise every demux path (alignment,
    bottom-up order, BGR swap, 32-bit alpha)."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w, ch = frames[0].shape
    if ch not in (3, 4):
        raise ValueError("frames must be (h, w, 3|4)")
    bpp = ch
    stride = (w * bpp + 3) & ~3
    uspf = 1_000_000 // fps

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I", uspf, stride * h * fps, 0, 0x10, len(frames), 0, 1,
        stride * h, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<I", 0)
        + struct.pack("<HHIIIII", 0, 0, 0, 1, fps, 0, len(frames))
        + struct.pack("<IiI", stride * h, -1, 0) + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp * 8, 0, stride * h,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    for fr in frames:
        if fr.shape != (h, w, ch):
            raise ValueError("all frames must share one shape")
        bgr = fr[:, :, [2, 1, 0]] if ch == 3 else fr[:, :, [2, 1, 0, 3]]
        padded = np.zeros((h, stride), np.uint8)
        padded[:, : w * bpp] = bgr[::-1].reshape(h, w * bpp)
        movi_body += chunk(b"00db", padded.tobytes())
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(body)) + body
