"""Pure-Python GIF codec (GIF87a/GIF89a, first frame).

Completes the in-repo image-codec trio (stdlib PNG in ``multimodal.py``,
baseline JPEG in ``jpeg.py``): real LZW decompression with variable
code widths (spec Appendix F), interlace passes, global/local color
tables, and the GIF89a graphic-control transparency flag.  Animations
decode their FIRST frame (the thumbnail/feature-extraction contract);
later frames are skipped, not errors.

``encode_gif`` is a real LZW compressor (dictionary growth, width
bumps, 4096-entry reset) used to synthesize deterministic test
payloads — plus the well-known 43-byte 1×1 transparent GIF serves as
an independent, externally-produced decode fixture in tests.

Reference parity note: the reference engine (duzun/hQuery.php) has no
image codec — this is beyond-reference multimodal surface, same
fault-tolerance doctrine as its charset path (HTML_Index.php:768-803):
decode what you can, NULL what you cannot, never abort.
"""

from __future__ import annotations

import struct as _struct
from typing import Optional

import numpy as np

__all__ = [
    "encode_gif",
    "encode_gif_animation",
    "decode_gif",
    "decode_gif_frames",
    "gif_dims",
]


def gif_dims(payload: bytes) -> Optional[tuple]:
    """(width, height) from the logical screen descriptor."""
    if not payload or len(payload) < 10:
        return None
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = _struct.unpack("<HH", payload[6:10])
    return int(w), int(h)


# ------------------------------------------------------------------ #
# LZW (GIF variant: LSB-first bit packing, CLEAR/END codes)


class _LZWDecoder:
    def __init__(self, min_code_size: int):
        self.mcs = min_code_size
        self.clear = 1 << min_code_size
        self.end = self.clear + 1
        self._reset()

    def _reset(self):
        self.dict = {i: (i,) for i in range(self.clear)}
        self.next_code = self.end + 1
        self.width = self.mcs + 1
        self.prev = None

    def decode(self, data: bytes, max_pixels: int) -> Optional[list]:
        out = []
        acc = 0
        nbits = 0
        pos = 0
        n = len(data)
        while True:
            while nbits < self.width:
                if pos >= n:
                    return out  # stream ended without END code — tolerate
                acc |= data[pos] << nbits
                nbits += 8
                pos += 1
            code = acc & ((1 << self.width) - 1)
            acc >>= self.width
            nbits -= self.width
            if code == self.clear:
                self._reset()
                continue
            if code == self.end:
                return out
            if self.prev is None:
                entry = self.dict.get(code)
                if entry is None:
                    return None
            elif code in self.dict:
                entry = self.dict[code]
            elif code == self.next_code:
                pe = self.dict[self.prev]
                entry = pe + (pe[0],)  # the KwKwK case
            else:
                return None  # corrupt
            out.extend(entry)
            if len(out) >= max_pixels:
                return out  # frame complete — END/padding may follow
            if self.prev is not None and self.next_code < 4096:
                pe = self.dict[self.prev]
                self.dict[self.next_code] = pe + (entry[0],)
                self.next_code += 1
                if self.next_code == (1 << self.width) and self.width < 12:
                    self.width += 1
            self.prev = code


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF LZW compressor: real dictionary growth, width bumps at
    2^width, CLEAR + reset at 4096 entries (matches the decoder's
    non-early-change convention)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    w = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # width grows when the NEXT code to assign needs more bits
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w], width)
        # the decoder adds one dictionary entry after the final data
        # code (it cannot know END follows) and may bump its width —
        # mirror that so END is written at the width it will be read at
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


# ------------------------------------------------------------------ #


def decode_gif(payload: Optional[bytes]):
    """First-frame decode.  Returns (w, h, ch, pixels) — ch = 4 (RGBA)
    when the frame declares a transparent index, else 3 — or None for
    anything corrupt/out of scope."""
    try:
        return _decode_gif_impl(payload)
    except (ValueError, IndexError, KeyError, _struct.error):
        return None


def _decode_gif_impl(payload: Optional[bytes]):
    dims = gif_dims(payload) if payload else None
    if dims is None:
        return None
    sw, sh = dims
    if sw == 0 or sh == 0:
        return None
    packed = payload[10]
    bg = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
        if gct.shape[0] < n:
            return None
        pos += 3 * n
    transparent = None
    n_data = len(payload)
    while pos < n_data:
        b = payload[pos]
        if b == 0x3B:  # trailer
            return None  # no image block seen
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:
                gce_packed = payload[pos + 1]
                if gce_packed & 0x01:
                    transparent = payload[pos + 4]
            # skip sub-blocks
            while pos < n_data and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b == 0x2C:  # image descriptor — FIRST frame only
            left, top, w, h = _struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(
                    payload[pos : pos + 3 * n], np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if ct is None:
                return None
            mcs = payload[pos]
            pos += 1
            if mcs < 2 or mcs > 11:
                return None
            data = bytearray()
            while pos < n_data and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _LZWDecoder(mcs).decode(bytes(data), w * h)
            if idx is None or len(idx) < w * h:
                return None
            frame = np.asarray(idx[: w * h], np.int64).reshape(h, w)
            if ipacked & 0x40:
                frame = _deinterlace(frame)
            if frame.max() >= ct.shape[0]:
                return None
            # composite the frame onto the logical screen (bg-filled)
            if (left, top, w, h) == (0, 0, sw, sh):
                screen = frame
            else:
                if left + w > sw or top + h > sh:
                    return None
                fill = bg if gct is not None and bg < ct.shape[0] else 0
                screen = np.full((sh, sw), fill, np.int64)
                screen[top : top + h, left : left + w] = frame
            rgb = ct[screen]
            if transparent is not None:
                a = np.where(screen == transparent, 0, 255).astype(np.uint8)
                px = np.dstack([rgb, a])
                return sw, sh, 4, px.astype(np.uint8)
            return sw, sh, 3, rgb.astype(np.uint8)
        return None  # unknown block
    return None


def decode_gif_frames(payload: Optional[bytes], max_frames: Optional[int] = None):
    """REAL animation decode: every frame of a GIF87a/89a stream,
    composited per the GIF89a disposal model.  Returns a list of
    ``(frame_no, delay_cs, pixels)`` where ``pixels`` is the full
    logical-screen RGBA uint8 array after the frame is drawn, or None
    for corrupt/out-of-scope payloads.

    Compositing rules (spec §23): the screen starts fully transparent;
    a frame's transparent index leaves underlying pixels; disposal 0/1
    keep the composite, 2 clears the frame's rect back to transparent,
    3 restores the screen as it was before the frame.  This is the
    true video-column path — ``video_frame_sample_df`` samples these
    frames instead of byte windows when the payload is a GIF."""
    try:
        return _decode_gif_frames_impl(payload, max_frames)
    except (ValueError, IndexError, KeyError, _struct.error):
        return None


def _decode_gif_frames_impl(payload, max_frames):
    dims = gif_dims(payload) if payload else None
    if dims is None:
        return None
    sw, sh = dims
    if sw == 0 or sh == 0:
        return None
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
        if gct.shape[0] < n:
            return None
        pos += 3 * n
    screen = np.zeros((sh, sw, 4), np.uint8)  # transparent canvas
    frames = []
    transparent = None
    disposal = 0
    delay_cs = 0
    n_data = len(payload)
    while pos < n_data:
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:
                gce_packed = payload[pos + 1]
                delay_cs = _struct.unpack_from("<H", payload, pos + 2)[0]
                transparent = payload[pos + 4] if gce_packed & 0x01 else None
                disposal = (gce_packed >> 2) & 0x07
            while pos < n_data and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            return None  # unknown block
        left, top, w, h = _struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        ipacked = payload[pos + 9]
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
            pos += 3 * n
        if ct is None or left + w > sw or top + h > sh:
            return None
        mcs = payload[pos]
        pos += 1
        if mcs < 2 or mcs > 11:
            return None
        data = bytearray()
        while pos < n_data and payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # block terminator
        idx = _LZWDecoder(mcs).decode(bytes(data), w * h)
        if idx is None or len(idx) < w * h:
            return None
        frame = np.asarray(idx[: w * h], np.int64).reshape(h, w)
        if ipacked & 0x40:
            frame = _deinterlace(frame)
        if frame.max() >= ct.shape[0]:
            return None
        before = screen[top : top + h, left : left + w].copy()
        rect = screen[top : top + h, left : left + w]
        opaque = (
            frame != transparent if transparent is not None
            else np.ones_like(frame, bool)
        )
        rect[opaque, :3] = ct[frame[opaque]]
        rect[opaque, 3] = 255
        frames.append((len(frames), int(delay_cs), screen.copy()))
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:
            rect[:] = 0
        elif disposal == 3:
            rect[:] = before
        transparent = None
        disposal = 0
        delay_cs = 0
    return frames if frames else None


def encode_gif_animation(frames, delays_cs=None, transparent_index=None) -> bytes:
    """Multi-frame GIF89a writer for synthetic video-column corpora:
    each entry of ``frames`` is an (h, w) palette-index array over the
    implicit 256-gray palette (all frames full-screen, disposal 1).
    Exercises every path ``decode_gif_frames`` has: per-frame GCEs,
    delays, optional transparency."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape
    if delays_cs is None:
        delays_cs = [4] * len(frames)
    palette = np.stack([np.arange(256)] * 3, 1).astype(np.uint8)
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x07, 0, 0])
    out += palette.tobytes()
    for fr, delay in zip(frames, delays_cs):
        if fr.shape != (h, w):
            raise ValueError("all frames must be full-screen")
        gce_packed = 0x04  # disposal 1 (do not dispose)
        tix = 0
        if transparent_index is not None:
            gce_packed |= 0x01
            tix = transparent_index
        out += bytes([0x21, 0xF9, 4, gce_packed])
        out += _struct.pack("<H", int(delay)) + bytes([tix, 0])
        out += bytes([0x2C]) + _struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        mcs = 8
        out += bytes([mcs])
        lzw = _lzw_encode(fr.astype(np.int64).reshape(-1), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def encode_gif(
    pixels,
    transparent_index: Optional[int] = None,
    interlace: bool = False,
) -> bytes:
    """(h, w) palette-index array + implicit 256-gray palette, or
    (h, w, 3) RGB quantized to the exact colors present (≤256 unique
    required) → GIF89a bytes.  Real LZW compression."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        palette = np.stack([np.arange(256)] * 3, 1).astype(np.uint8)
        idx = arr.astype(np.int64)
    else:
        h, w = arr.shape[:2]
        flat = arr.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if colors.shape[0] > 256:
            raise ValueError("more than 256 unique colors")
        palette = np.zeros((256, 3), np.uint8)
        palette[: colors.shape[0]] = colors
        idx = inverse.reshape(h, w).astype(np.int64)
    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    out += palette.tobytes()
    if transparent_index is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent_index, 0])
    ipacked = 0x40 if interlace else 0
    out += bytes([0x2C]) + _struct.pack("<HHHH", 0, 0, w, h) + bytes([ipacked])
    rows = idx
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        rows = idx[order]
    mcs = 8
    out += bytes([mcs])
    lzw = _lzw_encode(rows.reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)
