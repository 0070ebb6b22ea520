"""Pure-numpy WAV (RIFF/WAVE PCM) codec — the audio leg of the
multimodal column contract.

The reference engine treats fetched bodies as opaque bytes with
charset/mime sniffing (hQuery.php:136-226 detects content types before
parsing); this module gives the Spark pipeline the same honesty for
``audio/*`` payloads: a REAL container walk + PCM decode, not a stub.
Scope: uncompressed integer PCM (format tag 1) at 8/16/24/32 bits,
any channel count, little-endian — the format synthetic corpora and
crawl-side WAV attachments actually use.  Compressed codecs (MP3, OGG,
FLAC, AAC) remain honestly stubbed in ``multimodal.py`` (no codec libs
in this container).

Everything decode-side is exact integer arithmetic, so downstream
aggregates (sum, sum of squares, peak) admit closed-form SQL twins.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

__all__ = ["encode_wav", "decode_wav", "wav_meta"]


def encode_wav(samples, sample_rate: int = 16000, bits: int = 16) -> bytes:
    """Encode an (n_samples, channels) int array as RIFF/WAVE PCM.

    ``samples`` values must already fit the target bit depth (8-bit is
    stored unsigned with the usual +128 bias; wider depths are signed
    little-endian).  The encoder exists so tests and synthetic corpora
    exercise every branch the decoder has.
    """
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if bits == 8:
        body = (a.astype(np.int64) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        body = a.astype("<i2").tobytes()
    elif bits == 24:
        as32 = a.astype("<i4").tobytes()
        # keep the low 3 of each 4 little-endian bytes
        b = np.frombuffer(as32, np.uint8).reshape(-1, 4)[:, :3]
        body = b.tobytes()
    elif bits == 32:
        body = a.astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    block_align = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, bits
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) % 2:  # RIFF chunks are word-aligned
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _walk_chunks(payload: bytes):
    """Yield (fourcc, offset, size) for each top-level RIFF sub-chunk,
    tolerating a truncated final chunk (size clamped to the payload)."""
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        yield cc, body, min(size, n - body)
        pos = body + size + (size & 1)


def wav_meta(payload: Optional[bytes]) -> Optional[tuple]:
    """(sample_rate, channels, bits, n_samples) from the container
    headers alone, or None when not a PCM WAV."""
    dec = decode_wav(payload)
    if dec is None:
        return None
    rate, samples = dec
    return (rate, samples.shape[1], None, samples.shape[0])


def decode_wav(payload: Optional[bytes]):
    """Decode RIFF/WAVE integer PCM to (sample_rate, samples) where
    ``samples`` is an (n_samples, channels) int32 array (8-bit payloads
    are de-biased to signed).  Returns None for non-WAV bytes, non-PCM
    format tags, or malformed headers — fault-tolerant like the rest of
    the engine (bad rows yield NULL, they never kill the task)."""
    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    fmt = None
    data = None
    for cc, off, size in _walk_chunks(payload):
        if cc == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", payload, off)
        elif cc == b"data" and data is None:
            data = payload[off : off + size]
    if fmt is None or data is None:
        return None
    tag, ch, rate, _brate, _balign, bits = fmt
    if tag != 1 or ch < 1 or bits not in (8, 16, 24, 32):
        return None
    width = bits // 8
    frame = width * ch
    usable = len(data) - len(data) % frame  # drop a truncated tail frame
    if usable <= 0:
        return rate, np.zeros((0, ch), np.int32)
    raw = np.frombuffer(data, np.uint8, count=usable)
    if bits == 8:
        vals = raw.astype(np.int32) - 128
    elif bits == 16:
        vals = raw.view("<i2").astype(np.int32)
    elif bits == 24:
        b = raw.reshape(-1, 3).astype(np.int32)
        vals = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
    else:
        vals = raw.view("<i4").astype(np.int32)
    return rate, vals.reshape(-1, ch)
