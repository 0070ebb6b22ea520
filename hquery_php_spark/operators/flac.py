"""Pure-Python FLAC codec (fixed-predictor subset) — REAL compressed
audio for the multimodal column contract.

FLAC is lossless, so decoded sample statistics keep the closed-form SQL
twins that WAV/PCM already has; this module upgrades the audio leg from
"containers only" to a genuine compressed codec without any media
library.  Scope (per the FLAC format spec, RFC 9639):

* decode: STREAMINFO metadata walk; frames with constant, verbatim,
  fixed-order-0..4, and LPC subframes; rice residuals (both coding
  methods, 4- and 5-bit parameters, escape partitions, multi-partition
  orders); independent channels plus all three stereo decorrelations
  (left/side, right/side, mid/side); UTF-8 frame numbers; CRC-8 header
  and CRC-16 frame checks (verified, mismatch → None).
* encode: fixed predictors 0-2 with per-frame order selection and a
  single rice partition — intentionally simple, but every stream it
  emits is spec-valid and exercises the decoder's rice/bit paths.

Bit depths 8/16/24, 1-8 channels, any block size.  Like the other
codecs (gif.py, webp.py, avi.py) the encoder exists to synthesize
deterministic corpora; round-trips are pinned exact by tests and a
hypothesis fuzz.

Reference parity note: the reference engine (duzun/hQuery.php) has no
audio codec; this is beyond-reference multimodal surface under its
fault-tolerance doctrine (decode what you can, NULL what you cannot).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

__all__ = ["encode_flac", "decode_flac", "flac_meta"]


# ------------------------------------------------------------------ #
# CRCs (FLAC frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)

def _make_crc8():
    tbl = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _make_crc16():
    tbl = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_CRC8 = _make_crc8()
_CRC16 = _make_crc16()


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------------------------ #
# bit IO (MSB-first, unlike the LSB-first readers in gif/webp)

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int):
        if bits:
            self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
            self.n += bits
            while self.n >= 8:
                self.n -= 8
                self.out.append((self.acc >> self.n) & 0xFF)
        return self

    def unary(self, q: int):
        # q zeros then a one (rice quotient)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        return self.write(1, q + 1)

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)
        return self

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        d = self.data
        while bits:
            if self.byte >= len(d):
                raise ValueError("flac: bitstream exhausted")
            avail = 8 - self.bit
            take = avail if avail < bits else bits
            cur = d[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            bits -= take
        return v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("flac: runaway unary")
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(v: np.ndarray) -> np.ndarray:
    # rice codes are unsigned; FLAC folds residuals sign-first
    return np.where(v >= 0, v << 1, (-v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if not (u & 1) else -((u + 1) >> 1)


_FIXED_COEFS = {  # residual = diff^order of the signal
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ------------------------------------------------------------------ #
# encode

def encode_flac(samples, sample_rate: int = 16000, bits: int = 16) -> bytes:
    """(n, ch) int array → FLAC bytes.  Fixed predictors 0-2 chosen per
    frame by residual magnitude, one rice partition per subframe,
    4096-sample blocks, independent channels."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if not 1 <= ch <= 8 or bits not in (8, 16, 24):
        raise ValueError("unsupported channels/bit depth")

    out = bytearray(b"fLaC")
    block = 4096
    # STREAMINFO (last-metadata flag set): min/max block+frame sizes,
    # rate(20) ch-1(3) bits-1(5) total(36), md5 zeroed (unset is legal)
    si = _BitWriter()
    si.write(min(block, max(n, 16)), 16).write(min(block, max(n, 16)), 16)
    si.write(0, 24).write(0, 24)
    si.write(sample_rate, 20).write(ch - 1, 3).write(bits - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for fno, start in enumerate(range(0, max(n, 1), block)):
        blk = a[start : start + block]
        out += _encode_frame(blk, fno, sample_rate, bits, ch)
    return bytes(out)


def _utf8_number(x: int) -> bytes:
    # FLAC's extended-UTF-8 frame number
    if x < 0x80:
        return bytes([x])
    if x < 0x800:
        return bytes([0xC0 | x >> 6, 0x80 | x & 0x3F])
    if x < 0x10000:
        return bytes([0xE0 | x >> 12, 0x80 | (x >> 6) & 0x3F, 0x80 | x & 0x3F])
    return bytes(
        [0xF0 | x >> 18, 0x80 | (x >> 12) & 0x3F, 0x80 | (x >> 6) & 0x3F,
         0x80 | x & 0x3F]
    )


def _rice_param(u: np.ndarray) -> int:
    if not len(u):
        return 0
    mean = int(u.mean()) + 1
    k = 0
    while (1 << (k + 1)) < mean and k < 14:
        k += 1
    return k


def _encode_frame(blk: np.ndarray, fno: int, rate: int, bits: int, ch: int) -> bytes:
    bs = blk.shape[0]
    hdr = bytearray(b"\xff\xf8")  # sync + fixed blocking
    hdr.append((0x07 << 4) | 0x00)  # block size "get 16-bit at end", rate in hdr end? 0 = from STREAMINFO
    hdr.append((ch - 1) << 4 | {8: 1, 16: 4, 24: 6}[bits] << 1)
    hdr += _utf8_number(fno)
    hdr += struct.pack(">H", bs - 1)  # 16-bit block size follows (code 7)
    hdr.append(_crc8(bytes(hdr)))

    w = _BitWriter()
    for c in range(ch):
        sig = blk[:, c]
        # pick the cheapest fixed order 0-2 by sum |residual|
        best, best_res = None, None
        for order in (0, 1, 2):
            if bs <= order:
                continue
            res = np.diff(sig, n=order)
            cost = int(np.abs(res).sum())
            if best is None or cost < best[0]:
                best, best_res = (cost, order), res
        order = best[1]
        w.write(0, 1)  # zero pad bit
        w.write(0x08 | order, 6)  # subframe type: fixed, order
        w.write(0, 1)  # no wasted bits
        for warm in sig[:order]:
            w.write(int(warm), bits)
        u = _zigzag(best_res.astype(np.int64))
        k = _rice_param(u)
        w.write(0, 2)  # residual coding method: rice 4-bit params
        w.write(0, 4)  # partition order 0 → one partition
        w.write(k, 4)
        for v in u:
            v = int(v)
            w.unary(v >> k)
            if k:
                w.write(v & ((1 << k) - 1), k)
    w.align()
    body = bytes(hdr) + w.bytes()
    return body + struct.pack(">H", _crc16(body))


# ------------------------------------------------------------------ #
# decode

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_RATES = {0: None, 1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
          6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BITS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def flac_meta(payload: Optional[bytes]) -> Optional[tuple]:
    """(sample_rate, channels, bits, n_samples) from STREAMINFO."""
    si = _streaminfo(payload)
    if si is None:
        return None
    rate, ch, bits, total, _pos = si
    return rate, ch, bits, total


def _streaminfo(payload):
    if payload is None or len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    pos = 4
    rate = ch = bits = total = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = pos + 4
        if hdr & 0x7F == 0 and size >= 34:  # STREAMINFO
            r = _BitReader(payload, body)
            r.read(16); r.read(16); r.read(24); r.read(24)
            rate = r.read(20)
            ch = r.read(3) + 1
            bits = r.read(5) + 1
            total = r.read(36)
        pos = body + size
        if hdr & 0x80:  # last metadata block
            break
    if rate is None:
        return None
    return rate, ch, bits, total, pos


def decode_flac(payload: Optional[bytes]):
    """FLAC → (sample_rate, (n, ch) int32 array), or None for non-FLAC /
    corrupt / out-of-scope payloads (CRC mismatches reject the stream)."""
    try:
        return _decode_impl(payload)
    except (ValueError, IndexError, struct.error):
        return None


def _decode_impl(payload):
    si = _streaminfo(payload)
    if si is None:
        return None
    rate, ch, bits, total, pos = si
    chunks = []
    got = 0
    while pos + 5 <= len(payload) and (total == 0 or got < total):
        frame = _decode_frame(payload, pos, ch, bits, rate)
        if frame is None:
            return None
        blk, pos = frame
        chunks.append(blk)
        got += blk.shape[0]
    if not chunks:
        return None
    samples = np.vstack(chunks)
    if total:
        samples = samples[:total]
    return rate, samples.astype(np.int32)


def _decode_frame(payload, pos, ch_si, bits_si, rate_si):
    start = pos
    if payload[pos] != 0xFF or (payload[pos + 1] & 0xFE) != 0xF8:
        return None
    b2, b3 = payload[pos + 2], payload[pos + 3]
    bs_code, rate_code = b2 >> 4, b2 & 0x0F
    ch_code, size_code = b3 >> 4, (b3 >> 1) & 0x07
    pos += 4
    # UTF-8-coded frame/sample number: lead byte + continuation bytes
    pos += 1
    while pos < len(payload) and payload[pos] & 0xC0 == 0x80:
        pos += 1
    if bs_code == 6:
        bs = payload[pos] + 1
        pos += 1
    elif bs_code == 7:
        bs = struct.unpack_from(">H", payload, pos)[0] + 1
        pos += 2
    else:
        bs = _BLOCK_SIZES.get(bs_code)
        if bs is None:
            return None
    if rate_code == 12:
        pos += 1
    elif rate_code in (13, 14):
        pos += 2
    crc_hdr = payload[pos]
    if _crc8(payload[start : pos]) != crc_hdr:
        return None
    pos += 1
    bits = _BITS.get(size_code, bits_si)
    if ch_code <= 7:
        n_ch, mode = ch_code + 1, "indep"
    elif ch_code == 8:
        n_ch, mode = 2, "left"
    elif ch_code == 9:
        n_ch, mode = 2, "right"
    elif ch_code == 10:
        n_ch, mode = 2, "mid"
    else:
        return None
    r = _BitReader(payload, pos)
    chans = []
    for c in range(n_ch):
        extra = 1 if (
            (mode == "left" and c == 1)
            or (mode == "right" and c == 0)
            or (mode == "mid" and c == 1)
        ) else 0
        chans.append(_decode_subframe(r, bs, bits + extra))
    r.align()
    body_end = r.byte
    if _crc16(payload[start:body_end]) != struct.unpack_from(
        ">H", payload, body_end
    )[0]:
        return None
    ch_arrays = [np.asarray(c, np.int64) for c in chans]
    if mode == "left":
        left, side = ch_arrays
        ch_arrays = [left, left - side]
    elif mode == "right":
        side, right = ch_arrays
        ch_arrays = [right + side, right]
    elif mode == "mid":
        mid, side = ch_arrays
        mid2 = (mid << 1) | (side & 1)
        ch_arrays = [(mid2 + side) >> 1, (mid2 - side) >> 1]
    return np.stack(ch_arrays, axis=1), body_end + 2


def _decode_subframe(r: _BitReader, bs: int, bits: int):
    if r.read(1):
        raise ValueError("flac: bad subframe pad bit")
    typ = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.unary()
        bits -= wasted
    if typ == 0:  # constant
        v = _sign_extend(r.read(bits), bits)
        out = np.full(bs, v, np.int64)
    elif typ == 1:  # verbatim
        out = np.array([_sign_extend(r.read(bits), bits) for _ in range(bs)],
                       np.int64)
    elif 8 <= typ <= 12:  # fixed, order = typ - 8
        order = typ - 8
        warm = [_sign_extend(r.read(bits), bits) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        out = _reconstruct_fixed(warm, res, order)
    elif typ >= 32:  # LPC, order = typ - 31
        order = typ - 31
        warm = [_sign_extend(r.read(bits), bits) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid lpc precision")
        shift = _sign_extend(r.read(5), 5)
        coefs = [_sign_extend(r.read(prec), prec) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        out = np.empty(bs, np.int64)
        out[:order] = warm
        for i in range(order, bs):
            pred = 0
            for j, cf in enumerate(coefs):
                pred += cf * out[i - 1 - j]
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {typ}")
    if wasted:
        out = out << wasted
    return out


def _sign_extend(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= 1 << (bits - 1) else v


def _decode_residual(r: _BitReader, bs: int, order: int):
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if bs % n_parts or (bs >> part_order) <= order:
        raise ValueError("flac: bad partition order")
    out = []
    for p in range(n_parts):
        cnt = (bs >> part_order) - (order if p == 0 else 0)
        k = r.read(kbits)
        if k == escape:
            raw = r.read(5)
            out.extend(
                _sign_extend(r.read(raw), raw) if raw else 0 for _ in range(cnt)
            )
        else:
            for _ in range(cnt):
                q = r.unary()
                u = (q << k) | (r.read(k) if k else 0)
                out.append(_unzigzag(u))
    return np.asarray(out, np.int64)


def _reconstruct_fixed(warm, res, order):
    bs = len(warm) + len(res)
    out = np.empty(bs, np.int64)
    out[:order] = warm
    if order == 0:
        out[:] = res
    elif order == 1:
        out[1:] = res
        np.cumsum(out, out=out)
    elif order == 2:
        out[2:] = res
        # integrate twice: first diff, then signal
        d = out.copy()
        d[1] = out[1] - out[0]
        np.cumsum(d[1:], out=d[1:])
        out[1:] = d[1:]
        np.cumsum(out, out=out)
    else:
        for i in range(order, bs):
            acc = res[i - order]
            for j, cf in enumerate(_FIXED_COEFS[order]):
                acc += cf * out[i - 1 - j]
            out[i] = acc
    return out
