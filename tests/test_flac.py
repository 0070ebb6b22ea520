"""FLAC codec tests (operators/flac.py): exact round-trips through the
fixed-predictor encoder, decoder coverage of constant/verbatim/fixed
subframes and rice residuals, STREAMINFO metadata, CRC rejection, and
hand-built streams for the paths the encoder does not emit (escape
partitions, multi-partition residuals, stereo decorrelation, LPC)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hquery_php_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    _zigzag,
    decode_flac,
    encode_flac,
    flac_meta,
)


def test_roundtrip_basic():
    rng = np.random.RandomState(0)
    s = rng.randint(-2000, 2001, size=(300, 2)).astype(np.int64)
    rate, dec = decode_flac(encode_flac(s, 22050, 16))
    assert rate == 22050
    assert dec.shape == (300, 2)
    assert (dec == s).all()


@pytest.mark.parametrize("bits,lo,hi", [(8, -128, 127), (16, -32768, 32767),
                                        (24, -(1 << 23), (1 << 23) - 1)])
def test_roundtrip_depths(bits, lo, hi):
    rng = np.random.RandomState(bits)
    s = rng.randint(lo, hi + 1, size=(130, 1)).astype(np.int64)
    rate, dec = decode_flac(encode_flac(s, 8000, bits))
    assert (dec[:, 0] == s[:, 0]).all()


def test_roundtrip_multiblock_and_meta():
    # > 4096 samples forces multiple frames with UTF-8 frame numbers
    n = 4096 * 2 + 300
    t = np.arange(n)
    s = ((t * 37) % 512 - 256).astype(np.int64)  # ramp: order-1/2 friendly
    p = encode_flac(s, 44100, 16)
    assert flac_meta(p) == (44100, 1, 16, n)
    rate, dec = decode_flac(p)
    assert dec.shape == (n, 1) and (dec[:, 0] == s).all()


def test_constant_and_tiny_blocks():
    s = np.full((17, 3), -5, np.int64)
    _, dec = decode_flac(encode_flac(s, 8000, 16))
    assert (dec == s).all()
    one = np.array([[42]], np.int64)
    _, dec = decode_flac(encode_flac(one, 8000, 8))
    assert dec.tolist() == [[42]]


def test_crc_rejection():
    s = np.arange(100, dtype=np.int64)
    p = bytearray(encode_flac(s, 8000, 16))
    # flip a bit in the frame body (after the 4+38-byte metadata)
    p[60] ^= 0x40
    assert decode_flac(bytes(p)) is None


def test_rejections():
    assert decode_flac(None) is None
    assert decode_flac(b"") is None
    assert decode_flac(b"fLaC") is None
    assert decode_flac(b"RIFF1234WAVE") is None
    assert flac_meta(b"OggS") is None


# ------------------------------------------------------------------ #
# hand-built streams for decoder-only paths


def _streaminfo(n, rate, ch, bits):
    si = _BitWriter()
    si.write(16, 16).write(16, 16).write(0, 24).write(0, 24)
    si.write(rate, 20).write(ch - 1, 3).write(bits - 1, 5).write(n, 36)
    body = si.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _frame(payload_bits: _BitWriter, bs, ch_code, bits_code, fno=0):
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0x07 << 4) | 0x00)
    hdr.append(ch_code << 4 | bits_code << 1)
    hdr += _utf8_number(fno)
    hdr += struct.pack(">H", bs - 1)
    hdr.append(_crc8(bytes(hdr)))
    payload_bits.align()
    body = bytes(hdr) + payload_bits.bytes()
    return body + struct.pack(">H", _crc16(body))


def _rice_subframe(w, sig, order, bits, k=2, part_order=0, escape_first=False):
    sig = np.asarray(sig, np.int64)
    w.write(0, 1).write(0x08 | order, 6).write(0, 1)
    for warm in sig[:order]:
        w.write(int(warm), bits)
    res = np.diff(sig, n=order) if order else sig.copy()
    u = _zigzag(res)
    w.write(0, 2).write(part_order, 4)
    bs = len(sig)
    n_parts = 1 << part_order
    idx = 0
    for p in range(n_parts):
        cnt = (bs >> part_order) - (order if p == 0 else 0)
        if escape_first and p == 0:
            w.write(15, 4).write(bits, 5)  # escape: raw n-bit residuals
            for _ in range(cnt):
                w.write(int(res[idx]), bits)
                idx += 1
        else:
            w.write(k, 4)
            for _ in range(cnt):
                v = int(u[idx]); idx += 1
                w.unary(v >> k)
                if k:
                    w.write(v & ((1 << k) - 1), k)
    return res


def test_multi_partition_and_escape_residuals():
    bs = 32
    sig = (np.arange(bs) * 7 % 100 - 50).astype(np.int64)
    w = _BitWriter()
    _rice_subframe(w, sig, order=1, bits=16, k=3, part_order=2,
                   escape_first=True)
    p = _streaminfo(bs, 8000, 1, 16) + _frame(w, bs, ch_code=0, bits_code=4)
    rate, dec = decode_flac(p)
    assert (dec[:, 0] == sig).all()


def test_verbatim_subframe():
    bs = 9
    sig = np.array([5, -6, 7, -8, 9, 0, 1, -1, 127], np.int64)
    w = _BitWriter()
    w.write(0, 1).write(0x01, 6).write(0, 1)  # verbatim
    for v in sig:
        w.write(int(v), 8)
    p = _streaminfo(bs, 8000, 1, 8) + _frame(w, bs, ch_code=0, bits_code=1)
    _, dec = decode_flac(p)
    assert (dec[:, 0] == sig).all()


def test_fixed_orders_3_and_4():
    bs = 40
    t = np.arange(bs, dtype=np.int64)
    sig = t**3 % 1000 - 500  # high-order structure
    for order in (3, 4):
        w = _BitWriter()
        _rice_subframe(w, sig, order=order, bits=16, k=5)
        p = _streaminfo(bs, 8000, 1, 16) + _frame(w, bs, 0, 4)
        _, dec = decode_flac(p)
        assert (dec[:, 0] == sig).all(), order


def test_lpc_subframe():
    bs = 16
    sig = np.array([100, 90, 80, 72, 64, 58, 52, 47, 42, 38, 34, 31,
                    28, 25, 22, 20], np.int64)
    order, shift, coefs = 2, 4, [28, -13]  # pred = (28*s1 - 13*s2) >> 4
    w = _BitWriter()
    w.write(0, 1).write(32 + order - 1, 6).write(0, 1)
    for warm in sig[:order]:
        w.write(int(warm), 16)
    w.write(6 - 1, 4)  # precision 6 bits (fits 28 and -13)
    w.write(shift, 5)
    for cf in coefs:
        w.write(cf & 0x3F, 6)
    res = []
    for i in range(order, bs):
        pred = (coefs[0] * int(sig[i - 1]) + coefs[1] * int(sig[i - 2])) >> shift
        res.append(int(sig[i]) - pred)
    u = [(v << 1) if v >= 0 else ((-v << 1) - 1) for v in res]
    w.write(0, 2).write(0, 4).write(2, 4)
    for v in u:
        w.unary(v >> 2)
        w.write(v & 3, 2)
    p = _streaminfo(bs, 8000, 1, 16) + _frame(w, bs, 0, 4)
    _, dec = decode_flac(p)
    assert (dec[:, 0] == sig).all()


@pytest.mark.parametrize("ch_code,mode", [(8, "left"), (9, "right"), (10, "mid")])
def test_stereo_decorrelation(ch_code, mode):
    bs = 24
    rng = np.random.RandomState(ch_code)
    left = rng.randint(-500, 500, bs).astype(np.int64)
    right = rng.randint(-500, 500, bs).astype(np.int64)
    side = left - right
    if mode == "left":
        c0, c1, b0, b1 = left, side, 16, 17
    elif mode == "right":
        c0, c1, b0, b1 = side, right, 17, 16
    else:
        mid = (left + right) >> 1
        c0, c1, b0, b1 = mid, side, 16, 17
    w = _BitWriter()
    _rice_subframe(w, c0, order=0, bits=b0, k=6)
    _rice_subframe(w, c1, order=0, bits=b1, k=6)
    p = _streaminfo(bs, 8000, 2, 16) + _frame(w, bs, ch_code, 4)
    _, dec = decode_flac(p)
    assert (dec[:, 0] == left).all() and (dec[:, 1] == right).all()


def test_wasted_bits():
    bs = 8
    sig = np.array([4, 8, -12, 16, -20, 24, 28, -32], np.int64)  # all /4
    w = _BitWriter()
    w.write(0, 1).write(0x08, 6)  # fixed order 0
    w.write(1, 1)
    w.unary(1)  # wasted = 1 + unary(1) = 2
    shifted = sig >> 2
    u = _zigzag(shifted)
    w.write(0, 2).write(0, 4).write(3, 4)
    for v in u:
        v = int(v)
        w.unary(v >> 3)
        w.write(v & 7, 3)
    p = _streaminfo(bs, 8000, 1, 16) + _frame(w, bs, 0, 4)
    _, dec = decode_flac(p)
    assert (dec[:, 0] == sig).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 300), st.integers(1, 3), st.sampled_from([8, 16, 24]),
       st.integers(0, 2**31 - 1))
def test_fuzz_roundtrip(n, ch, bits, seed):
    rng = np.random.RandomState(seed)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    s = rng.randint(lo, hi + 1, size=(n, ch)).astype(np.int64)
    rate, dec = decode_flac(encode_flac(s, 16000, bits))
    assert (dec == s).all()


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200))
def test_fuzz_soup_never_raises(b):
    decode_flac(b)
    decode_flac(b"fLaC" + b)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_fuzz_truncation_corruption(data):
    s = np.arange(-40, 40, dtype=np.int64)
    p = encode_flac(s, 8000, 16)
    cut = data.draw(st.integers(0, len(p)))
    decode_flac(p[:cut])
    pos = data.draw(st.integers(0, len(p) - 1))
    bb = bytearray(p)
    bb[pos] ^= data.draw(st.integers(1, 255))
    decode_flac(bytes(bb))
