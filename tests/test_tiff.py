"""TIFF codec tests (operators/tiff.py): round trips in both byte
orders, strip assembly, gray/RGB/RGBA, rejection of compressed/tiled/
planar-separate/non-8-bit payloads, decode_image dispatch, fuzz."""

import struct

import numpy as np
from hypothesis import given, settings, strategies as st

from hquery_php_spark.operators.tiff import decode_tiff, encode_tiff, tiff_dims
from hquery_php_spark.operators.multimodal import decode_image, sniff_media_type


def test_roundtrip_gray_both_endians_and_strips():
    rng = np.random.RandomState(1)
    g = rng.randint(0, 256, size=(13, 9)).astype(np.uint8)
    for be in (False, True):
        for rps in (1, 4, 100):
            w, h, ch, px = decode_tiff(encode_tiff(g, big_endian=be,
                                                   rows_per_strip=rps))
            assert (w, h, ch) == (9, 13, 1)
            assert np.array_equal(px[:, :, 0], g), (be, rps)
    assert tiff_dims(encode_tiff(g)) == (9, 13)


def test_roundtrip_rgb_rgba():
    rng = np.random.RandomState(2)
    for ch in (3, 4):
        a = rng.randint(0, 256, size=(5, 7, ch)).astype(np.uint8)
        w, h, cch, px = decode_tiff(encode_tiff(a, big_endian=(ch == 4)))
        assert (w, h, cch) == (7, 5, ch)
        assert np.array_equal(px, a)


def test_sniff_and_dispatch():
    p = encode_tiff(np.full((3, 3), 7, np.uint8))
    assert sniff_media_type(p) == "image/tiff"
    assert sniff_media_type(encode_tiff(np.zeros((2, 2), np.uint8),
                                        big_endian=True)) == "image/tiff"
    w, h, ch, px = decode_image(p)
    assert (w, h) == (3, 3) and (px[:, :, 0] == 7).all()


def _set_tag(payload: bytes, tag_id: int, value: int) -> bytes:
    bo = "<" if payload[:2] == b"II" else ">"
    p = bytearray(payload)
    i = p.find(struct.pack(bo + "HH", tag_id, 3))
    assert i >= 0
    struct.pack_into(bo + "H", p, i + 8, value)
    return bytes(p)


def test_out_of_scope_rejections():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    p = encode_tiff(g)
    assert decode_tiff(_set_tag(p, 259, 5)) is None   # LZW compression
    assert decode_tiff(_set_tag(p, 258, 16)) is None  # 16-bit samples
    assert decode_tiff(None) is None
    assert decode_tiff(b"II*") is None
    assert decode_tiff(b"II\x2b\x00rest") is None     # BigTIFF magic 43
    assert decode_tiff(b"\x89PNG\r\n\x1a\n") is None


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=200))
def test_fuzz_soup_never_raises(b):
    decode_tiff(b)
    decode_tiff(b"II*\x00" + b)
    decode_tiff(b"MM\x00*" + b)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_fuzz_truncation_corruption(data):
    p = encode_tiff(np.arange(35, dtype=np.uint8).reshape(5, 7),
                    rows_per_strip=2)
    cut = data.draw(st.integers(0, len(p)))
    decode_tiff(p[:cut])
    pos = data.draw(st.integers(0, len(p) - 1))
    bb = bytearray(p)
    bb[pos] ^= data.draw(st.integers(1, 255))
    decode_tiff(bytes(bb))


def test_n_bytes_formula_matches_oracle():
    # the multimodal_meta twin computes the payload size in SQL:
    # 122 + w*h + (8 * n_strips when n_strips > 1)
    for did in (0, 1, 16, 17, 100, 255, 4999):
        w, h = 6 + did % 21, 4 + did % 17
        p = encode_tiff(np.full((h, w), did % 256, np.uint8),
                        big_endian=bool(did % 2), rows_per_strip=4)
        n = (h + 3) // 4
        want = 122 + w * h + (8 * n if n > 1 else 0)
        assert len(p) == want, (did, len(p), want)
