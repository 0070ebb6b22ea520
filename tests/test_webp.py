"""Lossless-WebP (VP8L) codec tests (operators/webp.py): exact
round trips across every encoder-exercisable decoder path (literals,
subtract-green, left-predictor tiles, palette with pixel bundling,
color cache, LZ77 backward references), header parsing for all three
WebP container flavors, and the rejection boundary for truncated or
animated payloads.  Lossy VP8 decode conformance lives in
test_vp8_conformance.py."""

import struct

import numpy as np

from hquery_php_spark.operators.multimodal import decode_image, sniff_media_type
from hquery_php_spark.operators.webp import (
    decode_webp,
    encode_webp_lossless,
    webp_dims,
)


def _rt(px, **kw):
    dec = decode_webp(encode_webp_lossless(px, **kw))
    assert dec is not None, kw
    h, w = px.shape[:2]
    assert (dec[0], dec[1], dec[2]) == (w, h, 4)
    want = (
        px
        if px.shape[2] == 4
        else np.dstack([px, np.full((h, w), 255, np.uint8)])
    )
    assert np.array_equal(dec[3], want), kw


def _gradient(h=13, w=17, ch=3):
    y, x = np.mgrid[0:h, 0:w]
    base = [(x * 11) % 256, (y * 7) % 256, (x + y) % 256]
    if ch == 4:
        base.append((x * y) % 256)
    return np.stack(base, -1).astype(np.uint8)


def test_literal_roundtrip_rgb_and_rgba():
    _rt(_gradient())
    _rt(_gradient(ch=4))
    _rt(np.array([[[7, 8, 9]]], np.uint8))  # 1x1


def test_transform_paths():
    px = _gradient()
    _rt(px, subtract_green=True)
    _rt(px, left_predictor=True)
    _rt(px, subtract_green=True, left_predictor=True)


def test_palette_with_and_without_bundling():
    y, x = np.mgrid[0:19, 0:23]
    few = (np.stack([x % 3, (y % 4) * 7, np.full_like(x, 9)], -1) * 20).astype(
        np.uint8
    )  # 12 colors → pbits=1 bundling
    _rt(few, palette=True)
    two = (np.stack([x % 2, x % 2, x % 2], -1) * 200).astype(np.uint8)
    _rt(two, palette=True)  # 2 colors → pbits=3 (8 px per byte)
    many = np.stack(
        [((x + y) % 5) * 11, (x % 3) * 29, (y % 2) * 97], -1
    ).astype(np.uint8)
    _rt(many, palette=True)  # 30 colors (>16) → no bundling


def test_cache_and_lz77():
    px = _gradient()
    _rt(px, use_cache_bits=4)
    runs = np.repeat(np.repeat(_gradient(4, 4), 5, 0), 5, 1)
    _rt(runs, use_lz77=True)
    _rt(runs, use_lz77=True, use_cache_bits=6)


def test_roundtrip_fuzz():
    rng = np.random.default_rng(3)
    for t in range(15):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        kind = t % 5
        kw = {}
        if kind == 0:
            px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        elif kind == 1:
            px = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
            kw = dict(subtract_green=True)
        elif kind == 2:
            px = (rng.integers(0, 5, (h, w, 3)) * 37).astype(np.uint8)
            kw = dict(palette=True)
        elif kind == 3:
            px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            kw = dict(left_predictor=True, use_cache_bits=5)
        else:
            px = np.repeat(
                rng.integers(0, 256, (h, 1, 3)), w, axis=1
            ).astype(np.uint8)
            kw = dict(use_lz77=True, use_cache_bits=3)
        _rt(px, **kw)


def test_dims_all_container_flavors():
    data = encode_webp_lossless(_gradient(21, 13))
    assert webp_dims(data) == (13, 21)
    assert sniff_media_type(data) == "image/webp"
    # VP8X-wrapped: canvas dims from the extended header
    vp8x = (
        b"RIFF" + struct.pack("<I", 4 + 18) + b"WEBP"
        + b"VP8X" + struct.pack("<I", 10) + bytes([0] * 4)
        + (99).to_bytes(3, "little") + (49).to_bytes(3, "little")
    )
    assert webp_dims(vp8x) == (100, 50)
    # lossy VP8: dims parse from the frame tag; a truncated stream
    # (no partition 0) must still be rejected, not misdecoded
    vp8 = (
        b"RIFF" + struct.pack("<I", 4 + 18) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 10)
        + b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + (320).to_bytes(2, "little") + (240).to_bytes(2, "little")
    )
    assert webp_dims(vp8) == (320, 240)
    assert decode_webp(vp8) is None


def test_vp8x_wrapped_lossless_decodes():
    inner = encode_webp_lossless(_gradient(8, 8))
    vp8l_chunk = inner[12:]  # the VP8L chunk from the bare container
    vp8x = (
        b"VP8X" + struct.pack("<I", 10) + bytes([0] * 4)
        + (7).to_bytes(3, "little") + (7).to_bytes(3, "little")
    )
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + len(vp8x) + len(vp8l_chunk))
        + b"WEBP" + vp8x + vp8l_chunk
    )
    dec = decode_webp(payload)
    assert dec is not None and (dec[0], dec[1]) == (8, 8)


def test_rejections():
    assert decode_webp(None) is None
    assert decode_webp(b"") is None
    assert decode_webp(b"RIFFxxxxWAVE") is None
    assert decode_webp(b"RIFF\x00\x00\x00\x00WEBP") is None
    full = encode_webp_lossless(_gradient())
    assert decode_webp(full[:30]) is None  # truncated
    # corrupt the VP8L signature byte
    bad = bytearray(full)
    bad[20] = 0x2E
    assert decode_webp(bytes(bad)) is None


def test_decode_image_dispatches_webp():
    px = _gradient(6, 9)
    w, h, ch, out = decode_image(encode_webp_lossless(px))
    assert (w, h, ch) == (9, 6, 4)
    assert np.array_equal(out[:, :, :3], px)
