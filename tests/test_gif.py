"""GIF codec tests (operators/gif.py): real LZW round trips, the
canonical externally-produced 1×1 fixture, interlace, transparency,
dictionary-reset stress, header parse, rejection boundary, and the
decode_image dispatch order."""

import base64

import numpy as np

from hquery_php_spark.operators.gif import decode_gif, encode_gif, gif_dims
from hquery_php_spark.operators.multimodal import decode_image, sniff_media_type

# The famous 43-byte 1×1 transparent GIF (an independent fixture NOT
# produced by this repo's encoder — pins decoder interop).
_TINY_1PX = base64.b64decode(
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
)


def test_external_1x1_transparent_fixture():
    w, h, ch, px = decode_gif(_TINY_1PX)
    assert (w, h, ch) == (1, 1, 4)
    assert px.tolist() == [[[0, 0, 0, 0]]]  # transparent black
    assert gif_dims(_TINY_1PX) == (1, 1)
    assert sniff_media_type(_TINY_1PX) == "image/gif"


def test_gray_roundtrip_exercises_width_growth():
    # 256-entry palette forces LZW code widths 9→10→11→12
    y, x = np.mgrid[0:60, 0:90]
    g = ((x * 3 + y * 5) % 256).astype(np.uint8)
    w, h, ch, out = decode_gif(encode_gif(g))
    assert (w, h, ch) == (90, 60, 3)
    assert np.array_equal(out, np.stack([g] * 3, -1))


def test_rgb_roundtrip_exact():
    px = np.zeros((33, 47, 3), np.uint8)
    px[::2] = [255, 0, 0]
    px[10:20, 5:30] = [0, 128, 255]
    w, h, ch, out = decode_gif(encode_gif(px))
    assert (w, h, ch) == (47, 33, 3)
    assert np.array_equal(out, px)


def test_interlace_roundtrip():
    y, x = np.mgrid[0:37, 0:23]  # odd height: all four passes non-trivial
    g = ((x * 7 + y * 11) % 256).astype(np.uint8)
    w, h, ch, out = decode_gif(encode_gif(g, interlace=True))
    assert np.array_equal(out, np.stack([g] * 3, -1))


def test_transparency_channel():
    y, x = np.mgrid[0:12, 0:16]
    g = ((x + y) % 16).astype(np.uint8)
    w, h, ch, out = decode_gif(encode_gif(g, transparent_index=7))
    assert ch == 4
    assert np.array_equal(out[:, :, 3] == 0, g == 7)
    # color channels unaffected
    assert np.array_equal(out[:, :, 0], g)


def test_dictionary_reset_stress():
    # random 200×300 at 256 colors exceeds 4096 dictionary entries many
    # times over — the encoder's CLEAR/reset and the decoder's resync
    # must stay bit-exact
    rng = np.random.default_rng(1)
    big = rng.integers(0, 256, (200, 300)).astype(np.uint8)
    w, h, ch, out = decode_gif(encode_gif(big))
    assert np.array_equal(out[:, :, 0], big)


def test_single_pixel_and_uniform():
    for val in (0, 255):
        w, h, ch, out = decode_gif(encode_gif(np.full((1, 1), val, np.uint8)))
        assert (w, h) == (1, 1) and out[0, 0, 0] == val
    w, h, ch, out = decode_gif(encode_gif(np.full((9, 13), 42, np.uint8)))
    assert set(np.unique(out)) == {42}


def test_rejections_and_header_only():
    assert decode_gif(None) is None
    assert decode_gif(b"") is None
    assert decode_gif(b"GIF89a") is None
    assert decode_gif(b"not a gif at all") is None
    # header-only (13 bytes): dims parse, decode correctly refuses
    hdr = b"GIF89a" + (44).to_bytes(2, "little") + (34).to_bytes(2, "little") + b"\xf7\x00\x00"
    assert gif_dims(hdr) == (44, 34)
    assert decode_gif(hdr) is None
    # truncated mid-image
    full = encode_gif(np.arange(64, dtype=np.uint8).reshape(8, 8))
    assert decode_gif(full[: len(full) // 2]) is None
    # >256 unique RGB colors is an encoder error
    y, x = np.mgrid[0:32, 0:32]
    rainbow = np.stack([x * 8, y * 8, (x + y) * 4], -1).astype(np.uint8)
    try:
        encode_gif(rainbow)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_decode_image_dispatches_gif():
    g = ((np.arange(48).reshape(6, 8)) * 5 % 256).astype(np.uint8)
    payload = encode_gif(g)
    w, h, ch, out = decode_image(payload)
    assert (w, h, ch) == (8, 6, 3)
    assert np.array_equal(out[:, :, 0], g)


# ------------------------------------------------------------------ #
# BMP (uncompressed) — the fourth real decode path


def _make_bmp(px, bpp=24, top_down=False):
    import struct

    h, w = px.shape[:2]
    if bpp == 8:
        pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
        stride = (w + 3) // 4 * 4
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w] = px
        data = pal + (rows if top_down else rows[::-1]).tobytes()
        off = 14 + 40 + 1024
    else:
        ch = bpp // 8
        stride = (w * ch + 3) // 4 * 4
        rows = np.zeros((h, stride), np.uint8)
        bgr = px[:, :, [2, 1, 0]] if ch == 3 else px[:, :, [2, 1, 0, 3]]
        rows[:, : w * ch] = bgr.reshape(h, w * ch)
        data = (rows if top_down else rows[::-1]).tobytes()
        off = 14 + 40
    hh = -h if top_down else h
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, hh, 1, bpp, 0, 0, 0, 0, 256 if bpp == 8 else 0, 0
    )
    return hdr + info + data


def test_bmp_decode_all_variants():
    from hquery_php_spark.operators.multimodal import decode_bmp

    y, x = np.mgrid[0:5, 0:7]
    rgb = np.stack([x * 30 % 256, y * 50 % 256, (x + y) * 20 % 256], -1).astype(
        np.uint8
    )
    for td in (False, True):  # bottom-up AND top-down row order
        w, h, ch, out = decode_bmp(_make_bmp(rgb, 24, td))
        assert (w, h, ch) == (7, 5, 3) and np.array_equal(out, rgb)
    rgba = np.dstack([rgb, np.full((5, 7), 200, np.uint8)])
    w, h, ch, out = decode_bmp(_make_bmp(rgba, 32))
    assert ch == 4 and np.array_equal(out, rgba)
    g = ((x * 9 + y * 13) % 256).astype(np.uint8)
    w, h, ch, out = decode_bmp(_make_bmp(g, 8))
    assert ch == 3 and np.array_equal(out[:, :, 0], g)
    # dispatch + sniff + rejects
    assert sniff_media_type(_make_bmp(rgb)) == "image/bmp"
    assert decode_image(_make_bmp(rgb))[2] == 3
    assert decode_bmp(b"BM\x00\x00") is None
    assert decode_bmp(None) is None
    # RLE compression (comp != 0) is out of scope
    bad = bytearray(_make_bmp(g, 8))
    bad[30] = 1  # biCompression = BI_RLE8
    assert decode_bmp(bytes(bad)) is None
