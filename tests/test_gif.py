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


# ------------------------------------------------------------------ #
# Animation: decode_gif_frames (GIF89a disposal-model compositing)


def test_animation_constant_frames_and_delays():
    from hquery_php_spark.operators.gif import decode_gif_frames, encode_gif_animation

    colors = (10, 200, 37, 255)
    gif = encode_gif_animation(
        [np.full((5, 7), c, np.uint8) for c in colors], delays_cs=[2, 4, 6, 8]
    )
    out = decode_gif_frames(gif)
    assert [f[0] for f in out] == [0, 1, 2, 3]
    assert [f[1] for f in out] == [2, 4, 6, 8]
    for (_, _, px), c in zip(out, colors):
        assert px.shape == (5, 7, 4)
        assert (px[:, :, :3] == c).all() and (px[:, :, 3] == 255).all()
    # max_frames stops the walk early
    assert len(decode_gif_frames(gif, max_frames=2)) == 2


def test_animation_transparency_reveals_prior_frame():
    from hquery_php_spark.operators.gif import decode_gif_frames, encode_gif_animation

    f0 = np.full((3, 3), 50, np.uint8)
    f1 = np.zeros((3, 3), np.uint8)  # index 0 = transparent
    f1[1, 1] = 80
    out = decode_gif_frames(encode_gif_animation([f0, f1], transparent_index=0))
    px1 = out[1][2]
    assert px1[1, 1, 0] == 80  # opaque pixel drawn
    assert px1[0, 0, 0] == 50  # transparent pixel shows frame 0 (disposal 1)
    assert (px1[:, :, 3] == 255).all()


def test_animation_disposal_2_and_3():
    from hquery_php_spark.operators.gif import decode_gif_frames, encode_gif_animation

    # hand-build: frame0 disposal 2 (restore bg) then a transparent-only
    # frame — the cleared rect must read transparent, not frame0
    base = encode_gif_animation(
        [np.full((2, 2), 9, np.uint8), np.zeros((2, 2), np.uint8)],
        transparent_index=0,
    )
    b = bytearray(base)
    # first GCE packed byte: set disposal 2 (bits 2-4), keep transparency
    gce1 = base.index(bytes([0x21, 0xF9, 4]))
    b[gce1 + 3] = (2 << 2) | 0x01
    out = decode_gif_frames(bytes(b))
    assert (out[0][2][:, :, 0] == 9).all()
    assert (out[1][2][:, :, 3] == 0).all()  # cleared + transparent draw
    # disposal 3 (restore previous) on frame0: after frame0 the canvas
    # reverts to its pre-frame0 state (fully transparent), and frame1 is
    # all-transparent so it draws nothing on top
    b[gce1 + 3] = (3 << 2) | 0x01
    out = decode_gif_frames(bytes(b))
    assert (out[0][2][:, :, 0] == 9).all()  # frame0 itself unaffected
    assert (out[1][2][:, :, 3] == 0).all()


def test_first_frame_decode_matches_animation_frame0():
    from hquery_php_spark.operators.gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )

    y, x = np.mgrid[0:9, 0:11]
    f0 = ((x * 7 + y * 3) % 256).astype(np.uint8)
    f1 = ((x + y) % 256).astype(np.uint8)
    gif = encode_gif_animation([f0, f1])
    frames = decode_gif_frames(gif)
    w, h, ch, px = decode_gif(gif)
    assert (w, h) == (11, 9) and len(frames) == 2
    assert np.array_equal(px[:, :, 0], frames[0][2][:, :, 0])


def test_frames_rejections():
    from hquery_php_spark.operators.gif import decode_gif_frames

    assert decode_gif_frames(None) is None
    assert decode_gif_frames(b"GIF89a\x00") is None
    assert decode_gif_frames(b"not a gif") is None
    # the external still image decodes as a single frame
    out = decode_gif_frames(_TINY_1PX)
    assert len(out) == 1 and out[0][2].shape == (1, 1, 4)
