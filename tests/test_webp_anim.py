"""Animated-WebP (ANIM/ANMF) composition tests (operators/webp.py).

Frames are VP8L-encoded (lossless), so every canvas snapshot is exactly
computable: overwrite blending places the frame rect verbatim,
alpha blending follows the container spec's integer over-operator,
disposal 1 clears the rect to transparent black after the snapshot.
"""

import numpy as np

from hquery_php_spark.operators.webp import (
    decode_webp,
    decode_webp_frames,
    encode_webp_anim,
    encode_webp_lossless,
)


def _rgba(seed, h, w, alpha=255):
    r = np.random.default_rng(seed)
    px = r.integers(0, 256, (h, w, 4), dtype=np.uint8)
    px[:, :, 3] = alpha
    return px


def test_two_frame_overwrite_and_durations():
    f0 = _rgba(0, 10, 12)
    f1 = _rgba(1, 4, 6)
    data = encode_webp_anim(12, 10, [(0, 0, f0, 40, 1, 0), (2, 4, f1, 60, 1, 0)])
    frames = decode_webp_frames(data)
    assert [(f[0], f[1]) for f in frames] == [(0, 40), (1, 60)]
    assert np.array_equal(frames[0][2], f0)
    exp = f0.copy()
    exp[4:8, 2:8] = f1
    assert np.array_equal(frames[1][2], exp)
    # the still-image API refuses animations (mirrors decode_gif)
    assert decode_webp(data) is None


def test_dispose_to_background_clears_rect():
    f0 = _rgba(2, 8, 8)
    f1 = _rgba(3, 4, 4)
    f2 = _rgba(4, 2, 2)
    data = encode_webp_anim(
        8, 8,
        [(0, 0, f0, 10, 1, 0), (2, 2, f1, 10, 1, 1), (0, 0, f2, 10, 1, 0)],
    )
    frames = decode_webp_frames(data)
    # frame 2's canvas: f0, with f1's rect cleared, then f2 on top
    exp = f0.copy()
    exp[2:6, 2:6] = 0
    exp[0:2, 0:2] = f2
    assert np.array_equal(frames[2][2], exp)


def test_alpha_blend_over_operator_exact():
    base = np.zeros((4, 4, 4), np.uint8)
    base[:, :] = (100, 150, 200, 255)
    top = np.zeros((4, 4, 4), np.uint8)
    top[:, :] = (20, 40, 60, 128)
    data = encode_webp_anim(4, 4, [(0, 0, base, 10, 1, 0), (0, 0, top, 10, 0, 0)])
    frames = decode_webp_frames(data)
    # integer over: A = 128*255 + 255*(255-128); channel c:
    #   (top_c*128*255 + base_c*255*(255-128) + A/2) / A, alpha (A+127)/255
    sa, da = 128, 255
    keep = da * (255 - sa)
    oa255 = sa * 255 + keep
    exp = [
        (20 * sa * 255 + 100 * keep + oa255 // 2) // oa255,
        (40 * sa * 255 + 150 * keep + oa255 // 2) // oa255,
        (60 * sa * 255 + 200 * keep + oa255 // 2) // oa255,
        (oa255 + 127) // 255,
    ]
    got = frames[1][2][0, 0].tolist()
    assert got == exp


def test_blend_onto_transparent_keeps_frame():
    top = np.zeros((4, 4, 4), np.uint8)
    top[:, :] = (10, 20, 30, 77)
    data = encode_webp_anim(6, 6, [(2, 2, top, 10, 0, 0)])
    frames = decode_webp_frames(data)
    c = frames[0][2]
    assert np.array_equal(c[2:6, 2:6], top)  # over transparent = src
    assert (c[:2] == 0).all() and (c[:, :2] == 0).all()


def test_still_image_is_single_zero_duration_frame():
    px = _rgba(5, 7, 9)
    fr = decode_webp_frames(encode_webp_lossless(px))
    assert len(fr) == 1 and fr[0][:2] == (0, 0)
    assert np.array_equal(fr[0][2], px)


def test_max_frames_and_corrupt():
    f0 = _rgba(6, 4, 4)
    data = encode_webp_anim(4, 4, [(0, 0, f0, 10, 1, 0)] * 5)
    assert len(decode_webp_frames(data, max_frames=2)) == 2
    assert decode_webp_frames(b"RIFFxxxxWEBP") is None
    assert decode_webp_frames(None) is None
    # frame exceeding the canvas is rejected, not miscomposed
    bad = encode_webp_anim(4, 4, [(2, 2, _rgba(7, 4, 4), 10, 1, 0)])
    assert decode_webp_frames(bad) is None
