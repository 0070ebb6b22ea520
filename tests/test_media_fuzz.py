"""Property fuzz for the media codecs (wav.py, avi.py, gif frames):
round-trips are exact for arbitrary valid inputs, and arbitrary bytes
(including truncations and bit flips of valid payloads) never raise —
the same fault-tolerance doctrine the HTML parser is fuzzed under
(tests/test_fuzz.py byte-soup differential)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from hquery_php_spark.operators.avi import decode_avi_frames, encode_avi
from hquery_php_spark.operators.gif import (
    decode_gif_frames,
    encode_gif_animation,
)
from hquery_php_spark.operators.wav import decode_wav, encode_wav


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 3),
    st.sampled_from([8, 16, 24, 32]),
    st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_any_shape(n, ch, bits, seed):
    rng = np.random.RandomState(seed % (2**31))
    lo, hi = (-128, 127) if bits == 8 else (-(1 << (bits - 1)), (1 << (bits - 1)) - 1)
    s = rng.randint(lo, hi + 1, size=(n, ch)).astype(np.int64)
    rate, dec = decode_wav(encode_wav(s, 8000, bits))
    assert rate == 8000 and (dec == s).all()


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=300))
def test_wav_never_raises_on_soup(b):
    decode_wav(b)
    decode_wav(b"RIFF" + b)
    decode_wav(b"RIFF\xff\xff\xff\xffWAVE" + b)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 12), st.integers(1, 9), st.integers(1, 4),
       st.integers(3, 4), st.integers(0, 2**31 - 1))
def test_avi_roundtrip_any_shape(w, h, nf, ch, seed):
    rng = np.random.RandomState(seed)
    frs = [rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8) for _ in range(nf)]
    out = decode_avi_frames(encode_avi(frs))
    assert len(out) == nf
    assert all(np.array_equal(px, f) for (_, px), f in zip(out, frs))


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=300))
def test_avi_never_raises_on_soup(b):
    decode_avi_frames(b)
    decode_avi_frames(b"RIFF\xff\xff\xff\xffAVI " + b)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_avi_truncations_never_raise(data):
    fr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    avi = encode_avi([fr, fr])
    cut = data.draw(st.integers(0, len(avi)))
    decode_avi_frames(avi[:cut])
    # single-byte corruption
    pos = data.draw(st.integers(0, len(avi) - 1))
    bb = bytearray(avi)
    bb[pos] ^= data.draw(st.integers(1, 255))
    decode_avi_frames(bytes(bb))


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 10), st.integers(1, 8), st.integers(1, 5),
       st.integers(0, 2**31 - 1))
def test_gif_animation_roundtrip_any_shape(w, h, nf, seed):
    rng = np.random.RandomState(seed)
    frs = [rng.randint(0, 256, size=(h, w)).astype(np.uint8) for _ in range(nf)]
    out = decode_gif_frames(encode_gif_animation(frs))
    assert len(out) == nf
    # full-screen frames with disposal 1: composite f == frame f (gray)
    for (fno, _d, px), f in zip(out, frs):
        assert np.array_equal(px[:, :, 0], f)
        assert (px[:, :, 3] == 255).all()


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_gif_frames_truncations_never_raise(data):
    frs = [np.full((3, 5), c, np.uint8) for c in (7, 99)]
    gif = encode_gif_animation(frs, transparent_index=7)
    cut = data.draw(st.integers(0, len(gif)))
    decode_gif_frames(gif[:cut])
    pos = data.draw(st.integers(0, len(gif) - 1))
    bb = bytearray(gif)
    bb[pos] ^= data.draw(st.integers(1, 255))
    decode_gif_frames(bytes(bb))


# ------------------------------------------------------------------ #
# MJPEG-in-AVI and WebM/V_VP8 (round-4 decode paths)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 5), st.integers(1, 4), st.integers(1, 3),
       st.booleans(), st.integers(0, 2**31 - 1))
def test_avi_mjpeg_roundtrip_any_shape(w8, h8, nf, omit, seed):
    from hquery_php_spark.operators.avi import encode_avi_mjpeg
    from hquery_php_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    w, h = 8 * w8, 8 * h8
    frs = [rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
           for _ in range(nf)]
    out = decode_avi_frames(encode_avi_mjpeg(frs, quality=80, omit_dht=omit))
    assert len(out) == nf
    for (n, px), f in zip(out, frs):
        _w, _h, _c, want = decode_jpeg(encode_jpeg(f, quality=80))
        assert np.array_equal(px, want)  # lossy, but ≡ the direct decode


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_avi_mjpeg_truncations_never_raise(data):
    from hquery_php_spark.operators.avi import encode_avi_mjpeg

    fr = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    avi = encode_avi_mjpeg([fr, fr], quality=80)
    cut = data.draw(st.integers(0, len(avi)))
    decode_avi_frames(avi[:cut])
    pos = data.draw(st.integers(0, len(avi) - 1))
    bb = bytearray(avi)
    bb[pos] ^= data.draw(st.integers(1, 255))
    decode_avi_frames(bytes(bb))


def _vp8_const_stream(level, w, h):
    from hquery_php_spark.operators.vp8 import MBSpec, encode_vp8_stream

    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    mbs = [MBSpec(y2_block=[level] + [0] * 15)] + [
        MBSpec() for _ in range(mbw * mbh - 1)
    ]
    return encode_vp8_stream(w, h, mbs, qi=100)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 40), st.integers(1, 33), st.integers(1, 4))
def test_webm_vp8_roundtrip_any_shape(w, h, nf):
    from hquery_php_spark.operators.mediameta import (
        decode_webm_frames,
        encode_webm_vp8,
    )
    from hquery_php_spark.operators.vp8 import decode_vp8_rgba

    streams = [_vp8_const_stream(1 + (f * 7) % 24, w, h) for f in range(nf)]
    frames = decode_webm_frames(encode_webm_vp8(w, h, streams))
    assert [n for n, _ in frames] == list(range(nf))
    for n, px in frames:
        want = decode_vp8_rgba(streams[n])[3][:, :, :3]
        assert np.array_equal(px, want)


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_webm_truncations_and_soup_never_raise(data):
    from hquery_php_spark.operators.mediameta import (
        decode_webm_frames,
        encode_webm_vp8,
    )

    webm = encode_webm_vp8(12, 8, [_vp8_const_stream(5, 12, 8)] * 2)
    cut = data.draw(st.integers(0, len(webm)))
    decode_webm_frames(webm[:cut])
    pos = data.draw(st.integers(0, len(webm) - 1))
    bb = bytearray(webm)
    bb[pos] ^= data.draw(st.integers(1, 255))
    decode_webm_frames(bytes(bb))
    decode_webm_frames(b"\x1aE\xdf\xa3" + data.draw(st.binary(max_size=200)))


@settings(max_examples=200, deadline=None)
@given(
    tag=st.sampled_from([1, 6, 7, 0x11, 0x55, 2, 0xFFFE]),
    ch=st.integers(0, 9),
    bits=st.sampled_from([0, 4, 8, 16, 24, 32, 64]),
    balign=st.integers(0, 64),
    fact=st.one_of(st.none(), st.integers(0, 1 << 31)),
    body=st.binary(max_size=300),
)
def test_wav_format_dispatch_never_raises(tag, ch, bits, balign, fact, body):
    """Structure-aware fuzz of the format-tag dispatch: arbitrary
    WAVEFORMAT fields over arbitrary data chunks either decode or
    return None — they never raise (G.711 and ADPCM paths included)."""
    import struct as _s

    fmt = _s.pack("<HHIIHH", tag, ch, 8000, 8000, balign, bits)
    chunks = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
    if fact is not None:
        chunks += b"fact" + _s.pack("<II", 4, fact)
    chunks += b"data" + _s.pack("<I", len(body)) + body
    payload = b"RIFF" + _s.pack("<I", len(chunks)) + chunks
    res = decode_wav(payload)
    if res is not None:
        rate, samples = res
        assert samples.ndim == 2


@settings(max_examples=120, deadline=None)
@given(data=st.data())
def test_avi_audio_truncations_never_raise(data):
    import numpy as np

    from hquery_php_spark.operators.avi import decode_avi_audio, encode_avi

    fmt = data.draw(st.sampled_from(["pcm16", "ulaw", "alaw", "adpcm"]))
    n = data.draw(st.integers(1, 600))
    if fmt in ("ulaw", "alaw"):
        audio = np.asarray(
            data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)),
            np.uint8,
        )
    else:
        audio = np.asarray(
            data.draw(
                st.lists(
                    st.integers(-30000, 30000), min_size=n, max_size=n
                )
            ),
            np.int64,
        )
    p = encode_avi(
        [np.zeros((2, 3, 3), np.uint8)], audio=audio, audio_fmt=fmt
    )
    cut = data.draw(st.integers(0, len(p)))
    decode_avi_audio(p[:cut])
    flip = data.draw(st.integers(0, max(len(p) - 1, 0)))
    mutated = bytearray(p)
    mutated[flip] ^= data.draw(st.integers(1, 255))
    decode_avi_audio(bytes(mutated))
