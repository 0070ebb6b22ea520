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
