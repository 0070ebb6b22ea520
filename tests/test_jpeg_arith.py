"""JPEG arithmetic entropy coding (T.81 Annex D) — operators/jpeg_arith.py.

Three layers:

1. Coder-core property tests: random bit streams through random
   adaptive contexts round-trip exactly (encoder and decoder are
   independent implementations of Annex D's two directions).
2. Codec round-trips that always run: arithmetic encode → decode must
   be BIT-EXACT with the huffman decode of the same image (both entropy
   stages carry the same quantized coefficients).
3. Conformance against libjpeg (skipped when no C toolchain): libjpeg's
   arithmetic streams decode bit-exactly to the coefficients of its own
   huffman streams, and libjpeg itself decodes OUR arithmetic streams
   to its decode of OUR huffman streams.

Reference note: the reference engine (duzun/hQuery.php) has no image
codec — beyond-reference multimodal surface (SURVEY.md §2 addenda).
"""

import shutil
import struct
import subprocess

import numpy as np
import pytest

from hquery_php_spark.operators import jpeg_arith as ja
from hquery_php_spark.operators.jpeg import decode_jpeg, encode_jpeg

# ------------------------------------------------------------------ #
# Layer 1: the Annex D coder itself


def test_state_table_shape_and_anchors():
    assert len(ja.ARITH_STATE_TABLE) == 114
    # T.81 Table D.3 anchors: initial state and the non-adaptive fixed
    # state (self-looping, SWITCH=0) used for sign decisions
    assert ja.ARITH_STATE_TABLE[0] == (0x5A1D, 1, 1, 1)
    assert ja.ARITH_STATE_TABLE[113] == (0x5A1D, 113, 113, 0)
    for qe, nmps, nlps, sw in ja.ARITH_STATE_TABLE:
        assert 1 <= qe <= 0x5B12
        assert 0 <= nmps <= 113 and 0 <= nlps <= 113 and sw in (0, 1)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_coder_roundtrip_random_bits(seed):
    rng = np.random.default_rng(seed)
    n_ctx = 8
    # biased per-context bit streams exercise the estimation ladder
    probs = rng.uniform(0.02, 0.98, n_ctx)
    ctx_seq = rng.integers(0, n_ctx, 5000)
    bits = (rng.uniform(0, 1, 5000) < probs[ctx_seq]).astype(int)
    enc = ja.ArithEncoder()
    stats = bytearray(n_ctx)
    for c, b in zip(ctx_seq, bits):
        enc.encode(stats, int(c), int(b))
    data = enc.flush()
    dec = ja.ArithDecoder(bytes(data) + b"\xff\xd9", 0)
    stats2 = bytearray(n_ctx)
    out = [dec.decode(stats2, int(c)) for c in ctx_seq]
    assert out == bits.tolist()


def test_coder_roundtrip_fixed_bin_mix():
    rng = np.random.default_rng(7)
    seq = rng.integers(0, 2, (3000, 2))  # (use_fixed, bit)
    enc = ja.ArithEncoder()
    stats = bytearray(4)
    for use_fixed, b in seq:
        if use_fixed:
            enc.encode_fixed(int(b))
        else:
            enc.encode(stats, 0, int(b))
    data = enc.flush()
    dec = ja.ArithDecoder(bytes(data) + b"\xff\xd9", 0)
    stats2 = bytearray(4)
    for use_fixed, b in seq:
        got = dec.decode_fixed() if use_fixed else dec.decode(stats2, 0)
        assert got == b


def test_coder_stuffing_and_carry_paths():
    # all-LPS-side streams drive long carry chains / 0xFF emission
    enc = ja.ArithEncoder()
    stats = bytearray(1)
    pattern = ([1] * 40 + [0]) * 60
    for b in pattern:
        enc.encode(stats, 0, b)
    data = enc.flush()
    # every 0xFF inside the entropy segment must be stuffed
    i = 0
    while i < len(data) - 1:
        if data[i] == 0xFF:
            assert data[i + 1] == 0x00, f"unstuffed 0xFF at {i}"
            i += 2
        else:
            i += 1
    dec = ja.ArithDecoder(bytes(data) + b"\xff\xd9", 0)
    stats2 = bytearray(1)
    assert [dec.decode(stats2, 0) for _ in pattern] == pattern


def test_decoder_zero_feed_past_marker():
    # decoding past the end of the segment is legal: zero feed, and pos
    # stays latched at the marker for the caller's scan-end search
    enc = ja.ArithEncoder()
    stats = bytearray(1)
    for b in [1, 0, 1, 1, 0]:
        enc.encode(stats, 0, b)
    data = bytes(enc.flush()) + b"\xff\xd9"
    dec = ja.ArithDecoder(data, 0)
    stats2 = bytearray(1)
    for want in [1, 0, 1, 1, 0]:
        assert dec.decode(stats2, 0) == want
    for _ in range(100):  # keep pulling — must not raise or run off
        dec.decode(stats2, 0)
    assert dec.hit and data[dec.pos] == 0xFF


# ------------------------------------------------------------------ #
# Layer 2: full-codec round-trips (always run)


def _img(rng, h, w, color):
    px = rng.integers(0, 256, (h, w, 3) if color else (h, w), dtype=np.uint8)
    return (px.astype(np.int32) // 2 + 64).astype(np.uint8)


@pytest.mark.parametrize(
    "h,w,color,q,sub,dri",
    [
        (8, 8, False, 90, "444", 0),
        (24, 16, True, 85, "444", 0),
        (33, 17, True, 70, "420", 0),
        (64, 48, True, 85, "444", 4),
        (16, 16, False, 50, "444", 2),
        (7, 5, True, 60, "444", 0),
        (40, 40, True, 95, "420", 3),
    ],
)
def test_sequential_arith_equals_huffman(h, w, color, q, sub, dri):
    rng = np.random.default_rng(h * 100 + w)
    px = _img(rng, h, w, color)
    dh = decode_jpeg(encode_jpeg(px, q, sub, dri))
    da = decode_jpeg(encode_jpeg(px, q, sub, dri, arithmetic=True))
    assert da is not None and dh is not None
    assert da[:3] == dh[:3]
    assert np.array_equal(da[3], dh[3])


@pytest.mark.parametrize(
    "h,w,color,q",
    [(8, 8, False, 90), (24, 16, True, 85), (40, 24, True, 95), (17, 9, False, 40)],
)
def test_progressive_arith_equals_huffman(h, w, color, q):
    rng = np.random.default_rng(h * 7 + w)
    px = _img(rng, h, w, color)
    dh = decode_jpeg(encode_jpeg(px, q))
    da = decode_jpeg(encode_jpeg(px, q, progressive=True, arithmetic=True))
    assert da is not None and dh is not None
    assert np.array_equal(da[3], dh[3])


def test_arith_constant_and_extreme_images():
    for c in (0, 128, 255):
        px = np.full((16, 24, 3), c, dtype=np.uint8)
        dh = decode_jpeg(encode_jpeg(px, 75))
        da = decode_jpeg(encode_jpeg(px, 75, arithmetic=True))
        dp = decode_jpeg(encode_jpeg(px, 75, progressive=True, arithmetic=True))
        assert np.array_equal(da[3], dh[3]) and np.array_equal(dp[3], dh[3])
    # max-entropy noise at q100 (deep magnitude categories)
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    dh = decode_jpeg(encode_jpeg(px, 100))
    da = decode_jpeg(encode_jpeg(px, 100, arithmetic=True))
    assert np.array_equal(da[3], dh[3])


def test_arith_fuzz_roundtrip():
    rng = np.random.default_rng(2026)
    for _ in range(15):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        color = bool(rng.integers(0, 2))
        q = int(rng.integers(25, 101))
        prog = bool(rng.integers(0, 2))
        dri = 0 if prog else int(rng.integers(0, 4))
        px = _img(rng, h, w, color)
        dh = decode_jpeg(encode_jpeg(px, q, "444", dri))
        da = decode_jpeg(
            encode_jpeg(px, q, "444", dri, progressive=prog, arithmetic=True)
        )
        assert da is not None and np.array_equal(da[3], dh[3]), (h, w, q, prog, dri)


def test_arith_truncation_fault_tolerance():
    px = _img(np.random.default_rng(5), 32, 32, True)
    full = encode_jpeg(px, 75, arithmetic=True)
    for cut in (len(full) // 4, len(full) // 2, len(full) - 3):
        decode_jpeg(full[:cut])  # must not raise; None or partial-None


# ------------------------------------------------------------------ #
# Layer 3: libjpeg conformance (needs cc + libjpeg; skipped otherwise)


@pytest.fixture(scope="module")
def jpegref(tmp_path_factory):
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler for the libjpeg conformance harness")
    exe = tmp_path_factory.mktemp("jpegref") / "jpegref"
    r = subprocess.run(
        [cc, "-O2", "-o", str(exe), "tools/jpegref.c", "-ljpeg"],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip(f"libjpeg harness build failed: {r.stderr[:200]!r}")
    return str(exe)


def _ref_encode(exe, px, q, arith, prog, sub, dri):
    h, w = px.shape[:2]
    nc = 1 if px.ndim == 2 else px.shape[2]
    raw = struct.pack("<III", w, h, nc) + px.tobytes()
    return subprocess.run(
        [exe, "encode", str(q), str(arith), str(prog), str(sub), str(dri)],
        input=raw, capture_output=True, check=True,
    ).stdout


def _ref_decode(exe, jpg):
    r = subprocess.run([exe, "decode"], input=jpg, capture_output=True)
    if r.returncode != 0:
        return None
    w, h, nc = struct.unpack("<III", r.stdout[:12])
    return np.frombuffer(r.stdout[12:], np.uint8).reshape(h, w, nc)


@pytest.mark.parametrize(
    "h,w,color,q,sub,dri,prog",
    [
        (24, 16, True, 85, 1, 0, 0),
        (33, 17, True, 70, 2, 0, 0),
        (64, 48, True, 85, 1, 4, 0),
        (16, 16, False, 50, 1, 2, 0),
        (24, 16, True, 85, 1, 0, 1),
        (40, 40, True, 95, 2, 3, 1),
        (128, 96, True, 75, 2, 0, 1),
    ],
)
def test_decode_libjpeg_arith_streams(jpegref, h, w, color, q, sub, dri, prog):
    """Our decoder on libjpeg's arithmetic streams == our decoder on
    libjpeg's huffman streams of the same source (same coefficients →
    entropy stage isolated, IDCT differences cancelled)."""
    rng = np.random.default_rng(h + w + q)
    px = _img(rng, h, w, color)
    dh = decode_jpeg(_ref_encode(jpegref, px, q, 0, prog, sub, dri))
    da = decode_jpeg(_ref_encode(jpegref, px, q, 1, prog, sub, dri))
    assert dh is not None and da is not None
    assert np.array_equal(da[3], dh[3])


@pytest.mark.parametrize("prog", [0, 1])
def test_libjpeg_decodes_our_arith_streams(jpegref, prog):
    rng = np.random.default_rng(31 + prog)
    px = _img(rng, 48, 40, True)
    jh = encode_jpeg(px, 80)
    ja_ = encode_jpeg(px, 80, progressive=bool(prog), arithmetic=True)
    rh = _ref_decode(jpegref, jh)
    ra = _ref_decode(jpegref, ja_)
    assert rh is not None and ra is not None
    assert np.array_equal(ra, rh)


def test_libjpeg_cross_with_restarts(jpegref):
    rng = np.random.default_rng(55)
    px = _img(rng, 32, 64, True)
    jh = encode_jpeg(px, 70, "420", 2)
    ja_ = encode_jpeg(px, 70, "420", 2, arithmetic=True)
    rh = _ref_decode(jpegref, jh)
    ra = _ref_decode(jpegref, ja_)
    assert rh is not None and ra is not None and np.array_equal(ra, rh)


# ------------------------------------------------------------------ #
# 12-bit sample precision (extended/progressive frames only)


def _img12(rng, h, w, color):
    px = rng.integers(0, 4096, (h, w, 3) if color else (h, w), dtype=np.uint16)
    return (px // 2 + 1024).astype(np.uint16)


@pytest.mark.parametrize("prog,arith", [(0, 0), (1, 0), (0, 1), (1, 1)])
def test_12bit_roundtrip_all_entropy_modes(prog, arith):
    rng = np.random.default_rng(60 + prog * 2 + arith)
    px = _img12(rng, 24, 16, True)
    jpg = encode_jpeg(
        px, 85, progressive=bool(prog), arithmetic=bool(arith), precision=12
    )
    dec = decode_jpeg(jpg)
    assert dec is not None
    w, h, ch, out = dec
    assert (w, h, ch) == (16, 24, 3)
    assert out.dtype == np.uint16 and int(out.max()) <= 4095
    err = np.abs(out.astype(np.int64) - px.astype(np.int64)).max()
    assert err < 200  # q85 4:4:4 bound, 16x the 8-bit budget


def test_12bit_huffman_equals_arith_bit_exact():
    """Two independent entropy stages must carry identical coefficients
    — the cross-validation that substitutes for an external 12-bit
    reference decoder (this libjpeg build is 8-bit only)."""
    rng = np.random.default_rng(61)
    for _ in range(8):
        h = int(rng.integers(4, 40))
        w = int(rng.integers(4, 40))
        color = bool(rng.integers(0, 2))
        q = int(rng.integers(30, 101))
        prog = bool(rng.integers(0, 2))
        px = _img12(rng, h, w, color)
        dh = decode_jpeg(encode_jpeg(px, q, progressive=prog, precision=12))
        da = decode_jpeg(
            encode_jpeg(px, q, progressive=prog, arithmetic=True, precision=12)
        )
        assert dh is not None and da is not None
        assert np.array_equal(dh[3], da[3]), (h, w, q, prog)


def test_12bit_constant_and_extremes():
    for c in (0, 2048, 4095):
        px = np.full((16, 16), c, dtype=np.uint16)
        dec = decode_jpeg(encode_jpeg(px, 75, precision=12))
        assert dec is not None
        vals = set(np.unique(dec[3]))
        assert len(vals) == 1
        assert abs(next(iter(vals)) - c) <= 32  # quantized DC snap


def test_12bit_restarts_and_subsampling():
    rng = np.random.default_rng(62)
    px = _img12(rng, 33, 17, True)
    for kw in ({"restart_interval": 2}, {"subsampling": "420"},
               {"subsampling": "420", "restart_interval": 1, "arithmetic": True}):
        dec = decode_jpeg(encode_jpeg(px, 70, precision=12, **kw))
        assert dec is not None and dec[3].dtype == np.uint16, kw


def test_12bit_decode_image_presents_8bit_view():
    from hquery_php_spark.operators.multimodal import decode_image

    px = np.full((8, 8), 4095, dtype=np.uint16)
    jpg = encode_jpeg(px, 90, precision=12)
    dec = decode_image(jpg)
    assert dec is not None
    assert dec[3].dtype == np.uint8
    assert int(dec[3].max()) == 255


def test_12bit_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_jpeg(np.full((8, 8), 5000, dtype=np.uint16), precision=12)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8), dtype=np.uint8), precision=10)


def test_12bit_libjpeg8_rejects_gracefully(jpegref):
    """This container's libjpeg is an 8-bit build: it must REJECT our
    12-bit stream (errors, not garbage) — evidence the stream really
    declares 12-bit precision."""
    px = np.full((8, 8), 1000, dtype=np.uint16)
    jpg = encode_jpeg(px, 90, precision=12)
    assert _ref_decode(jpegref, jpg) is None
