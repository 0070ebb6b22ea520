"""WAV/PCM codec tests (operators/wav.py): round trips at every bit
depth, RIFF chunk-walk robustness, truncated tails, and the Spark
audio_pcm_stats_df leg (exact integer statistics, honest NULLs for
non-WAV payloads).

Reference parity note: the reference engine (duzun/hQuery.php) sniffs
content types before parsing (hQuery.php:136-226) but has no audio
codec — this is beyond-reference multimodal surface under the same
fault-tolerance doctrine (decode what you can, NULL what you cannot).
"""

import struct

import numpy as np
import pytest

from hquery_php_spark.operators.wav import decode_wav, encode_wav, wav_meta
from hquery_php_spark.operators.multimodal import sniff_media_type


@pytest.fixture(scope="module")
def spark():
    pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("hquery-wav-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("ch", [1, 2, 3])
def test_roundtrip_exact(bits, ch):
    rng = np.random.RandomState(bits * 10 + ch)
    lo, hi = (-128, 127) if bits == 8 else (-(1 << (bits - 1)), (1 << (bits - 1)) - 1)
    s = rng.randint(lo, hi + 1, size=(97, ch)).astype(np.int64)
    rate, dec = decode_wav(encode_wav(s, 44100, bits))
    assert rate == 44100
    assert dec.shape == (97, ch)
    assert (dec == s).all()


def test_mono_1d_input_and_meta():
    s = np.arange(-16, 17)
    p = encode_wav(s, 8000, 16)
    assert sniff_media_type(p) == "audio/wav"
    assert wav_meta(p) == (8000, 1, None, 33)
    _, dec = decode_wav(p)
    assert (dec[:, 0] == s).all()


def test_odd_byte_body_is_word_padded():
    # 33 8-bit mono samples → odd data chunk; RIFF pads to word boundary
    p = encode_wav(np.zeros(33, np.int64), 8000, 8)
    assert len(p) % 2 == 0
    _, dec = decode_wav(p)
    assert dec.shape == (33, 1)


def test_extra_chunks_are_skipped():
    s = np.array([[5, -5], [100, -100]], np.int64)
    p = bytearray(encode_wav(s, 16000, 16))
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    p2 = bytes(p[:fmt_end]) + extra + bytes(p[fmt_end:])
    p2 = b"RIFF" + struct.pack("<I", len(p2) - 8) + p2[8:]
    rate, dec = decode_wav(p2)
    assert rate == 16000 and (dec == s).all()


def test_truncated_tail_frame_dropped():
    s = np.arange(10)[:, None].astype(np.int64)
    p = encode_wav(s, 8000, 16)
    rate, dec = decode_wav(p[:-1])  # half a sample missing
    assert dec.shape == (9, 1)
    assert (dec[:, 0] == np.arange(9)).all()


def test_rejections():
    assert decode_wav(None) is None
    assert decode_wav(b"") is None
    assert decode_wav(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks
    assert decode_wav(b"\x89PNG\r\n\x1a\nrest") is None
    # non-PCM format tag (3 = IEEE float) rejected, not crashed
    p = bytearray(encode_wav(np.zeros(4, np.int64), 8000, 16))
    p[20] = 3
    assert decode_wav(bytes(p)) is None
    # unsupported bit depth
    p = bytearray(encode_wav(np.zeros(4, np.int64), 8000, 16))
    p[34] = 12
    assert decode_wav(bytes(p)) is None


def test_24bit_sign_extension_boundaries():
    s = np.array([[-(1 << 23)], [(1 << 23) - 1], [-1], [0], [1]], np.int64)
    _, dec = decode_wav(encode_wav(s, 8000, 24))
    assert (dec == s).all()


def test_audio_pcm_stats_df_exact_and_null(spark):
    from hquery_php_spark.operators.multimodal import audio_pcm_stats_df

    s = np.array([[10, -20], [30, -40], [-50, 60]], np.int64)
    rows = [
        ("w1", bytearray(encode_wav(s, 22050, 16))),
        ("junk", bytearray(b"OggSnot-really-audio")),
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r.media_id: r for r in audio_pcm_stats_df(df).collect()}
    r = got["w1"]
    assert (r.sample_rate, r.n_channels, r.n_samples) == (22050, 2, 3)
    assert r.sum_val == int(s.sum())
    assert r.sum_abs == int(np.abs(s).sum())
    assert r.sum_sq == int((s * s).sum())
    assert r.peak == 60
    assert got["junk"].mime == "audio/ogg"
    assert got["junk"].sum_val is None  # honest NULL, no codec lib
    assert got["none"].mime is None
