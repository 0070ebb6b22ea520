"""AVI demuxer tests (operators/avi.py): RIFF walk, uncompressed-DIB
frame decode (bottom-up BGR(A), 4-byte row alignment), header parse,
compressed-chunk skip, rejection boundaries, and the Spark
video_frame_sample_df AVI branch."""

import struct

import numpy as np
import pytest

from hquery_php_spark.operators.avi import avi_dims, decode_avi_frames, encode_avi
from hquery_php_spark.operators.multimodal import sniff_media_type


def test_roundtrip_rgb_odd_width_padding():
    rng = np.random.RandomState(1)
    frs = [rng.randint(0, 256, size=(5, 7, 3)).astype(np.uint8) for _ in range(4)]
    avi = encode_avi(frs, fps=10)
    assert sniff_media_type(avi) == "video/x-msvideo"
    assert avi_dims(avi) == (7, 5, 4, 100000)
    out = decode_avi_frames(avi)
    assert [f for f, _ in out] == [0, 1, 2, 3]
    for (_, px), f in zip(out, frs):
        assert np.array_equal(px, f)


def test_roundtrip_rgba_32bit():
    rng = np.random.RandomState(2)
    frs = [rng.randint(0, 256, size=(3, 4, 4)).astype(np.uint8) for _ in range(2)]
    out = decode_avi_frames(encode_avi(frs))
    assert all(np.array_equal(px, f) for (_, px), f in zip(out, frs))


def test_bottom_up_and_bgr_are_undone():
    # a frame with a single red pixel at the top-left: in the FILE it
    # must be stored as the LAST row, blue-first
    fr = np.zeros((2, 2, 3), np.uint8)
    fr[0, 0] = [200, 10, 30]
    avi = encode_avi([fr])
    movi = avi.index(b"00db")
    body = avi[movi + 8 :]
    stride = 8  # 2 px * 3 B = 6, padded to 8
    last_row = body[stride : stride + 6]
    assert last_row[:3] == bytes([30, 10, 200])  # BGR of the red pixel
    (_, px), = decode_avi_frames(avi)
    assert np.array_equal(px, fr)


def test_compressed_chunks_skipped_and_max_frames():
    frs = [np.full((2, 2, 3), c, np.uint8) for c in (1, 2, 3)]
    avi = bytearray(encode_avi(frs))
    # relabel the middle frame compressed ('00dc'): the demuxer skips it
    first = avi.index(b"00db")
    second = avi.index(b"00db", first + 4)
    avi[second : second + 4] = b"00dc"
    out = decode_avi_frames(bytes(avi))
    assert len(out) == 2
    assert out[0][1][0, 0, 0] == 1 and out[1][1][0, 0, 0] == 3
    assert len(decode_avi_frames(encode_avi(frs), max_frames=2)) == 2


def test_rejections():
    assert decode_avi_frames(None) is None
    assert decode_avi_frames(b"") is None
    assert decode_avi_frames(b"RIFFxxxxWAVE") is None
    assert decode_avi_frames(b"RIFF\x04\x00\x00\x00AVI ") is None
    assert avi_dims(b"OggS") is None
    # 8-bit palettized DIB is out of scope: header parses, frames do not
    avi = bytearray(encode_avi([np.zeros((2, 2, 3), np.uint8)]))
    strf = avi.index(b"strf")
    struct.pack_into("<H", avi, strf + 8 + 14, 8)
    assert decode_avi_frames(bytes(avi)) is None


@pytest.fixture(scope="module")
def spark():
    pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("hquery-avi-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_video_frame_sample_avi_branch(spark):
    from hquery_php_spark.operators.multimodal import (
        decode_png,
        video_frame_sample_df,
    )

    frs = [np.full((3, 5, 3), 10 * (f + 1), np.uint8) for f in range(5)]
    rows = [("v1", bytearray(encode_avi(frs)))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = video_frame_sample_df(df, every_n=2, max_frames=8).collect()
    # source frames 0, 2, 4 sampled; each re-encoded as a real PNG
    assert [r.frame_no for r in got] == [0, 2, 4]
    assert all(r.mime == "video/x-msvideo" for r in got)
    for r, want in zip(got, (10, 30, 50)):
        w, h, ch, px = decode_png(bytes(r.frame))
        assert (w, h) == (5, 3)
        assert (px[:, :, 0] == want).all()


# ------------------------------------------------------------------ #
# MJPEG-in-AVI ('00dc' + MJPG fourcc, in-repo T.81 JPEG codec)


def test_mjpeg_roundtrip_matches_direct_jpeg_decode():
    from hquery_php_spark.operators.avi import encode_avi_mjpeg
    from hquery_php_spark.operators.jpeg import decode_jpeg, encode_jpeg

    frames = [np.full((16, 24), 64 + 16 * f, np.uint8) for f in range(4)]
    avi = encode_avi_mjpeg(frames, quality=75)
    assert avi_dims(avi) == (24, 16, 4, 40000)
    out = decode_avi_frames(avi)
    assert [n for n, _ in out] == [0, 1, 2, 3]
    for n, px in out:
        _w, _h, _ch, want = decode_jpeg(encode_jpeg(frames[n], quality=75))
        assert np.array_equal(px[:, :, :1], want)
        assert np.array_equal(px[:, :, 1], px[:, :, 0])  # gray broadcast


def test_mjpeg_missing_dht_gets_annex_k_defaults():
    """Capture-hardware MJPEG omits the Huffman tables; decoders must
    assume the Annex K defaults (OpenDML).  A table-less stream must
    decode bit-identically to its table-carrying twin."""
    from hquery_php_spark.operators.avi import encode_avi_mjpeg

    frames = [np.full((8, 8), 10 + 30 * f, np.uint8) for f in range(3)]
    with_t = decode_avi_frames(encode_avi_mjpeg(frames, quality=90))
    without = decode_avi_frames(encode_avi_mjpeg(frames, quality=90,
                                                 omit_dht=True))
    assert len(with_t) == len(without) == 3
    for (na, a), (nb, b) in zip(with_t, without):
        assert na == nb and np.array_equal(a, b)
    # and the stripped stream really is table-less
    avi = encode_avi_mjpeg(frames, quality=90, omit_dht=True)
    movi = avi.index(b"00dc")
    assert b"\xff\xc4" not in avi[movi : movi + 200]


def test_mjpeg_rgb_frames_and_corrupt_frame_skipped():
    from hquery_php_spark.operators.avi import encode_avi_mjpeg

    frames = [np.full((16, 16, 3), (200, 100, 50), np.uint8)
              for _ in range(3)]
    avi = bytearray(encode_avi_mjpeg(frames, quality=90))
    # zero out the middle frame's SOI: undecodable, skipped, numbering kept
    first = avi.index(b"00dc")
    second = avi.index(b"00dc", first + 4)
    avi[second + 8 : second + 10] = b"\x00\x00"
    out = decode_avi_frames(bytes(avi))
    assert [n for n, _ in out] == [0, 2]
    for _n, px in out:
        assert px.shape == (16, 16, 3)
        assert tuple(px[0, 0]) == (200, 100, 50)


def test_mjpeg_max_frames_and_source_numbering():
    from hquery_php_spark.operators.avi import encode_avi_mjpeg

    frames = [np.full((8, 8), 20 * f, np.uint8) for f in range(5)]
    avi = encode_avi_mjpeg(frames, quality=90)
    out = decode_avi_frames(avi, max_frames=2)
    assert [n for n, _ in out] == [0, 1]


def test_video_frame_sample_mjpeg_branch(spark):
    from hquery_php_spark.operators.avi import encode_avi_mjpeg
    from hquery_php_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from hquery_php_spark.operators.multimodal import (
        decode_png,
        video_frame_sample_df,
    )

    frames = [np.full((16, 8), 32 * f, np.uint8) for f in range(5)]
    rows = [("mj1", bytearray(encode_avi_mjpeg(frames, quality=75)))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = video_frame_sample_df(df, every_n=2, max_frames=8).collect()
    assert [r.frame_no for r in got] == [0, 2, 4]
    assert all(r.mime == "video/x-msvideo" for r in got)
    for r in got:
        w, h, _ch, px = decode_png(bytes(r.frame))
        assert (w, h) == (8, 16)
        _w, _h, _c, want = decode_jpeg(
            encode_jpeg(frames[r.frame_no], quality=75)
        )
        assert np.array_equal(px[:, :, 0], want[:, :, 0])


def test_mjpeg_sampling_stride_pushed_into_the_demux(monkeypatch):
    import hquery_php_spark.operators.avi as avimod
    from hquery_php_spark.operators.avi import encode_avi_mjpeg
    from hquery_php_spark.operators import jpeg as jpegmod

    frames = [np.full((8, 8), 20 * f, np.uint8) for f in range(6)]
    avi = encode_avi_mjpeg(frames, quality=90)
    calls = []
    orig = jpegmod.decode_jpeg
    monkeypatch.setattr(jpegmod, "decode_jpeg",
                        lambda d: calls.append(1) or orig(d))
    out = decode_avi_frames(avi, max_frames=8, every_n=2)
    assert [n for n, _ in out] == [0, 2, 4]
    assert len(calls) == 3  # dropped source frames never hit the codec


# ------------------------------------------------------------ audio track

def _frames(n=3):
    return [np.full((4, 5, 3), 10 * (i + 1), np.uint8) for i in range(n)]


def test_avi_audio_pcm16_roundtrip_and_video_unclobbered():
    """The auds strf (WAVEFORMATEX) must not clobber the vids strf
    (BITMAPINFOHEADER) — stream-type-aware hdrl walk."""
    from hquery_php_spark.operators.avi import decode_avi_audio

    x = (np.arange(500, dtype=np.int64)[:, None] * np.array([13, -7])) % 20001 - 10000
    w = encode_avi(_frames(), audio=x, audio_rate=16000, audio_fmt="pcm16")
    rate, s = decode_avi_audio(w)
    assert rate == 16000 and (s == x).all()
    assert avi_dims(w)[:2] == (5, 4)
    fs = decode_avi_frames(w)
    assert [f for f, _ in fs] == [0, 1, 2] and (fs[1][1] == 20).all()


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_avi_audio_g711(law):
    from hquery_php_spark.operators.avi import decode_avi_audio
    from hquery_php_spark.operators.wav import alaw_to_linear, ulaw_to_linear

    codes = (np.arange(300) * 29 % 256).astype(np.uint8)
    w = encode_avi(_frames(), audio=codes, audio_rate=8000, audio_fmt=law)
    rate, s = decode_avi_audio(w)
    tab = ulaw_to_linear if law == "ulaw" else alaw_to_linear
    assert rate == 8000 and (s[:, 0] == tab(codes)).all()


def test_avi_audio_adpcm_matches_wav_path():
    """Same IMA blocks, different container: the AVI demux must land on
    byte-identical reconstruction as the WAV walk (the AVI side has no
    fact chunk, so it keeps the final block's padding samples)."""
    from hquery_php_spark.operators.avi import decode_avi_audio
    from hquery_php_spark.operators.wav import decode_wav, encode_wav_adpcm

    sig = (3000 * np.sin(np.arange(2000) / 40.0)).astype(np.int64)
    _, sa = decode_avi_audio(
        encode_avi(_frames(), audio=sig, audio_rate=11025, audio_fmt="adpcm")
    )
    _, sw = decode_wav(encode_wav_adpcm(sig, 11025, 505))
    assert (sa[: len(sw)] == sw).all()


def test_avi_audio_none_paths():
    from hquery_php_spark.operators.avi import decode_avi_audio

    assert decode_avi_audio(encode_avi(_frames())) is None  # no audio
    assert decode_avi_audio(None) is None
    assert decode_avi_audio(b"RIFF\x00\x00\x00\x00AVI ") is None
    # unsupported tag (MP3 = 0x55) → honest None
    w = bytearray(encode_avi(_frames(), audio=np.zeros(50, np.int64)))
    off = w.find(b"auds")
    # strf body follows 'strf'+size after the 64-byte strh; find tag 1
    sf = w.find(b"strf", off)
    assert struct.unpack_from("<H", w, sf + 8)[0] == 1
    struct.pack_into("<H", w, sf + 8, 0x55)
    assert decode_avi_audio(bytes(w)) is None


def test_avi_audio_chunks_are_interleaved():
    """The writer splits audio into per-frame '01wb' chunks on block
    boundaries (the interleave real muxers produce), and the demux
    reassembles them in order."""
    from hquery_php_spark.operators.avi import decode_avi_audio

    x = np.arange(999, dtype=np.int64)[:, None] % 500 - 250
    w = encode_avi(_frames(5), audio=x, audio_rate=8000)
    assert w.count(b"01wb") >= 2
    _, s = decode_avi_audio(w)
    assert (s == x).all()


def test_audio_pcm_stats_df_avi_branch(spark):
    from hquery_php_spark.operators.multimodal import audio_pcm_stats_df

    x = np.array([5, -3, 7, 0], np.int64)[:, None]
    rows = [
        ("avi", bytearray(encode_avi(_frames(), audio=x, audio_rate=12000))),
        ("not", bytearray(b"OggS garbage")),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r for r in audio_pcm_stats_df(df).collect()}
    a = got["avi"]
    assert a["mime"] == "video/x-msvideo"
    assert (a["sample_rate"], a["n_channels"], a["n_samples"]) == (12000, 1, 4)
    assert (a["sum_val"], a["sum_abs"], a["sum_sq"], a["peak"]) == (9, 15, 83, 7)
    assert got["not"]["sum_val"] is None
