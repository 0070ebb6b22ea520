"""Container-metadata walker tests (operators/mediameta.py): MP4 box
walk (version 0/1, largesize, brand variants), EBML walk (DocType,
TimestampScale, track/video fields), rejection boundaries, fuzz, and
the Spark video_meta_df dispatch incl. AVI."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hquery_php_spark.operators.mediameta import (
    encode_mp4_stub,
    encode_webm_stub,
    mp4_meta,
    webm_meta,
)
from hquery_php_spark.operators.multimodal import sniff_media_type


@pytest.mark.parametrize("version1", [False, True])
def test_mp4_walk(version1):
    p = encode_mp4_stub(5321, 640, 360, n_tracks=2, version1=version1)
    assert sniff_media_type(p) == "video/mp4"
    m = mp4_meta(p)
    assert m == {
        "brand": "isom", "timescale": 1000, "duration": 5321,
        "duration_ms": 5321, "n_tracks": 2, "width": 640, "height": 360,
        "codecs": "avc1,mp4a", "codec_tags": "avc1,mp4a",
        "coded_width": None, "coded_height": None,
    }


def test_mp4_largesize_box():
    p = bytearray(encode_mp4_stub(77, 32, 16))
    # rewrite the moov box as a 64-bit largesize box
    moov = p.index(b"moov") - 4
    (size,) = struct.unpack_from(">I", p, moov)
    body = bytes(p[moov + 8 : moov + size])
    rewritten = (
        struct.pack(">I", 1) + b"moov" + struct.pack(">Q", size + 8) + body
    )
    p2 = bytes(p[:moov]) + rewritten + bytes(p[moov + size :])
    m = mp4_meta(p2)
    assert m and m["duration_ms"] == 77 and m["width"] == 32


def test_mp4_brand_and_rejections():
    assert mp4_meta(encode_mp4_stub(9, 1, 1, brand=b"M4A "))["brand"] == "M4A "
    assert sniff_media_type(encode_mp4_stub(9, 1, 1, brand=b"M4A ")) == "audio/mp4"
    assert mp4_meta(b"eight by") is None
    assert mp4_meta(None) is None
    # ftyp but no moov → no timescale → None
    assert mp4_meta(struct.pack(">I", 16) + b"ftypisom\x00\x00\x02\x00") is None


def test_webm_walk_and_matroska():
    p = encode_webm_stub(1000000, 1920, 1080, n_tracks=2)
    assert sniff_media_type(p) == "video/webm"
    assert webm_meta(p) == {
        "doctype": "webm", "timestamp_scale": 1000000, "n_tracks": 2,
        "width": 1920, "height": 1080, "codecs": "V_VP8,A_OPUS",
        "codec_tags": "vp8,opus", "coded_width": None, "coded_height": None,
    }
    mk = encode_webm_stub(500, 10, 20, doctype=b"matroska")
    assert sniff_media_type(mk) == "video/x-matroska"
    assert webm_meta(mk)["doctype"] == "matroska"


def test_webm_rejections():
    assert webm_meta(None) is None
    assert webm_meta(b"") is None
    assert webm_meta(b"\x1aE\xdf\xa3") is None  # header with no DocType
    assert webm_meta(b"RIFF1234AVI ") is None


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=200))
def test_fuzz_walkers_never_raise(b):
    mp4_meta(b)
    mp4_meta(struct.pack(">I", len(b) + 8) + b"ftyp" + b)
    webm_meta(b)
    webm_meta(b"\x1aE\xdf\xa3" + b)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_fuzz_truncation_corruption(data):
    p = encode_mp4_stub(123, 48, 32, n_tracks=2)
    k = encode_webm_stub(999, 7, 9)
    for payload, walker in ((p, mp4_meta), (k, webm_meta)):
        cut = data.draw(st.integers(0, len(payload)))
        walker(payload[:cut])
        pos = data.draw(st.integers(0, len(payload) - 1))
        bb = bytearray(payload)
        bb[pos] ^= data.draw(st.integers(1, 255))
        walker(bytes(bb))


@pytest.fixture(scope="module")
def spark():
    pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("hquery-mediameta-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_video_meta_df_dispatch(spark):
    from hquery_php_spark.operators.avi import encode_avi
    from hquery_php_spark.operators.multimodal import video_meta_df

    avi = encode_avi([np.zeros((4, 6, 3), np.uint8)] * 3, fps=10)
    rows = [
        ("m1", bytearray(encode_mp4_stub(4000, 320, 240))),
        ("k1", bytearray(encode_webm_stub(250000, 64, 48, n_tracks=2))),
        ("x1", bytearray(avi)),
        ("j1", bytearray(b"\xff\xd8\xff junk")),
        ("n1", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r.media_id: r for r in video_meta_df(df).collect()}
    m = got["m1"]
    assert (m.width, m.height, m.duration_ms, m.timescale, m.n_tracks) == (
        320, 240, 4000, 1000, 1,
    )
    k = got["k1"]
    assert (k.width, k.height, k.timescale, k.n_tracks) == (64, 48, 250000, 2)
    assert k.duration_ms is None  # honest NULL: stub carries no Duration
    x = got["x1"]
    assert (x.width, x.height, x.n_tracks, x.duration_ms) == (6, 4, 1, 300)
    assert got["j1"].mime == "image/jpeg" and got["j1"].width is None
    assert got["n1"].mime is None


def test_media_pipeline_resume_cycle(spark, tmp_path):
    """Idempotent resume over the MEDIA leg (north rule): a killed
    codec job's committed per-media output is skipped on re-run and the
    union equals a clean full run — same anti-join + append machinery
    as the span pipeline, keyed on media_id."""
    from pyspark.sql import functions as F

    from hquery_php_spark.operators.multimodal import (
        encode_png,
        image_pixel_stats_df,
    )
    from hquery_php_spark.operators.pipeline import resume_filter

    out_dir = str(tmp_path / "media_out")
    rows = [
        (f"p{i}", bytearray(encode_png(np.full((3, 4), i % 256, np.uint8))))
        for i in range(40)
    ]
    media = spark.createDataFrame(rows, "media_id string, payload binary")
    full = image_pixel_stats_df(media).toPandas()

    # "first run dies" after committing half the payloads
    part1 = media.where(F.substring("media_id", 2, 10).cast("int") % 2 == 0)
    image_pixel_stats_df(part1).write.mode("overwrite").parquet(out_dir)
    committed = spark.read.parquet(out_dir)
    assert 0 < committed.count() < len(full)

    todo = resume_filter(media, committed.select("media_id"), "media_id")
    image_pixel_stats_df(todo).write.mode("append").parquet(out_dir)

    final = spark.read.parquet(out_dir).toPandas()
    assert len(final) == len(full)
    a = full.sort_values("media_id").reset_index(drop=True)
    b = final.sort_values("media_id").reset_index(drop=True)
    assert (a["sum_r"] == b["sum_r"]).all()

    # resuming again is a no-op
    assert resume_filter(
        media, spark.read.parquet(out_dir).select("media_id"), "media_id"
    ).count() == 0


# ------------------------------------------------------------------ #
# Ogg (Opus / Vorbis identification headers)


def test_ogg_walk_opus_and_vorbis():
    from hquery_php_spark.operators.mediameta import encode_ogg_stub, ogg_meta

    p = encode_ogg_stub("opus", 2, 48000, n_pages=3, last_granule=96000)
    assert sniff_media_type(p) == "audio/ogg"
    assert ogg_meta(p) == {
        "codec": "opus", "channels": 2, "sample_rate": 48000,
        "n_pages": 3, "n_streams": 1, "last_granule": 96000,
    }
    v = ogg_meta(encode_ogg_stub("vorbis", 6, 44100, n_pages=2,
                                 last_granule=12345))
    assert (v["codec"], v["channels"], v["sample_rate"]) == ("vorbis", 6, 44100)
    assert v["last_granule"] == 12345


def test_ogg_crc_catches_corruption():
    from hquery_php_spark.operators.mediameta import encode_ogg_stub, ogg_meta

    p = bytearray(encode_ogg_stub("opus", 1, 16000))
    p[40] ^= 0x01
    assert ogg_meta(bytes(p)) is None
    assert ogg_meta(bytes(p), verify_crc=False) is not None  # walk still works


def test_ogg_multi_stream_and_rejections():
    from hquery_php_spark.operators.mediameta import (
        _ogg_page,
        encode_ogg_stub,
        ogg_meta,
    )

    two = encode_ogg_stub("opus", 1, 8000, serial=1) + encode_ogg_stub(
        "vorbis", 2, 22050, serial=2
    )
    m = ogg_meta(two)
    assert m["n_streams"] == 2 and m["n_pages"] == 4
    assert ogg_meta(b"OggS") is None
    assert ogg_meta(b"") is None
    assert ogg_meta(None) is None
    # a >255-byte packet spans multiple segments — the lacing walk holds
    big = _ogg_page(9, 0, 0, 0x02, b"OpusHead" + bytes([1, 3]) + b"\x00" * 600)
    mb = ogg_meta(big)
    assert mb and mb["channels"] == 3


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=200))
def test_ogg_fuzz_never_raises(b):
    from hquery_php_spark.operators.mediameta import ogg_meta

    ogg_meta(b)
    ogg_meta(b"OggS\x00\x02" + b)


def test_audio_container_meta_df(spark):
    from hquery_php_spark.operators.mediameta import encode_ogg_stub
    from hquery_php_spark.operators.multimodal import audio_container_meta_df

    rows = [
        ("o1", bytearray(encode_ogg_stub("opus", 2, 48000, n_pages=2,
                                         last_granule=4800))),
        ("f1", bytearray(b"fLaC not really")),
        ("n1", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r.media_id: r for r in audio_container_meta_df(df).collect()}
    o = got["o1"]
    assert (o.codec, o.channels, o.sample_rate, o.n_pages, o.last_granule) == (
        "opus", 2, 48000, 2, 4800,
    )
    assert got["f1"].mime == "audio/flac" and got["f1"].codec is None
    assert got["n1"].mime is None


def test_mp4_codec_inventory():
    """stsd sample-entry fourccs, per track, in track order — incl. a
    hand-built vp09+Opus layout (the codecs our decoder does NOT have,
    exactly what the pre-decode filter must surface)."""
    from hquery_php_spark.operators.mediameta import _box

    def trak(fourcc):
        tk = (b"\x00\x00\x00\x07" + struct.pack(">III", 0, 0, 1)
              + b"\x00" * 4 + struct.pack(">I", 5) + b"\x00" * 52
              + struct.pack(">II", 0, 0))
        entry = struct.pack(">I", 16) + fourcc + b"\x00" * 8
        stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
        mdia = _box(b"mdia", _box(b"minf", _box(b"stbl", stsd)))
        return _box(b"trak", _box(b"tkhd", tk) + mdia)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp42")
    mvhd = _box(b"mvhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, 1000, 5)
                + b"\x00" * 80)
    p = ftyp + _box(b"moov", mvhd + trak(b"vp09") + trak(b"Opus"))
    assert mp4_meta(p)["codecs"] == "vp09,Opus"
    # a trak with no stsd contributes nothing (no placeholder)
    p2 = ftyp + _box(b"moov", mvhd + _box(b"trak", b"") + trak(b"mp4a"))
    assert mp4_meta(p2)["codecs"] == "mp4a"


def test_webm_codec_inventory_from_real_muxer():
    from hquery_php_spark.operators.mediameta import encode_webm_vp8

    # muxed stream (no frames needed for the Tracks walk)
    assert webm_meta(encode_webm_vp8(16, 8, []))["codecs"] == "V_VP8"


def test_avi_codec_inventory():
    import numpy as np
    from hquery_php_spark.operators.avi import (
        avi_codecs,
        encode_avi,
        encode_avi_mjpeg,
    )

    fr = [np.zeros((3, 4, 3), np.uint8)]
    assert avi_codecs(encode_avi(fr)) == "DIB"
    assert avi_codecs(
        encode_avi(fr, audio=np.zeros(40, np.int64))
    ) == "DIB,pcm"
    assert avi_codecs(
        encode_avi(fr, audio=np.zeros(40, np.uint8), audio_fmt="alaw")
    ) == "DIB,alaw"
    assert avi_codecs(
        encode_avi(fr, audio=np.zeros(40, np.int64), audio_fmt="adpcm")
    ) == "DIB,ima-adpcm"
    assert avi_codecs(encode_avi_mjpeg([np.zeros((8, 8), np.uint8)])) == "MJPG"
    assert avi_codecs(b"not avi") is None


def test_video_meta_df_codecs_column(spark):
    import numpy as np
    from hquery_php_spark.operators.avi import encode_avi
    from hquery_php_spark.operators.multimodal import video_meta_df

    rows = [
        ("m", bytearray(encode_mp4_stub(1000, 64, 32, n_tracks=2))),
        ("k", bytearray(encode_webm_stub(1000000, 32, 16, n_tracks=2))),
        ("x", bytearray(encode_avi(
            [np.zeros((3, 4, 3), np.uint8)],
            audio=np.zeros(16, np.int64),
        ))),
        ("j", bytearray(b"\xff\xd8\xffjunk")),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r for r in video_meta_df(df).collect()}
    assert got["m"]["codecs"] == "avc1,mp4a"
    assert got["k"]["codecs"] == "V_VP8,A_OPUS"
    assert got["x"]["codecs"] == "DIB,pcm"
    assert got["x"]["n_tracks"] == 2
    assert got["j"]["codecs"] is None
