"""MPEG transport-stream walker (operators/mpegts.py): PSI tables with
real CRC-32/MPEG-2 verification, PCR-span duration, H.264 SPS
extraction from the PES payload, ADTS headers, sync-loss resync, and
never-raise fuzz."""

import struct

import pytest

from hquery_php_spark.operators import mpegts as ts
from hquery_php_spark.operators.multimodal import sniff_media_type


def test_crc32_mpeg2_golden_and_residual():
    # classic check value for CRC-32/MPEG-2 ("123456789")
    assert ts.crc32_mpeg2(b"123456789") == 0x0376E6E7
    d = b"arbitrary section body"
    assert ts.crc32_mpeg2(d + struct.pack(">I", ts.crc32_mpeg2(d))) == 0


def test_annexb_segmentation():
    es = (
        b"\x00\x00\x00\x01\x67\xAA"  # SPS, 4-byte start code
        + b"\x00\x00\x01\x68\xBB"  # PPS, 3-byte start code
        + b"\x00\x00\x01\x65\xCC\xDD"
    )
    units = list(ts.annexb_nal_units(es))
    assert [u[0] & 0x1F for u in units] == [7, 8, 5]
    assert units[0][1] == b"\x67\xAA"
    assert units[2][1] == b"\x65\xCC\xDD"
    assert list(ts.annexb_nal_units(b"no start codes here")) == []


@pytest.mark.parametrize("rate", (96000, 44100, 8000))
@pytest.mark.parametrize("ch", (1, 2, 6))
def test_adts_round_trip(rate, ch):
    m = ts.parse_adts_header(ts.build_adts_frame(2, rate, ch))
    assert (m["aot"], m["sample_rate"], m["channels"]) == (2, rate, ch)
    assert ts.parse_adts_header(b"\xff\xe0\x00\x00\x00\x00\x00") is None
    assert ts.parse_adts_header(b"") is None


def test_ts_stub_full_walk():
    p = ts.encode_ts_stub(4321, 1280, 720, avc_profile=100, avc_level=31)
    assert len(p) % ts.TS_PACKET == 0
    assert sniff_media_type(p) == "video/mp2t"
    m = ts.ts_meta(p)
    assert m["streams"] == "h264,aac"
    assert m["codec_tags"] == "avc1.64001F,mp4a.40.2"
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["duration_ms"] == 4321
    assert m["n_programs"] == 1 and m["n_pids"] == 4


def test_ts_audio_variants():
    m = ts.ts_meta(ts.encode_ts_stub(100, 322, 242, audio="mp3"))
    assert m["streams"] == "h264,mp3" and m["codec_tags"].endswith(",mp3")
    m = ts.ts_meta(ts.encode_ts_stub(100, 64, 48, audio=None))
    assert m["streams"] == "h264" and m["codec_tags"].startswith("avc1.")


def test_ts_resync_after_garbage():
    """Dropping half a packet must not kill the walk: the scanner
    resynchronizes on the next 0x47 lattice point."""
    p = ts.encode_ts_stub(777, 640, 480)
    cut = p[: 2 * 188] + p[2 * 188 + 77 :]  # lose sync mid-stream
    m = ts.ts_meta(cut)
    assert m is not None and m["n_programs"] == 1
    # PAT/PMT live in the first two packets: inventory survives
    assert m["streams"] == "h264,aac"


def test_ts_corrupt_crc_drops_table():
    p = bytearray(ts.encode_ts_stub(777, 640, 480))
    # flip a byte inside the PMT section body (packet 2, after header)
    p[188 + 20] ^= 0xFF
    m = ts.ts_meta(bytes(p))
    # PAT still parses; the PMT fails its CRC so no streams are claimed
    assert m is None or not m["streams"]


def test_ts_rejections_and_fuzz():
    import random

    assert ts.ts_meta(None) is None
    assert ts.ts_meta(b"") is None
    assert ts.ts_meta(b"\x47" + b"\x00" * 187) is None  # single packet
    assert ts.ts_meta(b"G" + b"x" * 400) is None  # no lattice sync
    rng = random.Random(42)
    base = ts.encode_ts_stub(5000, 320, 240)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 10)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        ts.ts_meta(bytes(b))  # never raises
    for cut in range(0, len(base), 37):
        ts.ts_meta(base[:cut])


@pytest.fixture(scope="module")
def spark():
    pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("hquery-mpegts-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_video_meta_df_dispatch(spark):
    from hquery_php_spark.operators.multimodal import video_meta_df

    p = ts.encode_ts_stub(4321, 1280, 720, avc_profile=100, avc_level=31)
    df = spark.createDataFrame(
        [("seg", bytearray(p))], "media_id string, payload binary"
    )
    r = video_meta_df(df).collect()[0]
    assert r["mime"] == "video/mp2t"
    assert (r["width"], r["height"]) == (1280, 720)
    assert (r["coded_width"], r["coded_height"]) == (1280, 720)
    assert r["n_tracks"] == 2 and r["timescale"] == 90000
    assert r["duration_ms"] == 4321
    assert r["codecs"] == "h264,aac"
    assert r["codec_tags"] == "avc1.64001F,mp4a.40.2"


# ------------------------------------------------- HLS playlists


MASTER = (
    "#EXTM3U\n#EXT-X-VERSION:6\n"
    '#EXT-X-STREAM-INF:BANDWIDTH=2000000,RESOLUTION=1280x720,'
    'CODECS="avc1.64001F,mp4a.40.2"\n'
    "v720/index.m3u8\n"
    '#EXT-X-STREAM-INF:BANDWIDTH=800000,RESOLUTION=640x360,'
    'CODECS="avc1.42001E,mp4a.40.2"\n'
    "v360/index.m3u8\n"
)


def test_m3u8_master():
    m = ts.parse_m3u8(MASTER)
    assert m["kind"] == "master" and m["version"] == 6
    assert len(m["variants"]) == 2
    v = m["variants"][0]
    assert v["bandwidth"] == 2000000
    assert (v["width"], v["height"]) == (1280, 720)
    assert v["codecs"] == "avc1.64001F,mp4a.40.2"
    assert v["uri"] == "v720/index.m3u8"


def test_m3u8_media_and_rejects():
    media = (
        "#EXTM3U\n#EXT-X-TARGETDURATION:6\n"
        "#EXTINF:5.005,\nseg0.ts\n#EXTINF:4.796,\nseg1.ts\n"
        "#EXT-X-ENDLIST\n"
    )
    m = ts.parse_m3u8(media)
    assert m["kind"] == "media" and m["ended"]
    assert [s["uri"] for s in m["segments"]] == ["seg0.ts", "seg1.ts"]
    assert m["total_duration_ms"] == 9801
    assert m["target_duration_ms"] == 6000
    assert ts.parse_m3u8("not a playlist") is None
    assert ts.parse_m3u8(None) is None
    assert ts.parse_m3u8(b"#EXTM3U\n#EXTINF:bogus,\nx.ts\n")["segments"]


def test_m3u8_quoted_commas_and_bytes_input():
    m = ts.parse_m3u8(MASTER.encode())
    assert m["variants"][0]["codecs"] == "avc1.64001F,mp4a.40.2"


def test_hls_declared_vs_coded():
    seg = ts.encode_ts_stub(5005, 1280, 720, avc_profile=100, avc_level=31)
    r = ts.hls_declared_vs_coded(MASTER, seg)
    assert r["codecs_match"] is True and r["res_match"] is True
    # a segment that does not match what the manifest declared
    bad = ts.hls_declared_vs_coded(MASTER, ts.encode_ts_stub(5005, 640, 360))
    assert bad["codecs_match"] is False and bad["res_match"] is False
    assert ts.hls_declared_vs_coded("junk", seg) is None


# ------------------------------------------------- DASH MPD


MPD = """<?xml version="1.0"?>
<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" type="static"
     mediaPresentationDuration="PT1H2M3.5S">
 <Period>
  <AdaptationSet mimeType="video/mp4">
   <Representation id="v720" bandwidth="2000000" codecs="avc1.64001F"
                   width="1280" height="720">
    <BaseURL>v720.mp4</BaseURL>
   </Representation>
   <Representation id="v360" bandwidth="800000" codecs="avc1.42001E"
                   width="640" height="360"/>
  </AdaptationSet>
  <AdaptationSet mimeType="audio/mp4" codecs="mp4a.40.2">
   <Representation id="a1" bandwidth="128000" audioSamplingRate="44100"/>
  </AdaptationSet>
 </Period>
</MPD>"""


def test_mpd_parse_through_hquery_engine():
    m = ts.parse_mpd(MPD)
    assert m["kind"] == "dash" and m["dynamic"] is False
    assert m["total_duration_ms"] == 3723500  # PT1H2M3.5S
    assert len(m["variants"]) == 3
    v = m["variants"][0]
    assert (v["bandwidth"], v["width"], v["height"]) == (2000000, 1280, 720)
    assert v["codecs"] == "avc1.64001F" and v["uri"] == "v720.mp4"
    # Representation inherits codecs from its AdaptationSet
    assert m["variants"][2]["codecs"] == "mp4a.40.2"
    assert m["variants"][2]["mime"] == "audio/mp4"


def test_mpd_rejects_and_sniff():
    assert ts.parse_mpd("<html><body>no</body></html>") is None
    assert ts.parse_mpd(None) is None
    assert ts.parse_manifest(MPD)["kind"] == "dash"
    assert ts.parse_manifest("#EXTM3U\n#EXTINF:1,\nx.ts\n")["kind"] == "media"
    assert ts.parse_manifest("plain text") is None


def test_iso8601_duration():
    assert ts._iso8601_duration_ms("PT9.8S") == 9800
    assert ts._iso8601_duration_ms("PT2M") == 120000
    assert ts._iso8601_duration_ms("P1DT1S") == 86401000
    assert ts._iso8601_duration_ms("nope") is None
    assert ts._iso8601_duration_ms(None) is None
