"""WebVTT / SRT parsing (operators/subtitles.py): timing arithmetic,
markup stripping, block skipping, malformed-cue tolerance, and the
span-contract projection."""

from hquery_php_spark.operators.subtitles import (
    parse_srt,
    parse_subtitles,
    parse_webvtt,
    subtitle_spans,
)

VTT = """WEBVTT - demo

NOTE this block is a comment
and spans lines

intro
00:01.000 --> 00:04.000 align:start position:10%
<v Alice>Hello <b>world</b>

00:04.500 --> 01:00:02.250
Second cue
continues here
"""

SRT = """1
00:00:01,000 --> 00:00:04,000
Hello world

2
00:00:04,500 --> 00:00:09,250
<i>Second</i> cue
"""


def test_webvtt_parse():
    m = parse_webvtt(VTT)
    assert m["kind"] == "webvtt" and len(m["cues"]) == 2
    c0, c1 = m["cues"]
    # VTT short form: 00:01.000 is MM:SS.mmm
    assert (c0["start_ms"], c0["end_ms"]) == (1000, 4000)
    assert c0["text"] == "Alice: Hello world"
    assert c1["start_ms"] == 4500
    assert c1["end_ms"] == 3602250  # 01:00:02.250
    assert c1["text"] == "Second cue\ncontinues here"
    assert m["total_duration_ms"] == 3602250


def test_srt_parse():
    m = parse_srt(SRT)
    assert m["kind"] == "srt" and len(m["cues"]) == 2
    assert m["cues"][0]["text"] == "Hello world"
    assert m["cues"][1]["text"] == "Second cue"
    assert m["cues"][1]["start_ms"] == 4500


def test_sniff_and_rejects():
    assert parse_subtitles(VTT)["kind"] == "webvtt"
    assert parse_subtitles(SRT)["kind"] == "srt"
    assert parse_subtitles("no subtitles here") is None
    assert parse_webvtt("not vtt") is None
    assert parse_srt("nothing --> malformed") is None
    assert parse_webvtt(None) is None
    assert parse_webvtt(VTT.encode()) is not None  # bytes accepted


def test_malformed_cues_skipped_not_fatal():
    broken = (
        "WEBVTT\n\n"
        "bogus --> timing\nskipped text\n\n"
        "00:01.000 --> 00:02.000\nkept\n\n"
        "99:99 --> also bad\nmore skipped\n"
    )
    m = parse_webvtt(broken)
    assert [c["text"] for c in m["cues"]] == ["kept"]


def test_karaoke_and_class_markup_stripped():
    vtt = (
        "WEBVTT\n\n"
        "00:00.000 --> 00:05.000\n"
        "<c.yellow>Colored</c> and <00:00:02.000>timed <i>words</i>\n"
    )
    m = parse_webvtt(vtt)
    assert m["cues"][0]["text"] == "Colored and timed words"


def test_subtitle_spans_contract():
    spans = subtitle_spans(VTT)
    assert [s["offset"] for s in spans] == [0, 1]
    assert all(s["kind"] == "text" and s["media_ref"] is None for s in spans)
    assert spans[0]["text"].startswith("Alice:")
    assert spans[0]["start_ms"] == 1000
    assert subtitle_spans("garbage") == []


def test_fuzz_never_raises():
    import random

    rng = random.Random(5)
    base = VTT
    for _ in range(200):
        b = list(base)
        for _ in range(rng.randrange(1, 6)):
            b[rng.randrange(len(b))] = chr(rng.randrange(32, 127))
        parse_subtitles("".join(b))
    for cut in range(0, len(base), 7):
        parse_subtitles(base[:cut])
