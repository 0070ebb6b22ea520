"""Subtitle formats (WebVTT / SRT): timed text -> ordered span rows.

Subtitles are the text payload of the web's video: a training-data
pipeline that ingests interleaved documents treats a caption file as a
document whose spans are the cues in time order — exactly the
``(kind, text, media_ref, offset)`` contract the extraction engine
emits for HTML.  This module parses both wire formats a crawler sees:

* WebVTT (W3C): ``WEBVTT`` magic (optional BOM), header metadata,
  ``NOTE``/``STYLE``/``REGION`` blocks skipped, optional cue
  identifiers, ``HH:MM:SS.mmm --> HH:MM:SS.mmm`` timings (hours
  optional) with cue settings dropped, payload markup (``<v Speaker>``,
  ``<b>``, ``<i>``, ``<c.class>``, ``<00:00:01.000>`` karaoke stamps)
  stripped to text with the speaker name preserved.
* SRT: numeric cue index, ``HH:MM:SS,mmm`` comma-millisecond timings,
  blank-line-separated payloads, positioning tags stripped.

Fault tolerance as everywhere: malformed timestamps skip the cue,
byte soup returns no cues, nothing raises.
"""

from __future__ import annotations

import re
from typing import List, Optional

__all__ = [
    "parse_webvtt",
    "parse_srt",
    "parse_subtitles",
    "subtitle_spans",
]

# HH:MM:SS.mmm with optional hours; VTT uses '.', SRT uses ','
_TS_RE = re.compile(
    r"(?:(\d{1,4}):)?(\d{1,2}):(\d{1,2})[.,](\d{1,3})"
)
_ARROW_RE = re.compile(
    r"(?:(?:\d{1,4}:)?\d{1,2}:\d{1,2}[.,]\d{1,3})\s*-->\s*"
    r"(?:(?:\d{1,4}:)?\d{1,2}:\d{1,2}[.,]\d{1,3})"
)
_TAG_RE = re.compile(r"<(/?)([^>\s]+)(?:\s+([^>]*))?>")


def _ts_ms(s: str) -> Optional[int]:
    m = _TS_RE.match(s.strip())
    if not m:
        return None
    h = int(m.group(1) or 0)
    mm, ss = int(m.group(2)), int(m.group(3))
    ms = int(m.group(4).ljust(3, "0"))
    return ((h * 60 + mm) * 60 + ss) * 1000 + ms


def _strip_markup(text: str) -> str:
    """Drop VTT/SRT payload tags; a ``<v Speaker>`` voice tag becomes a
    ``Speaker: `` prefix (the convention readers use)."""

    def repl(m: re.Match) -> str:
        closing, name, attrs = m.group(1), m.group(2), m.group(3)
        if not closing and (name == "v" or name.startswith("v.")):
            who = (attrs or "").strip()
            return f"{who}: " if who else ""
        return ""

    return _TAG_RE.sub(repl, text).strip()


def _parse_blocks(lines: List[str]) -> List[dict]:
    cues = []
    i = 0
    n = len(lines)
    while i < n:
        ln = lines[i].strip()
        if not ln:
            i += 1
            continue
        if ln.startswith(("NOTE", "STYLE", "REGION")):
            # skip the whole block
            while i < n and lines[i].strip():
                i += 1
            continue
        # optional cue identifier line before the timing line
        timing = ln
        if "-->" not in timing:
            i += 1
            if i >= n:
                break
            timing = lines[i].strip()
            if "-->" not in timing:
                continue
        m = _ARROW_RE.match(timing)
        parts = timing.split("-->")
        start = _ts_ms(parts[0]) if len(parts) == 2 else None
        end = _ts_ms(parts[1]) if len(parts) == 2 else None
        i += 1
        payload = []
        while i < n and lines[i].strip():
            payload.append(lines[i].rstrip("\r"))
            i += 1
        if start is None or end is None or m is None:
            continue  # malformed timing: cue skipped, walk continues
        text = _strip_markup("\n".join(payload))
        if text:
            cues.append({"start_ms": start, "end_ms": end, "text": text})
    return cues


def parse_webvtt(text) -> Optional[dict]:
    """WebVTT file -> {'kind': 'webvtt', 'cues': [{'start_ms','end_ms',
    'text'}], 'total_duration_ms'}, or None without the WEBVTT magic."""
    if text is None:
        return None
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text).decode("utf-8", "replace")
    body = text.lstrip("﻿")
    if not body.startswith("WEBVTT"):
        return None
    lines = body.splitlines()[1:]  # drop the signature/header line
    cues = _parse_blocks(lines)
    return {
        "kind": "webvtt",
        "cues": cues,
        "total_duration_ms": max((c["end_ms"] for c in cues), default=0),
    }


def parse_srt(text) -> Optional[dict]:
    """SRT file -> same shape as ``parse_webvtt`` with kind 'srt'.
    Accepts any text whose first timing line uses the comma-millisecond
    convention."""
    if text is None:
        return None
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text).decode("utf-8", "replace")
    body = text.lstrip("﻿")
    if "-->" not in body:
        return None
    cues = _parse_blocks(body.splitlines())
    if not cues:
        return None
    return {
        "kind": "srt",
        "cues": cues,
        "total_duration_ms": max(c["end_ms"] for c in cues),
    }


def parse_subtitles(text) -> Optional[dict]:
    """Sniff-and-parse: WebVTT by magic, else SRT by timing shape."""
    return parse_webvtt(text) or parse_srt(text)


def subtitle_spans(text) -> List[dict]:
    """Caption file -> the engine's span contract: one row per cue in
    time order, ``(kind='text', text, media_ref=None, offset=cue
    ordinal)`` — ready to union with HTML-extracted spans in an
    interleaved-document table."""
    parsed = parse_subtitles(text)
    if not parsed:
        return []
    return [
        {
            "kind": "text",
            "text": c["text"],
            "media_ref": None,
            "offset": i,
            "start_ms": c["start_ms"],
            "end_ms": c["end_ms"],
        }
        for i, c in enumerate(parsed["cues"])
    ]
