"""MPEG transport streams (HLS segments): the `.ts` walker and writer.

Why this exists: after MP4 and WebM, the third video payload a crawler
actually fetches is the HLS media segment — an MPEG-2 transport stream
(ISO 13818-1) carrying H.264/HEVC video and ADTS-AAC/MP3 audio.  The
filter-before-decode doctrine needs the same surface here as for the
other containers: program/stream inventory, RFC 6381 codec tags, coded
dimensions, and duration — all without a media library.

Implemented from the public specs only:

* ISO 13818-1 §2.4.3: 188-byte packets, sync 0x47, PID/PUSI/continuity,
  adaptation fields, PCR (33-bit 90 kHz base + 9-bit 27 MHz extension).
* §2.4.4: PSI — PAT (PID 0) -> program map PID; PMT -> (stream_type,
  elementary_PID) entries; pointer_field handling; CRC32/MPEG-2 over
  both tables (poly 0x04C11DB7, init 0xFFFFFFFF, MSB-first, no final
  xor) — verified on parse, emitted on write.
* PES (§2.4.3.6-2.4.3.7): start-code prefix, stream id, PTS flags,
  header-length skip to the elementary stream.
* H.264 Annex B: start-code NAL segmentation; SPS (type 7) through
  ``codecconfig.parse_avc_sps`` -> avc1.PPCCLL tag + exact coded dims.
* ADTS (ISO 14496-3 §1.A): syncword, profile (AOT-1), sampling index,
  channel configuration -> mp4a.40.x tag + rate/channels.

Fault tolerance mirrors the HTML engine: lost sync resynchronizes on
the next 0x47 lattice point, truncated tails and corrupt tables yield
partial metadata, byte soup never raises.

Duration comes from the PCR span of the PCR PID (the normative stream
clock), so the writer can pin it closed-form for the SQL twin.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

__all__ = [
    "crc32_mpeg2",
    "annexb_nal_units",
    "parse_adts_header",
    "build_adts_frame",
    "encode_ts_stub",
    "ts_meta",
    "parse_m3u8",
    "parse_mpd",
    "parse_manifest",
    "hls_declared_vs_coded",
    "TS_PACKET",
]

TS_PACKET = 188

_CRC_TABLE = []
for _i in range(256):
    _c = _i << 24
    for _ in range(8):
        _c = ((_c << 1) ^ 0x04C11DB7) if _c & 0x80000000 else (_c << 1)
    _CRC_TABLE.append(_c & 0xFFFFFFFF)


def crc32_mpeg2(data: bytes) -> int:
    """CRC-32/MPEG-2 (as used by PSI sections): MSB-first, init all-ones,
    no reflection, no final xor."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


# ------------------------------------------------------------------ #
# Elementary-stream helpers


def annexb_nal_units(data: bytes) -> Iterator[Tuple[int, bytes]]:
    """Split an H.264/HEVC Annex B byte stream on 00 00 01 /
    00 00 00 01 start codes; yields (first_payload_byte, nal_bytes)."""
    n = len(data)
    pos = data.find(b"\x00\x00\x01")
    while pos >= 0:
        start = pos + 3
        nxt = data.find(b"\x00\x00\x01", start)
        end = n if nxt < 0 else (nxt - 1 if nxt > 0 and data[nxt - 1] == 0 else nxt)
        if start < end:
            yield data[start], data[start:end]
        pos = nxt


_ADTS_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350, None, None, None,
)


def parse_adts_header(data: bytes) -> Optional[dict]:
    """First ADTS frame header -> {'aot','sample_rate','channels',
    'frame_length'}, or None."""
    if len(data) < 7 or data[0] != 0xFF or (data[1] & 0xF6) != 0xF0:
        return None
    profile = (data[2] >> 6) & 3  # = AOT - 1
    sfi = (data[2] >> 2) & 0xF
    ch = ((data[2] & 1) << 2) | (data[3] >> 6)
    flen = ((data[3] & 3) << 11) | (data[4] << 3) | (data[5] >> 5)
    if _ADTS_RATES[sfi] is None:
        return None
    return {
        "aot": profile + 1,
        "sample_rate": _ADTS_RATES[sfi],
        "channels": ch,
        "frame_length": flen,
    }


def build_adts_frame(
    aot: int = 2, sample_rate: int = 44100, channels: int = 2,
    payload: bytes = b"\x00" * 8,
) -> bytes:
    """A syntactically valid ADTS frame (no CRC) wrapping ``payload``."""
    sfi = _ADTS_RATES.index(sample_rate)
    flen = 7 + len(payload)
    hdr = bytes(
        (
            0xFF,
            0xF1,  # MPEG-4, layer 0, no CRC
            ((aot - 1) << 6) | (sfi << 2) | (channels >> 2),
            ((channels & 3) << 6) | ((flen >> 11) & 3),
            (flen >> 3) & 0xFF,
            ((flen & 7) << 5) | 0x1F,
            0xFC,  # buffer fullness ...111111, 1 raw block
        )
    )
    return hdr + payload


# ------------------------------------------------------------------ #
# Writer


def _psi_packet(pid: int, table: bytes, cc: int) -> bytes:
    """One TS packet carrying a PSI section (pointer_field 0)."""
    body = b"\x00" + table  # pointer_field
    header = struct.pack(
        ">BHB", 0x47, 0x4000 | pid, 0x10 | (cc & 0xF)
    )  # PUSI=1, payload only
    pad = TS_PACKET - 4 - len(body)
    if pad < 0:
        raise ValueError("PSI section too large for one packet")
    return header + body + b"\xff" * pad


def _section(table_id: int, syntax_body: bytes) -> bytes:
    # section_length covers syntax body + CRC
    ln = len(syntax_body) + 4
    head = bytes((table_id, 0xB0 | (ln >> 8), ln & 0xFF))
    crc = crc32_mpeg2(head + syntax_body)
    return head + syntax_body + struct.pack(">I", crc)


def encode_ts_stub(
    duration_ms: int,
    width: int,
    height: int,
    avc_profile: int = 66,
    avc_level: int = 30,
    audio: Optional[str] = "aac",
    aac_rate: int = 44100,
    aac_channels: int = 2,
    n_filler: int = 4,
) -> bytes:
    """A minimal-but-valid single-program transport stream: PAT, PMT,
    a video PES packet whose Annex B payload carries a REAL SPS+PPS
    (H.264, built by ``codecconfig``), an optional audio PES packet
    (ADTS-AAC or an MPEG-1 Layer III stream-type marker), PCR packets
    pinning ``duration_ms`` exactly, and filler payload packets with
    correct continuity counters."""
    from . import codecconfig as cc

    pmt_pid, vid_pid, aud_pid = 0x1000, 0x0100, 0x0101
    pkts: List[bytes] = []

    # PAT: program 1 -> pmt_pid
    pat_body = (
        struct.pack(">HBBB", 1, 0xC1, 0, 0)  # tsid, version/current, sec 0/0
        + struct.pack(">HH", 1, 0xE000 | pmt_pid)
    )
    pkts.append(_psi_packet(0, _section(0, pat_body), 0))

    # PMT: PCR PID = video; streams
    streams = struct.pack(">BHH", 0x1B, 0xE000 | vid_pid, 0xF000)
    if audio == "aac":
        streams += struct.pack(">BHH", 0x0F, 0xE000 | aud_pid, 0xF000)
    elif audio == "mp3":
        streams += struct.pack(">BHH", 0x03, 0xE000 | aud_pid, 0xF000)
    pmt_body = (
        struct.pack(">HBBB", 1, 0xC1, 0, 0)
        + struct.pack(">HH", 0xE000 | vid_pid, 0xF000)
        + streams
    )
    pkts.append(_psi_packet(pmt_pid, _section(2, pmt_body), 0))

    def _pcr_field(pcr_27m: int) -> bytes:
        base, ext = divmod(pcr_27m, 300)
        return bytes(
            (
                (base >> 25) & 0xFF,
                (base >> 17) & 0xFF,
                (base >> 9) & 0xFF,
                (base >> 1) & 0xFF,
                ((base & 1) << 7) | 0x7E | ((ext >> 8) & 1),
                ext & 0xFF,
            )
        )

    def _packet(pid, cc_val, payload, pusi=False, pcr=None):
        # under-full packets are stuffed through the ADAPTATION FIELD
        # (length byte [+ flags 0x00 + 0xff...]) per §2.4.3.5 — trailing
        # bytes in the payload area would read as elementary-stream data
        af_fields = (b"\x10" + _pcr_field(pcr)) if pcr is not None else b""
        room = TS_PACKET - 4
        if af_fields and len(payload) > room - 1 - len(af_fields):
            payload = payload[: room - 1 - len(af_fields)]
        gap = room - len(payload)
        if gap == 0 and not af_fields:
            af, afc = b"", 0x10
        else:
            if af_fields:
                stuff = gap - 1 - len(af_fields)
                af = (
                    bytes((len(af_fields) + stuff,))
                    + af_fields + b"\xff" * stuff
                )
            elif gap == 1:
                af = b"\x00"  # af_length 0: one stuffing byte
            else:
                af = bytes((gap - 1, 0x00)) + b"\xff" * (gap - 2)
            afc = 0x30 if payload else 0x20
        return (
            struct.pack(">BHB", 0x47, (0x4000 if pusi else 0) | pid,
                        afc | (cc_val & 0xF))
            + af + payload
        )

    # video PES: PES start code + stream_id 0xE0 + Annex B SPS/PPS/AUD
    sps = cc.build_avc_sps(width, height, profile_idc=avc_profile,
                           level_idc=avc_level)
    pps = cc.build_avc_pps()
    es = (
        b"\x00\x00\x00\x01\x09\xf0"  # AUD
        + b"\x00\x00\x00\x01" + sps
        + b"\x00\x00\x00\x01" + pps
        + b"\x00\x00\x01\x65\x88\x80"  # IDR slice stub
    )
    pes = (
        b"\x00\x00\x01\xe0\x00\x00"  # unbounded length (video allows 0)
        + b"\x80\x00\x00"  # flags, no PTS, header_data_length 0
        + es
    )
    vcc = 0
    pkts.append(_packet(vid_pid, vcc, pes, pusi=True, pcr=0))
    vcc += 1

    if audio is not None:
        if audio == "aac":
            aes = build_adts_frame(2, aac_rate, aac_channels)
        else:
            aes = b"\xff\xfb\x90\x00" + b"\x00" * 16  # MP3 frame header stub
        apes = b"\x00\x00\x01\xc0" + struct.pack(">H", 3 + len(aes)) \
            + b"\x80\x00\x00" + aes
        pkts.append(_packet(aud_pid, 0, apes, pusi=True))

    # filler video payload packets (continuity advances)
    for _ in range(max(0, n_filler)):
        pkts.append(_packet(vid_pid, vcc, b"\x00" * 32))
        vcc += 1

    # closing PCR packet pins the duration exactly: 27 MHz units
    pkts.append(_packet(vid_pid, vcc, b"", pcr=duration_ms * 27000))
    return b"".join(pkts)


# ------------------------------------------------------------------ #
# Parser

_STREAM_TYPES = {
    0x01: "mpeg1video",
    0x02: "mpeg2video",
    0x03: "mp3",
    0x04: "mp3",
    0x0F: "aac",
    0x11: "aac-latm",
    0x1B: "h264",
    0x24: "hevc",
    0x51: "vvc",
    0x81: "ac3",
}


def ts_meta(payload: Optional[bytes]) -> Optional[dict]:
    """{'n_packets','n_pids','n_programs','streams','codec_tags',
    'duration_ms','width','height'} from a transport stream, or None
    for non-TS bytes.  ``streams`` is the comma-joined stream-type
    inventory in PMT order; ``codec_tags`` the RFC 6381 strings
    (H.264 via a real SPS parse of the PES payload — which also yields
    the coded width/height; AAC via the ADTS header).  Duration is the
    PCR span at the stream clock (90 kHz base / 27 MHz extension)."""
    try:
        return _ts_meta_impl(payload)
    except (struct.error, IndexError, ValueError):
        return None


def _sync_scan(payload: bytes) -> List[int]:
    """Packet start offsets: follow the 188 lattice, resync on loss."""
    offs = []
    pos = 0
    n = len(payload)
    while pos + TS_PACKET <= n:
        if payload[pos] == 0x47:
            offs.append(pos)
            pos += TS_PACKET
        else:
            nxt = payload.find(b"\x47", pos + 1)
            if nxt < 0:
                break
            pos = nxt
    return offs


def _ts_meta_impl(payload):
    if (
        payload is None
        or len(payload) < 2 * TS_PACKET
        or payload[0] != 0x47
        or payload[TS_PACKET] != 0x47
    ):
        return None
    offs = _sync_scan(payload)
    if len(offs) < 2:
        return None

    pmt_pids = {}  # pmt_pid -> program_number
    streams: List[Tuple[int, int]] = []  # (stream_type, pid) in PMT order
    pcr_pid = None
    pcr_first = pcr_last = None
    pes_first: dict = {}  # pid -> first PES payload bytes
    pids = set()

    for off in offs:
        pkt = payload[off : off + TS_PACKET]
        pid = ((pkt[1] & 0x1F) << 8) | pkt[2]
        pusi = bool(pkt[1] & 0x40)
        afc = (pkt[3] >> 4) & 3
        pids.add(pid)
        pos = 4
        if afc & 2:  # adaptation field
            alen = pkt[pos]
            if alen > 0 and pos + 1 + alen <= TS_PACKET:
                flags = pkt[pos + 1]
                if flags & 0x10 and alen >= 7:  # PCR flag
                    b = pkt[pos + 2 : pos + 8]
                    base = (
                        (b[0] << 25) | (b[1] << 17) | (b[2] << 9)
                        | (b[3] << 1) | (b[4] >> 7)
                    )
                    ext = ((b[4] & 1) << 8) | b[5]
                    pcr = base * 300 + ext
                    if pcr_pid is None or pid == pcr_pid:
                        if pcr_first is None:
                            pcr_first = pcr
                        pcr_last = pcr
            pos += 1 + alen
        if not (afc & 1) or pos >= TS_PACKET:
            continue
        data = pkt[pos:]
        if pid == 0 and pusi:
            # PAT: pointer_field then section
            sec = data[1 + data[0] :]
            if len(sec) >= 12 and sec[0] == 0:
                ln = ((sec[1] & 0x0F) << 8) | sec[2]
                body = sec[3 : 3 + ln]
                if len(body) == ln and crc32_mpeg2(sec[: 3 + ln]) == 0:
                    # programs: after 5 fixed bytes, 4-byte entries (CRC
                    # excluded): program_number + PID
                    for i in range(5, ln - 4, 4):
                        prog, ppid = struct.unpack_from(">HH", body, i)
                        if prog != 0:
                            pmt_pids[ppid & 0x1FFF] = prog
        elif pid in pmt_pids and pusi and not streams:
            sec = data[1 + data[0] :]
            if len(sec) >= 16 and sec[0] == 2:
                ln = ((sec[1] & 0x0F) << 8) | sec[2]
                if 3 + ln <= len(sec) and crc32_mpeg2(sec[: 3 + ln]) == 0:
                    body = sec[3 : 3 + ln]
                    if pcr_pid is None:
                        pcr_pid = ((body[5] & 0x1F) << 8) | body[6]
                    pinfo = ((body[7] & 0x0F) << 8) | body[8]
                    i = 9 + pinfo
                    while i + 5 <= ln - 4:
                        st = body[i]
                        epid = ((body[i + 1] & 0x1F) << 8) | body[i + 2]
                        esinfo = ((body[i + 3] & 0x0F) << 8) | body[i + 4]
                        streams.append((st, epid))
                        i += 5 + esinfo
        elif pusi and len(data) >= 9 and data[:3] == b"\x00\x00\x01":
            # PES start: skip the optional header to the ES payload
            hdr_len = data[8]
            es = data[9 + hdr_len :]
            if pid not in pes_first:
                pes_first[pid] = es

    if not pmt_pids and not streams:
        return None

    from . import codecconfig as cc

    names, tags = [], []
    width = height = None
    for st, epid in streams:
        name = _STREAM_TYPES.get(st, f"0x{st:02x}")
        names.append(name)
        tag = name
        es = pes_first.get(epid, b"")
        if st == 0x1B and es:
            for first, nal in annexb_nal_units(es):
                if first & 0x1F == 7:
                    sps = cc.parse_avc_sps(nal)
                    if sps:
                        tag = cc.codec_string("avc1", sps)
                        if width is None:
                            width, height = sps["width"], sps["height"]
                    break
        elif st == 0x0F and es:
            adts = parse_adts_header(es)
            if adts:
                tag = f"mp4a.40.{adts['aot']}"
        tags.append(tag)

    duration_ms = None
    if pcr_first is not None and pcr_last is not None and pcr_last >= pcr_first:
        duration_ms = (pcr_last - pcr_first) // 27000
    return {
        "n_packets": len(offs),
        "n_pids": len(pids),
        "n_programs": len(pmt_pids),
        "streams": ",".join(names) if names else None,
        "codec_tags": ",".join(tags) if tags else None,
        "duration_ms": duration_ms,
        "width": width,
        "height": height,
    }


# ------------------------------------------------------------------ #
# HLS playlists (RFC 8216): the text side of the segment walk


def _attr_list(s: str) -> dict:
    """Parse an EXT-X attribute list: KEY=VALUE pairs, comma-separated,
    values optionally quoted (commas inside quotes are literal)."""
    out = {}
    i, n = 0, len(s)
    while i < n:
        eq = s.find("=", i)
        if eq < 0:
            break
        key = s[i:eq].strip()
        j = eq + 1
        if j < n and s[j] == '"':
            k = s.find('"', j + 1)
            if k < 0:
                out[key] = s[j + 1 :]
                break
            out[key] = s[j + 1 : k]
            i = k + 1
            if i < n and s[i] == ",":
                i += 1
        else:
            k = s.find(",", j)
            if k < 0:
                out[key] = s[j:]
                break
            out[key] = s[j:k]
            i = k + 1
    return out


def parse_m3u8(text) -> Optional[dict]:
    """HLS playlist -> {'kind': 'master'|'media', 'version',
    'variants': [{'bandwidth','width','height','codecs','uri'}],
    'segments': [{'duration_ms','uri'}], 'target_duration_ms',
    'total_duration_ms', 'ended'} — the crawl-side join surface for the
    transport-stream walker: a master playlist DECLARES the RFC 6381
    codec strings the segment walk then proves.  Accepts str or bytes;
    returns None unless the #EXTM3U magic leads."""
    if text is None:
        return None
    if isinstance(text, (bytes, bytearray)):
        try:
            text = bytes(text).decode("utf-8", "replace")
        except Exception:
            return None
    lines = [ln.strip() for ln in text.lstrip("﻿").splitlines()]
    if not lines or lines[0] != "#EXTM3U":
        return None
    out = {
        "kind": "media", "version": None, "variants": [], "segments": [],
        "target_duration_ms": None, "total_duration_ms": None,
        "ended": False,
    }
    pending_variant = None
    pending_duration = None
    total = 0
    for ln in lines[1:]:
        if not ln:
            continue
        if ln.startswith("#EXT-X-VERSION:"):
            try:
                out["version"] = int(ln.split(":", 1)[1])
            except ValueError:
                pass
        elif ln.startswith("#EXT-X-STREAM-INF:"):
            out["kind"] = "master"
            a = _attr_list(ln.split(":", 1)[1])
            w = h = None
            res = a.get("RESOLUTION", "")
            if "x" in res:
                try:
                    w, h = (int(v) for v in res.lower().split("x", 1))
                except ValueError:
                    w = h = None
            try:
                bw = int(a.get("BANDWIDTH", ""))
            except ValueError:
                bw = None
            pending_variant = {
                "bandwidth": bw, "width": w, "height": h,
                "codecs": a.get("CODECS"), "uri": None,
            }
        elif ln.startswith("#EXT-X-TARGETDURATION:"):
            try:
                out["target_duration_ms"] = (
                    int(float(ln.split(":", 1)[1]) * 1000)
                )
            except ValueError:
                pass
        elif ln.startswith("#EXTINF:"):
            try:
                pending_duration = int(
                    float(ln.split(":", 1)[1].split(",", 1)[0]) * 1000
                )
            except ValueError:
                pending_duration = None
        elif ln.startswith("#EXT-X-ENDLIST"):
            out["ended"] = True
        elif not ln.startswith("#"):
            if pending_variant is not None:
                pending_variant["uri"] = ln
                out["variants"].append(pending_variant)
                pending_variant = None
            else:
                out["segments"].append(
                    {"duration_ms": pending_duration, "uri": ln}
                )
                if pending_duration:
                    total += pending_duration
                pending_duration = None
    if out["segments"]:
        out["total_duration_ms"] = total
    return out


def hls_declared_vs_coded(playlist_text, segment_payload) -> Optional[dict]:
    """The consistency operator: does a segment's ACTUAL bitstream match
    what its (master-playlist) variant declared?  Returns {'declared',
    'coded', 'codecs_match', 'declared_res', 'coded_res', 'res_match'}
    comparing the playlist CODECS/RESOLUTION attributes against the
    transport stream's own SPS/ADTS-derived values — the check a
    curation pipeline runs before trusting crawl-side manifests."""
    pl = parse_m3u8(playlist_text)
    seg = ts_meta(segment_payload)
    if pl is None or seg is None or not pl["variants"]:
        return None
    v = pl["variants"][0]
    declared = v.get("codecs")
    coded = seg.get("codec_tags")
    codecs_match = None
    if declared and coded:
        dset = {c.strip() for c in declared.split(",")}
        cset = set(coded.split(","))
        codecs_match = dset == cset
    declared_res = (
        (v["width"], v["height"]) if v.get("width") else None
    )
    coded_res = (
        (seg["width"], seg["height"]) if seg.get("width") else None
    )
    res_match = (
        declared_res == coded_res
        if declared_res and coded_res
        else None
    )
    return {
        "declared": declared,
        "coded": coded,
        "codecs_match": codecs_match,
        "declared_res": declared_res,
        "coded_res": coded_res,
        "res_match": res_match,
    }


# ------------------------------------------------------------------ #
# DASH manifests (ISO 23009-1) — parsed with the in-repo hquery engine


def _iso8601_duration_ms(s: Optional[str]) -> Optional[int]:
    """'PT1H2M3.5S' -> milliseconds (the MPD duration format)."""
    if not s or not s.startswith("P"):
        return None
    total = 0.0
    num = ""
    in_time = False
    for ch in s[1:]:
        if ch == "T":
            in_time = True
        elif ch.isdigit() or ch == ".":
            num += ch
        else:
            if not num:
                return None
            v = float(num)
            num = ""
            if ch == "H":
                total += v * 3600
            elif ch == "M":
                total += v * (60 if in_time else 2592000)
            elif ch == "S":
                total += v
            elif ch == "D":
                total += v * 86400
            elif ch == "Y":
                total += v * 31536000
            else:
                return None
    return int(total * 1000)


def parse_mpd(text) -> Optional[dict]:
    """DASH MPD manifest -> the same shape as ``parse_m3u8``:
    {'kind': 'dash', 'variants': [{'bandwidth','width','height',
    'codecs','uri','mime'}], 'total_duration_ms', 'dynamic'}.

    Dogfoods the repo's own extraction engine: the MPD's XML is indexed
    by the hquery tokenizer and the Representation inventory is pulled
    with the same selector algebra the HTML pipeline uses — tag query,
    context find, attribute access (names case-folded, reference
    semantics), BaseURL text extraction."""
    import hquery_php_spark as hq

    if text is None:
        return None
    raw = text if isinstance(text, (bytes, bytearray)) else text.encode("utf-8")
    head = bytes(raw[:512]).lstrip()
    if b"<MPD" not in head and b"urn:mpeg:dash" not in bytes(raw[:2048]):
        return None
    doc = hq.HDoc(bytes(raw))
    mpds = doc.find("MPD")
    if not mpds:
        return None
    mpd = next(iter(mpds))
    out = {
        "kind": "dash",
        "variants": [],
        "total_duration_ms": _iso8601_duration_ms(
            mpd.attr("mediapresentationduration")
        ),
        "dynamic": (mpd.attr("type") or "static") == "dynamic",
    }

    def _int(v):
        try:
            return int(v) if v is not None else None
        except ValueError:
            return None

    for aset in doc.find("AdaptationSet") or []:
        set_mime = aset.attr("mimetype")
        set_codecs = aset.attr("codecs")
        for rep in aset.find("Representation") or []:
            base = rep.find("BaseURL")
            uri = next(iter(base)).text().strip() if base else None
            out["variants"].append(
                {
                    "bandwidth": _int(rep.attr("bandwidth")),
                    "width": _int(rep.attr("width")),
                    "height": _int(rep.attr("height")),
                    # Representation attributes inherit from the set
                    "codecs": rep.attr("codecs") or set_codecs,
                    "mime": rep.attr("mimetype") or set_mime,
                    "uri": uri,
                }
            )
    return out


def parse_manifest(text) -> Optional[dict]:
    """Sniff-and-parse either streaming manifest format: HLS M3U8 or
    DASH MPD, normalized to one variant-inventory shape."""
    return parse_m3u8(text) or parse_mpd(text)
