"""HEIF-family (AVIF / HEIC) metadata walk — the modern web image
formats, handled the filter-before-decode way.

AVIF (AV1 payload) and HEIC (HEVC payload) dominate new crawl images,
but their codecs are out of the pure-Python doctrine's reach; what a
100 TB curation pipeline needs FIRST is the metadata anyway: the
ISO-BMFF ``meta`` box tree carries dimensions (``ispe``), the item
codec (``infe`` item type / ``ipco`` config box), rotation (``irot``)
and alpha (``auxC``) without touching a single coded byte.  This
module walks that tree for real — full-box version/flags handling,
``iprp > ipco`` property containers, item-info entries — and the
decode stays an honest NULL in ``multimodal.py`` (same doctrine as
MP3/Vorbis sample data).

The walk is conformance-pinned in tests/test_heif.py against files
produced by the container's system **libavif/libaom** encoder via
ctypes (test-side only — executors never load native code), plus the
in-repo ``encode_heif_stub`` for deterministic driver payloads.

Reference parity note: the reference engine (duzun/hQuery.php) sniffs
content types before parsing (hQuery.php:136-226); this extends the
same doctrine to the HEIF meta tree.
"""

from __future__ import annotations

import struct
from typing import Optional

__all__ = ["encode_heif_stub", "heif_meta"]

_HEIF_BRANDS = (b"avif", b"avis", b"heic", b"heix", b"hevc", b"heim",
                b"mif1", b"msf1")


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + body)


def encode_heif_stub(
    width: int,
    height: int,
    brand: bytes = b"avif",
    codec: bytes = b"av01",
    total_bytes: Optional[int] = None,
    rotation: int = 0,
) -> bytes:
    """Structurally honest HEIF: real ftyp/meta/hdlr/pitm/iinf/iprp/
    ipco/ispe/ipma/iloc boxes around a garbage mdat — the metadata a
    crawler filters on is REAL, the coded payload honestly is not
    (there is no AV1/HEVC decoder in this repo).  ``total_bytes`` pads
    the mdat so the container reaches an exact target size (closed-form
    twins); ``rotation`` (0-3 quarter turns) emits an ``irot`` box."""
    cfg_type = b"av1C" if codec == b"av01" else b"hvcC"
    hdlr = _full(b"hdlr", b"\x00" * 4 + b"pict" + b"\x00" * 12 + b"\x00")
    pitm = _full(b"pitm", struct.pack(">H", 1))
    infe = _full(b"infe", struct.pack(">HH", 1, 0) + codec + b"\x00",
                 version=2)
    iinf = _full(b"iinf", struct.pack(">H", 1) + infe)
    ispe = _full(b"ispe", struct.pack(">II", width, height))
    cfg = _box(cfg_type, b"\x81\x00\x00\x00")  # marker+version stub cfg
    props = ispe + cfg
    n_props = 2
    if rotation:
        props += _box(b"irot", bytes([rotation & 3]))
        n_props += 1
    ipco = _box(b"ipco", props)
    assoc = bytes([n_props]) + bytes(
        0x80 | (i + 1) for i in range(n_props)
    )
    ipma = _full(b"ipma", struct.pack(">I", 1) + struct.pack(">H", 1) + assoc)
    iprp = _box(b"iprp", ipco + ipma)
    iloc = _full(b"iloc", struct.pack(">BBH", 0x44, 0, 0))
    meta = _full(b"meta", hdlr + pitm + iinf + iprp + iloc)
    ftyp = _box(b"ftyp", brand + b"\x00" * 4 + brand + b"mif1")
    head = ftyp + meta
    pad = 0
    if total_bytes is not None:
        pad = total_bytes - len(head) - 8
        if pad < 0:
            raise ValueError(f"total_bytes too small (min {len(head) + 8})")
    mdat = _box(b"mdat", bytes((i * 29) % 251 for i in range(pad)))
    return head + mdat


def _walk(payload: bytes, start: int, end: int):
    pos = start
    n = min(end, len(payload))
    while pos + 8 <= n:
        (size,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > n:
                return
            (size,) = struct.unpack_from(">Q", payload, body)
            body += 8
        elif size == 0:
            size = n - pos
        if size < 8 or pos + size > n:
            return
        yield typ, body, pos + size
        pos += size


def heif_meta(payload: Optional[bytes]) -> Optional[dict]:
    """{'brand', 'codec', 'width', 'height', 'n_items', 'rotation',
    'profile', 'bit_depth', 'monochrome'} from the ISO-BMFF meta tree,
    or None for non-HEIF bytes.  codec is the primary item's infe type
    ('av01' for AVIF, 'hvc1' for HEIC); width/height come from the
    first ispe property; rotation is irot's quarter-turn count (0 when
    absent) — a consumer must apply it before trusting the aspect
    ratio, same contract as JPEG EXIF orientation; profile/bit_depth/
    monochrome decode the av1C configuration record (None for HEIC —
    hvcC is not parsed)."""
    try:
        return _heif_meta_impl(payload)
    except (struct.error, IndexError, ValueError):
        return None


def _heif_meta_impl(payload):
    if (
        payload is None
        or len(payload) < 16
        or payload[4:8] != b"ftyp"
        or payload[8:12] not in _HEIF_BRANDS
    ):
        return None
    out = {"brand": payload[8:12].decode("latin-1"), "codec": None,
           "width": None, "height": None, "n_items": 0, "rotation": 0,
           "profile": None, "bit_depth": None, "monochrome": None}
    for typ, body, end in _walk(payload, 0, len(payload)):
        if typ != b"meta" or end - body < 4:
            continue
        for t2, b2, e2 in _walk(payload, body + 4, end):  # meta is a fullbox
            if t2 == b"iinf" and e2 - b2 >= 6:
                ver = payload[b2]
                ofs = b2 + 4
                if ver == 0:
                    (cnt,) = struct.unpack_from(">H", payload, ofs)
                    ofs += 2
                else:
                    (cnt,) = struct.unpack_from(">I", payload, ofs)
                    ofs += 4
                out["n_items"] = cnt
                for t3, b3, e3 in _walk(payload, ofs, e2):
                    if t3 == b"infe" and e3 - b3 >= 12 and out["codec"] is None:
                        # fullbox v2/v3: ver(1) flags(3) id(2/4) prot(2) type(4)
                        iver = payload[b3]
                        idw = 2 if iver == 2 else 4
                        tp = payload[b3 + 4 + idw + 2 : b3 + 4 + idw + 6]
                        out["codec"] = tp.decode("latin-1").strip() or None
            elif t2 == b"iprp":
                for t3, b3, e3 in _walk(payload, b2, e2):
                    if t3 != b"ipco":
                        continue
                    for t4, b4, e4 in _walk(payload, b3, e3):
                        if t4 == b"ispe" and e4 - b4 >= 12 and out["width"] is None:
                            w, h = struct.unpack_from(">II", payload, b4 + 4)
                            out["width"], out["height"] = w, h
                        elif t4 == b"irot" and e4 - b4 >= 1:
                            out["rotation"] = payload[b4] & 3
                        elif (t4 == b"av1C" and e4 - b4 >= 4
                              and out["profile"] is None
                              and payload[b4] & 0x80):
                            # av1C (AV1CodecConfigurationRecord): byte 1
                            # = seq_profile(3)|seq_level_idx(5); byte 2 =
                            # tier|high_bitdepth|twelve_bit|monochrome|
                            # subsampling_x|subsampling_y|csp(2)
                            b1, b2_ = payload[b4 + 1], payload[b4 + 2]
                            out["profile"] = b1 >> 5
                            hbd = (b2_ >> 6) & 1
                            twelve = (b2_ >> 5) & 1
                            out["bit_depth"] = (
                                12 if hbd and twelve else 10 if hbd else 8
                            )
                            out["monochrome"] = bool((b2_ >> 4) & 1)
        break
    if out["width"] is None and out["codec"] is None:
        return None
    return out
