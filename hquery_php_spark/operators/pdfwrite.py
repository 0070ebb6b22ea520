"""Deterministic PDF writer — the differential-validation twin of
``pdfparse.py``.

With no PDF validator in this container (no poppler/mupdf/qpdf), the
parser is pinned the same way the 12-bit JPEG leg was: this writer
emits the SAME logical document through *independent* container
mechanisms, and the parser must extract byte-identical span sequences
from every one of them:

* cross-reference: classic table | xref stream (PNG Up predictor,
  ``/W [1 4 2]``) | xref stream + object stream (``/Type /ObjStm``)
* content filters: none | Flate | LZW | RunLength | ASCIIHex |
  ASCII85∘Flate chain
* show strings: literal | octal-escaped (+ line continuations) |
  hex strings through a Type0 font with a ``/ToUnicode`` CMap
* positioning: ``Td`` | ``Tm`` | relative ``TD``/``T*``/``'``/``"``
  | a ``q cm Q`` translated variant (device coords via the CTM)
* incremental update: base document + an appended update section
  (``/Prev`` chain) that adds the final page

Everything is byte-deterministic (no timestamps, no randomness) so
driver oracles can be closed-form.
"""

from __future__ import annotations

import base64
import hashlib
import zlib
from typing import Any, Dict, List, Optional, Sequence, Tuple

from .pdfparse import Name, Ref, lzw_encode, rl_encode

__all__ = ["build_pdf", "PDF_FAMILIES"]

Block = Tuple[float, float, str]


def _fmt_num(v: float) -> str:
    return f"{v:g}"


def _ser(obj: Any) -> str:
    if isinstance(obj, Ref):
        return f"{obj.num} {obj.gen} R"
    if isinstance(obj, Name):
        return "/" + "".join(
            c if 0x21 <= ord(c) <= 0x7E and c not in "()<>[]{}/%#" else f"#{ord(c):02X}"
            for c in str(obj)
        )
    if isinstance(obj, bool):
        return "true" if obj else "false"
    if obj is None:
        return "null"
    if isinstance(obj, (int, float)):
        return _fmt_num(obj)
    if isinstance(obj, bytes):  # literal string, minimally escaped
        body = (
            obj.replace(b"\\", rb"\\")
            .replace(b"(", rb"\(")
            .replace(b")", rb"\)")
            .replace(b"\r", rb"\r")
        )
        return "(" + body.decode("latin-1") + ")"
    if isinstance(obj, list):
        return "[" + " ".join(_ser(x) for x in obj) + "]"
    if isinstance(obj, dict):
        return (
            "<< "
            + " ".join(f"{_ser(Name(k))} {_ser(v)}" for k, v in obj.items())
            + " >>"
        )
    raise TypeError(type(obj))


def _lit_escape(text: str, octal: bool) -> str:
    raw = text.encode("latin-1", "replace")
    out = []
    col = 0
    for b in raw:
        if octal and (b < 0x20 or b > 0x7E or b in b"()\\"):
            out.append(f"\\{b:03o}")
        elif b in b"()\\":
            out.append("\\" + chr(b))
        elif b == 0x0D:
            out.append("\\r")
        else:
            out.append(chr(b))
        col += 1
        if octal and col % 24 == 0:
            out.append("\\\n")  # line continuation — decodes to nothing
    return "".join(out)


def _hex_show(text: str) -> str:
    units = []
    for ch in text:
        cp = ord(ch)
        units.append(cp if cp <= 0xFFFF else 0xFFFD)
    return "<" + "".join(f"{u:04X}" for u in units) + ">"


def _tounicode_cmap(chars: Sequence[int]) -> bytes:
    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def",
        "/CMapName /Adobe-Identity-UCS def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<0000> <FFFF>",
        "endcodespacerange",
    ]
    chars = sorted(set(chars))
    for i in range(0, len(chars), 100):
        chunk = chars[i : i + 100]
        lines.append(f"{len(chunk)} beginbfchar")
        for c in chunk:
            lines.append(f"<{c:04X}> <{c:04X}>")
        lines.append("endbfchar")
    lines += [
        "endcmap",
        "CMapName currentdict /CMap defineresource pop",
        "end",
        "end",
    ]
    return "\n".join(lines).encode("latin-1")


# ---- content stream assembly ------------------------------------------ #


def _lit_bytes(raw: bytes) -> str:
    """Binary-safe literal string (parens/backslash/CR escaped)."""
    return (
        "("
        + raw.replace(b"\\", rb"\\")
        .replace(b"(", rb"\(")
        .replace(b")", rb"\)")
        .replace(b"\r", rb"\r")
        .decode("latin-1")
        + ")"
    )


def _show_str(
    text: str, strmode: str, charmap: Optional[Dict[str, int]] = None
) -> str:
    if strmode == "hex":
        return _hex_show(text)
    if strmode == "diffenc" and charmap is not None:
        return _lit_bytes(bytes(charmap[c] for c in text))
    return "(" + _lit_escape(text, strmode == "octal") + ")"


def _diffenc_map(pages: Sequence[Sequence[Block]]) -> Dict[str, int]:
    """char → remapped single-byte code (33..255) for the /Differences
    family — deliberately NOT the identity so decode must go through
    the glyph-name table."""
    used = sorted({c for page in pages for _, _, t in page for c in t})
    if len(used) > 223:
        raise ValueError("diffenc family supports <= 223 distinct chars")
    return {c: 33 + i for i, c in enumerate(used)}


def _glyph_name(c: str) -> Name:
    cp = ord(c)
    return Name(f"uni{cp:04X}" if cp <= 0xFFFF else f"u{cp:X}")


def _content_ops(
    blocks: Sequence[Block],
    strmode: str,
    ops: str,
    cm_shift: Optional[Tuple[float, float]],
    charmap: Optional[Dict[str, int]] = None,
) -> bytes:
    parts: List[str] = []
    dx0 = dy0 = 0.0
    if cm_shift is not None:
        sx, sy = cm_shift
        parts.append(f"q\n1 0 0 1 {_fmt_num(sx)} {_fmt_num(sy)} cm")
        dx0, dy0 = -sx, -sy  # text-space coords that land on the same device point
    if ops == "star":
        parts.append("BT /F1 12 Tf")
        px = py = None
        tl = None
        for x, y, text in blocks:
            tx, ty = x + dx0, y + dy0
            s = _show_str(text, strmode, charmap)
            if px is None:
                parts.append(f"{_fmt_num(tx)} {_fmt_num(ty)} Td {s} Tj")
            elif tx == px and tl is not None and (py - ty) == tl:
                parts.append(f"{s} '")
            else:
                # TD sets TL = -ty_delta, enabling ' on the next line
                parts.append(
                    f"{_fmt_num(tx - px)} {_fmt_num(ty - py)} TD {s} Tj"
                )
                tl = py - ty if py is not None else None
            px, py = tx, ty
        parts.append("ET")
    else:
        for x, y, text in blocks:
            tx, ty = x + dx0, y + dy0
            s = _show_str(text, strmode, charmap)
            if ops == "tm":
                parts.append(
                    f"BT /F1 12 Tf 1 0 0 1 {_fmt_num(tx)} {_fmt_num(ty)} Tm {s} Tj ET"
                )
            else:  # td
                parts.append(
                    f"BT /F1 12 Tf {_fmt_num(tx)} {_fmt_num(ty)} Td {s} Tj ET"
                )
    if cm_shift is not None:
        parts.append("Q")
    return "\n".join(parts).encode("latin-1")


_ENCODERS = {
    "FlateDecode": lambda d: zlib.compress(d),
    "LZWDecode": lambda d: lzw_encode(d),
    "RunLengthDecode": lambda d: rl_encode(d),
    "ASCIIHexDecode": lambda d: d.hex().upper().encode() + b">",
    "ASCII85Decode": lambda d: base64.a85encode(d, adobe=False) + b"~>",
}


def _encode_stream(data: bytes, filters: Sequence[str]) -> Tuple[bytes, Any]:
    """Encode for a /Filter list given in DECODE order."""
    for f in reversed(filters):
        data = _ENCODERS[f](data)
    if not filters:
        return data, None
    if len(filters) == 1:
        return data, Name(filters[0])
    return data, [Name(f) for f in filters]


# ---- document assembly -------------------------------------------------- #


class _Builder:
    def __init__(self, version: str):
        self.buf = bytearray(f"%PDF-{version}\n%\xb5\xb5\xb5\xb5\n".encode("latin-1"))
        self.offsets: Dict[int, int] = {}

    def add_object(self, num: int, body: str) -> None:
        self.offsets[num] = len(self.buf)
        self.buf.extend(f"{num} 0 obj\n{body}\nendobj\n".encode("latin-1"))

    def add_stream(self, num: int, sdict: Dict[str, Any], data: bytes) -> None:
        sdict = dict(sdict)
        sdict["Length"] = len(data)
        self.offsets[num] = len(self.buf)
        self.buf.extend(f"{num} 0 obj\n{_ser(sdict)}\nstream\n".encode("latin-1"))
        self.buf.extend(data)
        self.buf.extend(b"\nendstream\nendobj\n")


def _classic_xref(
    b: _Builder, max_num: int, trailer: Dict[str, Any]
) -> None:
    start = len(b.buf)
    lines = [b"xref", f"0 {max_num + 1}".encode()]
    lines.append(b"0000000000 65535 f ")
    for n in range(1, max_num + 1):
        off = b.offsets.get(n, 0)
        kind = b"n" if n in b.offsets else b"f"
        lines.append(f"{off:010d} 00000 ".encode() + kind + b" ")
    b.buf.extend(b"\n".join(lines) + b"\n")
    b.buf.extend(b"trailer\n" + _ser(trailer).encode("latin-1") + b"\n")
    b.buf.extend(f"startxref\n{start}\n%%EOF\n".encode())


def _xref_stream(
    b: _Builder,
    num: int,
    entries: Dict[int, Tuple[int, int, int]],
    trailer: Dict[str, Any],
) -> None:
    """entries: obj → (type, f2, f3); self entry added automatically."""
    self_off = len(b.buf)
    entries = dict(entries)
    entries[0] = (0, 0, 65535)
    entries[num] = (1, self_off, 0)
    size = max(entries) + 1
    rec = 1 + 4 + 2
    rows = bytearray()
    for n in range(size):
        t, f2, f3 = entries.get(n, (0, 0, 0))
        rows.append(t)
        rows.extend(f2.to_bytes(4, "big"))
        rows.extend(f3.to_bytes(2, "big"))
    # PNG Up predictor, then Flate — exercises /DecodeParms on read
    pred = bytearray()
    prev = bytes(rec)
    for i in range(0, len(rows), rec):
        row = rows[i : i + rec]
        pred.append(2)
        pred.extend((row[j] - prev[j]) & 0xFF for j in range(rec))
        prev = bytes(row)
    data = zlib.compress(bytes(pred))
    sdict: Dict[str, Any] = {
        "Type": Name("XRef"),
        "Size": size,
        "W": [1, 4, 2],
        "Filter": Name("FlateDecode"),
        "DecodeParms": {"Predictor": 12, "Columns": rec},
    }
    sdict.update(trailer)
    b.add_stream(num, sdict, data)
    b.buf.extend(f"startxref\n{self_off}\n%%EOF\n".encode())


def build_pdf(
    pages: Sequence[Sequence[Block]],
    *,
    xref: str = "table",
    objstm: bool = False,
    filters: Sequence[str] = (),
    strmode: str = "lit",
    ops: str = "td",
    cm_shift: Optional[Tuple[float, float]] = None,
    incremental: bool = False,
    info: Optional[Dict[str, str]] = None,
    encrypt: Optional[str] = None,
    user_pwd: bytes = b"",
) -> bytes:
    """Serialize ``pages`` (lists of ``(x, y, text)`` blocks) to a real,
    conformant PDF through the selected container mechanisms.

    ``encrypt``: None | 'rc4' (V2/R3 128-bit) | 'aes128' (V4/R4 AESV2)
    | 'aes256' (V5/R6 AESV3) — owner pwd 'owner', user password
    ``user_pwd`` (empty by default), deterministic /ID and IVs so
    differential oracles stay closed-form.  Not combinable with xref
    streams / object streams / incremental (those families pin their
    own mechanisms unencrypted)."""
    if incremental:
        if len(pages) < 2:
            incremental = False
        else:
            base = build_pdf(
                pages[:-1], filters=filters, strmode=strmode, ops=ops, info=info
            )
            return base + _incremental_update(
                base, pages, filters=filters, strmode=strmode, ops=ops
            )

    if encrypt and (xref == "stream" or objstm):
        raise ValueError("encrypt not combinable with xref-stream modes")
    version = "1.5" if (xref == "stream" or objstm) else "1.4"
    if encrypt == "aes128":
        version = "1.6"
    elif encrypt == "aes256":
        version = "1.7"
    b = _Builder(version)
    n_pages = len(pages)
    hexmode = strmode == "hex"
    charmap = _diffenc_map(pages) if strmode == "diffenc" else None

    # object numbering
    CATALOG, PAGES, FONT = 1, 2, 3
    next_num = 4
    tou_num = cid_num = None
    if hexmode:
        tou_num, cid_num = next_num, next_num + 1
        next_num += 2
    page_nums = []
    content_nums = []
    for _ in range(n_pages):
        page_nums.append(next_num)
        content_nums.append(next_num + 1)
        next_num += 2
    info_num = None
    if info:
        info_num = next_num
        next_num += 1
    enc_num = None
    handler = None
    id0 = b""
    if encrypt:
        from .pdfcrypt import (
            make_encrypt_aes128,
            make_encrypt_aes256,
            make_encrypt_rc4,
        )

        id0 = hashlib.md5(
            "\x1f".join(t for page in pages for _, _, t in page).encode(
                "utf-8", "replace"
            )
            + encrypt.encode()
        ).digest()
        maker = {
            "rc4": make_encrypt_rc4,
            "aes128": make_encrypt_aes128,
            "aes256": make_encrypt_aes256,
        }[encrypt]
        enc_dict, handler = maker(id0, user_pwd=user_pwd)
        enc_num = next_num
        next_num += 1

    catalog = {"Type": Name("Catalog"), "Pages": Ref(PAGES, 0)}
    pages_dict = {
        "Type": Name("Pages"),
        "Kids": [Ref(p, 0) for p in page_nums],
        "Count": n_pages,
        "Resources": {"Font": {"F1": Ref(FONT, 0)}},  # inherited by kids
        "MediaBox": [0, 0, 612, 792],
    }
    if hexmode:
        font: Dict[str, Any] = {
            "Type": Name("Font"),
            "Subtype": Name("Type0"),
            "BaseFont": Name("Identity"),
            "Encoding": Name("Identity-H"),
            "DescendantFonts": [Ref(cid_num, 0)],
            "ToUnicode": Ref(tou_num, 0),
        }
        cidfont = {
            "Type": Name("Font"),
            "Subtype": Name("CIDFontType2"),
            "BaseFont": Name("Identity"),
            "CIDSystemInfo": {
                "Registry": b"Adobe",
                "Ordering": b"Identity",
                "Supplement": 0,
            },
        }
    elif charmap is not None:
        # /Differences remap: codes 33.. point at uniXXXX glyph names
        diffs: List[Any] = [33]
        for c in sorted(charmap, key=charmap.get):
            diffs.append(_glyph_name(c))
        font = {
            "Type": Name("Font"),
            "Subtype": Name("Type1"),
            "BaseFont": Name("Helvetica"),
            "Encoding": {
                "Type": Name("Encoding"),
                "BaseEncoding": Name("WinAnsiEncoding"),
                "Differences": diffs,
            },
        }
    else:
        font = {
            "Type": Name("Font"),
            "Subtype": Name("Type1"),
            "BaseFont": Name("Helvetica"),
        }
    page_dicts = [
        {
            "Type": Name("Page"),
            "Parent": Ref(PAGES, 0),
            "Contents": Ref(cn, 0),
        }
        for cn in content_nums
    ]

    plain: Dict[int, Any] = {CATALOG: catalog, PAGES: pages_dict, FONT: font}
    if hexmode:
        plain[cid_num] = cidfont
    for pn, pd in zip(page_nums, page_dicts):
        plain[pn] = pd
    if info_num is not None:
        plain[info_num] = {k: v.encode("latin-1", "replace") for k, v in info.items()}
    if enc_num is not None:
        plain[enc_num] = _nameify(enc_dict)

    streams: List[Tuple[int, Dict[str, Any], bytes]] = []
    if hexmode:
        used = sorted({ord(c) if ord(c) <= 0xFFFF else 0xFFFD
                       for page in pages for _, _, t in page for c in t})
        streams.append((tou_num, {}, _tounicode_cmap(used)))
    for cn, page in zip(content_nums, pages):
        raw = _content_ops(page, strmode, ops, cm_shift, charmap)
        data, filt = _encode_stream(raw, filters)
        sd: Dict[str, Any] = {}
        if filt is not None:
            sd["Filter"] = filt
        streams.append((cn, sd, data))

    trailer: Dict[str, Any] = {"Root": Ref(CATALOG, 0)}
    if info_num is not None:
        trailer["Info"] = Ref(info_num, 0)
    if enc_num is not None:
        trailer["Encrypt"] = Ref(enc_num, 0)
        trailer["ID"] = [id0, id0]

    if objstm:
        # non-stream objects live in one compressed object stream
        stm_num = next_num
        xref_num = next_num + 1
        body = bytearray()
        offs = []
        for onum in sorted(plain):
            offs.append((onum, len(body)))
            body.extend(_ser(plain[onum]).encode("latin-1"))
            body.extend(b"\n")
        header = " ".join(f"{n} {o}" for n, o in offs).encode() + b"\n"
        stm_data = zlib.compress(header + bytes(body))
        first = len(header)
        for snum, sd, data in streams:
            b.add_stream(snum, sd, data)
        b.add_stream(
            stm_num,
            {
                "Type": Name("ObjStm"),
                "N": len(offs),
                "First": first,
                "Filter": Name("FlateDecode"),
            },
            stm_data,
        )
        entries: Dict[int, Tuple[int, int, int]] = {}
        for idx, (onum, _) in enumerate(offs):
            entries[onum] = (2, stm_num, idx)
        for snum, _, _ in streams:
            entries[snum] = (1, b.offsets[snum], 0)
        entries[stm_num] = (1, b.offsets[stm_num], 0)
        _xref_stream(b, xref_num, entries, trailer)
        return bytes(b.buf)

    for onum in sorted(plain):
        body = plain[onum]
        if handler is not None and onum != enc_num:
            body = _enc_strings(body, handler, onum)
        b.add_object(onum, _ser(body))
    for snum, sd, data in streams:
        if handler is not None:
            data = handler.encrypt_stream(data, snum, 0)
        b.add_stream(snum, sd, data)

    if xref == "stream":
        xref_num = next_num
        entries = {n: (1, off, 0) for n, off in b.offsets.items()}
        _xref_stream(b, xref_num, entries, trailer)
    else:
        trailer["Size"] = next_num
        _classic_xref(b, next_num - 1, trailer)
    return bytes(b.buf)


def _nameify(obj: Any) -> Any:
    """str → Name recursively (the crypt makers return plain strings
    for /Filter /CFM etc.; bytes stay literal strings)."""
    if isinstance(obj, str) and not isinstance(obj, Name):
        return Name(obj)
    if isinstance(obj, dict):
        return {k: _nameify(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_nameify(v) for v in obj]
    return obj


def _enc_strings(obj: Any, handler, num: int) -> Any:
    if isinstance(obj, bytes):
        return handler.encrypt_string(obj, num, 0)
    if isinstance(obj, dict):
        return {k: _enc_strings(v, handler, num) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_enc_strings(v, handler, num) for v in obj]
    return obj


def _incremental_update(
    base: bytes,
    pages: Sequence[Sequence[Block]],
    *,
    filters: Sequence[str],
    strmode: str,
    ops: str,
) -> bytes:
    """An update section appending the last page: a replacement /Pages
    object, the new page + content objects, and an xref section whose
    trailer chains to the base via /Prev."""
    import re as _re

    m = None
    for m in _re.finditer(rb"startxref\s+(\d+)", base[-1024:]):
        pass
    prev_off = int(m.group(1)) if m else 0
    # object numbers: base used 1..K; find K from its trailer /Size
    sm = None
    for sm in _re.finditer(rb"/Size\s+(\d+)", base):
        pass
    size = int(sm.group(1)) if sm else 4
    new_page = size
    new_content = size + 1
    PAGES = 2

    n_total = len(pages)
    kids = " ".join(
        f"{3 + 1 + 2 * i} 0 R" for i in range(n_total - 1)
    )  # base page objects: 4, 6, 8, ... (font=3, then page/content pairs)
    upd = bytearray()
    offsets: Dict[int, int] = {}

    def add_obj(num: int, body: bytes) -> None:
        offsets[num] = len(base) + len(upd)
        upd.extend(f"{num} 0 obj\n".encode() + body + b"\nendobj\n")

    pages_body = (
        f"<< /Type /Pages /Kids [{kids} {new_page} 0 R] /Count {n_total} "
        f"/Resources << /Font << /F1 3 0 R >> >> "
        f"/MediaBox [0 0 612 792] >>"
    ).encode()
    add_obj(PAGES, pages_body)
    add_obj(
        new_page,
        f"<< /Type /Page /Parent 2 0 R /Contents {new_content} 0 R >>".encode(),
    )
    raw = _content_ops(pages[-1], strmode, ops, None)
    data, filt = _encode_stream(raw, filters)
    fs = f" /Filter {_ser(filt)}" if filt is not None else ""
    offsets[new_content] = len(base) + len(upd)
    upd.extend(
        f"{new_content} 0 obj\n<< /Length {len(data)}{fs} >>\nstream\n".encode()
    )
    upd.extend(data)
    upd.extend(b"\nendstream\nendobj\n")

    xref_start = len(base) + len(upd)
    lines = [b"xref", b"0 1", b"0000000000 65535 f "]
    for num in sorted(offsets):
        lines.append(f"{num} 1".encode())
        lines.append(f"{offsets[num]:010d} 00000 n ".encode())
    upd.extend(b"\n".join(lines) + b"\n")
    upd.extend(
        (
            f"trailer\n<< /Size {new_content + 1} /Root 1 0 R /Prev {prev_off} >>\n"
            f"startxref\n{xref_start}\n%%EOF\n"
        ).encode()
    )
    return bytes(upd)


#: The differential families — every family must extract identical spans.
PDF_FAMILIES: Dict[str, Dict[str, Any]] = {
    "classic": {},
    "flate": {"filters": ("FlateDecode",)},
    "lzw": {"filters": ("LZWDecode",)},
    "rl": {"filters": ("RunLengthDecode",)},
    "ahx": {"filters": ("ASCIIHexDecode",)},
    "a85flate": {"filters": ("ASCII85Decode", "FlateDecode")},
    "xrefstm": {"xref": "stream", "filters": ("FlateDecode",)},
    "objstm": {"objstm": True, "filters": ("FlateDecode",)},
    "octal": {"strmode": "octal"},
    "tounicode": {"strmode": "hex", "filters": ("FlateDecode",)},
    "tm": {"ops": "tm"},
    "star": {"ops": "star"},
    "cm": {"ops": "tm", "cm_shift": (20.0, 30.0)},
    "incr": {"incremental": True},
    "diffenc": {"strmode": "diffenc", "filters": ("FlateDecode",)},
    "rc4": {"encrypt": "rc4", "filters": ("FlateDecode",)},
    "pwrc4": {"encrypt": "rc4", "filters": ("FlateDecode",), "user_pwd": b"s3cret"},
    "aes128": {"encrypt": "aes128", "filters": ("FlateDecode",)},
    "aes256": {"encrypt": "aes256", "filters": ("FlateDecode",)},
}
