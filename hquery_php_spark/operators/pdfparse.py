"""Real PDF structural parser — stdlib-only, fault-tolerant.

This replaces the round-2 regex scan over ``stream...endstream`` with
the actual PDF object model (ISO 32000-1 / the public PDF 1.7 spec):

* **Lexer / object parser** (§7.3): dictionaries, arrays, names with
  ``#xx`` escapes, literal strings with octal escapes and line
  continuations, hex strings, numbers, booleans, null, indirect
  references ``n g R``.
* **Cross-reference** (§7.5): classic xref tables with subsections and
  ``/Prev`` incremental-update chains, **cross-reference streams**
  (``/Type /XRef``, ``/W`` field widths, ``/Index``), hybrid files
  (``/XRefStm``), and a brute-force object rescue scan when the xref
  is broken — fault tolerance in the same spirit as the HTML engine
  (reference: hQuery's bad-HTML recovery, src/hQuery/HTML_Parser.php).
* **Filters** (§7.4): FlateDecode, LZWDecode (MSB-first variable
  width, EarlyChange), ASCIIHexDecode, ASCII85Decode,
  RunLengthDecode, filter *chains*, and ``/DecodeParms`` predictors
  (TIFF 2 and the PNG 10-15 row filters — the same unfilters the PNG
  codec in multimodal.py implements for images).
* **Object streams** (§7.5.7, ``/Type /ObjStm``) — where modern
  digitally-born PDFs keep most of their objects.
* **Page tree walk** (§7.7.3): ``/Root → /Pages → /Kids`` recursion
  with attribute inheritance and cycle guards; per-page content
  stream arrays concatenated in order.
* **Content-stream text interpreter** (§9.4): operand-stack machine
  over ``BT/ET Td TD TL T* Tm Tj ' " TJ Tf`` with the full text-matrix
  semantics (T_m / T_lm), plus ``q/Q/cm`` CTM tracking so translated/
  scaled text reports device-space coordinates.
* **Font text decoding** (§9.10): ``/ToUnicode`` CMap parsing
  (codespace ranges, ``bfchar``/``bfrange`` incl. array form),
  two-byte codes for Type0 fonts; Latin-1 fallback for simple fonts
  without a CMap (covers the WinAnsi/PDFDoc ASCII overlap).

No external validator exists in this container (no poppler/mupdf/
qpdf), so conformance is pinned the same way as the 12-bit JPEG leg:
several *independent* writer paths in ``pdfwrite.py`` (classic xref vs
xref stream vs object streams; literal vs octal-escaped vs
hex+ToUnicode strings; Td vs Tm vs TD/T* positioning; five filter
chains) must decode to byte-identical span sequences, plus
hand-derived spec-example goldens and a byte-soup fuzz.
"""

from __future__ import annotations

import base64
import re
import zlib
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

__all__ = [
    "Name",
    "Ref",
    "PdfStream",
    "PdfError",
    "Lexer",
    "PdfDocument",
    "apply_filters",
    "lzw_decode",
    "lzw_encode",
    "parse_tounicode",
    "extract_text_spans",
]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfError(ValueError):
    pass


class Name(str):
    """A PDF name object (distinct from a text string)."""

    __slots__ = ()


class Ref(NamedTuple):
    num: int
    gen: int


class PdfStream:
    """A stream object: its dictionary plus raw (still-encoded) bytes."""

    __slots__ = ("sdict", "raw")

    def __init__(self, sdict: Dict[str, Any], raw: bytes):
        self.sdict = sdict
        self.raw = raw


# --------------------------------------------------------------------- #
# Lexer / object parser (§7.3)

_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_WORD_RE = re.compile(rb"[A-Za-z'\"*]+\d*")


class Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                e = d.find(b"\n", self.pos)
                e2 = d.find(b"\r", self.pos)
                if e < 0 or (0 <= e2 < e):
                    e = e2
                self.pos = n if e < 0 else e + 1
            else:
                return

    def _name(self) -> Name:
        d, n = self.data, len(self.data)
        self.pos += 1  # '/'
        out = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < n:  # '#xx'
                try:
                    out.append(int(d[self.pos + 1 : self.pos + 3], 16))
                    self.pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            self.pos += 1
        return Name(out.decode("latin-1"))

    def _literal_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1  # '('
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                if self.pos + 1 >= n:
                    self.pos += 1
                    break
                nxt = d[self.pos + 1]
                if 0x30 <= nxt <= 0x37:  # \ooo: 1-3 octal digits
                    j = self.pos + 1
                    oct_s = bytearray()
                    while j < n and len(oct_s) < 3 and 0x30 <= d[j] <= 0x37:
                        oct_s.append(d[j])
                        j += 1
                    out.append(int(oct_s, 8) & 0xFF)
                    self.pos = j
                elif nxt in b"\r\n":  # line continuation
                    self.pos += 2
                    if nxt == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    mapped = {
                        0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09,
                        0x62: 0x08, 0x66: 0x0C,
                        0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C,
                    }
                    out.append(mapped.get(nxt, nxt))
                    self.pos += 2
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            elif c == 0x0D:  # raw CR / CRLF → LF (§7.3.4.2)
                out.append(0x0A)
                self.pos += 1
                if self.pos < n and d[self.pos] == 0x0A:
                    self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)  # unterminated: fault-tolerant best effort

    def _hex_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1  # '<'
        digits = bytearray()
        while self.pos < n:
            c = d[self.pos]
            self.pos += 1
            if c == 0x3E:  # '>'
                break
            if c in _WS:
                continue
            digits.append(c)
        if len(digits) % 2:
            digits.append(0x30)
        try:
            return bytes.fromhex(digits.decode("latin-1"))
        except ValueError:
            return b""

    def read_object(self) -> Any:
        """Read one object; raises PdfError at EOF / junk."""
        self.skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            raise PdfError("EOF")
        c = d[self.pos]
        if c == 0x3C:  # '<'
            if self.pos + 1 < n and d[self.pos + 1] == 0x3C:
                self.pos += 2
                out: Dict[str, Any] = {}
                while True:
                    self.skip_ws()
                    if self.pos + 1 < n and d[self.pos : self.pos + 2] == b">>":
                        self.pos += 2
                        return out
                    if self.pos >= n:
                        return out  # truncated dict: best effort
                    if d[self.pos] != 0x2F:
                        # junk key — skip a byte to make progress
                        self.pos += 1
                        continue
                    key = self._name()
                    out[str(key)] = self.read_object()
            return self._hex_string()
        if c == 0x28:
            return self._literal_string()
        if c == 0x2F:
            return self._name()
        if c == 0x5B:  # '['
            self.pos += 1
            arr: List[Any] = []
            while True:
                self.skip_ws()
                if self.pos >= n:
                    return arr
                if d[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.read_object())
        if c == 0x5D or c == 0x3E:  # stray close — consume
            self.pos += 1
            raise PdfError("stray delimiter")
        m = _NUM_RE.match(d, self.pos)
        if m and (0x30 <= c <= 0x39 or c in b"+-."):
            self.pos = m.end()
            tok = m.group()
            if b"." in tok:
                return float(tok)
            v = int(tok)
            # lookahead for 'g R' (indirect reference)
            save = self.pos
            self.skip_ws()
            m2 = _NUM_RE.match(d, self.pos)
            if m2 and b"." not in m2.group():
                p2 = m2.end()
                lx = Lexer(d, p2)
                lx.skip_ws()
                if lx.pos < n and d[lx.pos : lx.pos + 1] == b"R" and (
                    lx.pos + 1 >= n or d[lx.pos + 1] in _WS or d[lx.pos + 1] in _DELIM
                ):
                    self.pos = lx.pos + 1
                    return Ref(v, int(m2.group()))
            self.pos = save
            return v
        m = _WORD_RE.match(d, self.pos)
        if m:
            self.pos = m.end()
            w = m.group()
            if w == b"true":
                return True
            if w == b"false":
                return False
            if w == b"null":
                return None
            return ("op", w.decode("latin-1"))  # content-stream operator
        raise PdfError(f"unexpected byte {c:#x} at {self.pos}")


# --------------------------------------------------------------------- #
# Filters (§7.4)


def _png_unpredict(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (colors * bpc * columns + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    while pos + 1 <= len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + rowlen])
        if len(row) < rowlen:
            row.extend(b"\0" * (rowlen - len(row)))
        pos += 1 + rowlen
        if ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[i] = (row[i] + pred) & 0xFF
        out.extend(row)
        prev = row
    return bytes(out)


def _tiff_unpredict(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    if bpc != 8:
        return data  # only the common 8-bit case
    rowlen = colors * columns
    out = bytearray(data)
    for r0 in range(0, len(out) - rowlen + 1, rowlen):
        for i in range(r0 + colors, r0 + rowlen):
            out[i] = (out[i] + out[i - colors]) & 0xFF
    return bytes(out)


def _apply_predictor(data: bytes, parms: Dict[str, Any]) -> bytes:
    pred = parms.get("Predictor", 1)
    if not isinstance(pred, int) or pred <= 1:
        return data
    colors = parms.get("Colors", 1)
    bpc = parms.get("BitsPerComponent", 8)
    columns = parms.get("Columns", 1)
    if pred == 2:
        return _tiff_unpredict(data, colors, bpc, columns)
    return _png_unpredict(data, colors, bpc, columns)


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF/TIFF LZW (§7.4.4): MSB-first, 9→12 bit codes, 256=Clear,
    257=EOD; ``early_change`` widens one code early (the default)."""
    out = bytearray()
    table: List[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = nbits = 0
    prev: Optional[bytes] = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Real dictionary LZW encoder, inverse of :func:`lzw_decode`."""
    table: Dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    emit(256)
    w = b""
    for byte in data:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code + early_change - 1 >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4096 - 1:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w])
    emit(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rl_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        l = data[i]
        if l == 128:
            break
        if l < 128:
            out.extend(data[i + 1 : i + 2 + l])
            i += 2 + l
        else:
            if i + 1 < n:
                out.extend(data[i + 1 : i + 2] * (257 - l))
            i += 2
    return bytes(out)


def rl_encode(data: bytes) -> bytes:
    """RunLengthDecode inverse — runs ≥3 become (257-n, byte) pairs."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i + run
            while j < n and j - i < 128:
                r2 = 1
                while j + r2 < n and r2 < 3 and data[j + r2] == data[j]:
                    r2 += 1
                if r2 >= 3:
                    break
                j += 1
            out.append(j - i - 1)
            out.extend(data[i:j])
            i = j
    out.append(128)
    return bytes(out)


def _ahx_decode(data: bytes) -> bytes:
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    digits = bytes(c for c in data if c not in _WS)
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("latin-1"))
    except ValueError:
        return b""


def _a85_decode(data: bytes) -> bytes:
    data = bytes(c for c in data if c not in _WS)
    if data.startswith(b"<~"):
        data = data[2:]
    if data.endswith(b"~>"):
        data = data[:-2]
    try:
        return base64.a85decode(data, adobe=False)
    except ValueError:
        return b""


def apply_filters(
    raw: bytes, filt: Any, parms: Any, early_change_default: int = 1
) -> bytes:
    """Apply a ``/Filter`` entry (name or array) with ``/DecodeParms``."""
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    parms_list = parms if isinstance(parms, list) else [parms] * len(filters)
    data = raw
    for f, p in zip(filters, list(parms_list) + [None] * len(filters)):
        p = p if isinstance(p, dict) else {}
        name = str(f)
        if name in ("FlateDecode", "Fl"):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                try:  # truncated stream: salvage what inflates
                    do = zlib.decompressobj()
                    data = do.decompress(data)
                except zlib.error:
                    return b""
            data = _apply_predictor(data, p)
        elif name in ("LZWDecode", "LZW"):
            data = lzw_decode(data, p.get("EarlyChange", early_change_default))
            data = _apply_predictor(data, p)
        elif name in ("ASCIIHexDecode", "AHx"):
            data = _ahx_decode(data)
        elif name in ("ASCII85Decode", "A85"):
            data = _a85_decode(data)
        elif name in ("RunLengthDecode", "RL"):
            data = _rl_decode(data)
        elif name == "Crypt":
            continue  # /Identity only
        else:
            raise PdfError(f"unsupported filter {name}")
    return data


# --------------------------------------------------------------------- #
# Document: xref, objects, object streams (§7.5)

_OBJ_HDR_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_XREF_ENT_RE = re.compile(rb"(\d{10})\s(\d{5})\s([nf])")


class PdfDocument:
    def __init__(self, data: bytes, password: bytes = b""):
        self.data = data
        self._password = password
        self.version = (
            data[5:8].decode("latin-1", "replace")
            if data.startswith(b"%PDF-")
            else None
        )
        # obj num -> ("n", offset) | ("c", objstm_num, idx)
        self.xref: Dict[int, Tuple] = {}
        self.trailer: Dict[str, Any] = {}
        self._cache: Dict[int, Any] = {}
        self._objstms: Dict[int, Dict[int, Any]] = {}
        self._crypt = None
        self._encrypt_num: Optional[int] = None
        try:
            self._load_xref()
        except PdfError:
            self.xref = {}
        if not self.xref or "Root" not in self.trailer:
            self._rescue_scan()
        self._init_crypt()

    def _init_crypt(self) -> None:
        """Standard security handler (§7.6) — empty-user-password files
        decrypt transparently, a supplied ``password`` is tried as user
        then owner; anything else leaves the handler None and the
        document decodes to nothing (fault tolerance)."""
        enc_ref = self.trailer.get("Encrypt")
        if enc_ref is None:
            return
        if isinstance(enc_ref, Ref):
            self._encrypt_num = enc_ref.num
        enc = self.get(enc_ref)
        if isinstance(enc, dict):
            ids = self.trailer.get("ID")
            id0 = (
                ids[0]
                if isinstance(ids, list) and ids and isinstance(ids[0], bytes)
                else b""
            )
            from .pdfcrypt import build_security

            self._crypt = build_security(enc, id0, self._password)

    def _decrypt_obj(self, obj: Any, num: int, gen: int = 0) -> Any:
        if isinstance(obj, bytes):
            return self._crypt.decrypt_string(obj, num, gen)
        if isinstance(obj, list):
            return [self._decrypt_obj(x, num, gen) for x in obj]
        if isinstance(obj, dict):
            return {k: self._decrypt_obj(v, num, gen) for k, v in obj.items()}
        if isinstance(obj, PdfStream):
            if str(obj.sdict.get("Type")) == "XRef":
                return obj  # xref streams are never encrypted (§7.5.8.2)
            return PdfStream(
                self._decrypt_obj(obj.sdict, num, gen),
                self._crypt.decrypt_stream(obj.raw, num, gen),
            )
        return obj

    # ---- xref loading ------------------------------------------------ #

    def _load_xref(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PdfError("no startxref")
        todo = [int(m.group(1))]
        seen = set()
        while todo:
            off = todo.pop(0)
            if off in seen or off >= len(self.data):
                continue
            seen.add(off)
            lx = Lexer(self.data, off)
            lx.skip_ws()
            if self.data[lx.pos : lx.pos + 4] == b"xref":
                trailer = self._load_xref_table(lx.pos + 4)
            else:
                trailer = self._load_xref_stream(off)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            # hybrid: the table's XRefStm fills before the Prev chain
            if "XRefStm" in trailer and isinstance(trailer["XRefStm"], int):
                todo.insert(0, trailer["XRefStm"])
            if "Prev" in trailer and isinstance(trailer["Prev"], int):
                todo.append(trailer["Prev"])

    def _load_xref_table(self, pos: int) -> Dict[str, Any]:
        d = self.data
        lx = Lexer(d, pos)
        while True:
            lx.skip_ws()
            if d[lx.pos : lx.pos + 7] == b"trailer":
                lx.pos += 7
                t = lx.read_object()
                return t if isinstance(t, dict) else {}
            m = re.match(rb"(\d+)\s+(\d+)", d[lx.pos : lx.pos + 64])
            if not m:
                return {}
            start, count = int(m.group(1)), int(m.group(2))
            lx.pos += m.end()
            for i in range(count):
                em = _XREF_ENT_RE.match(d, (lx.pos + 1 if d[lx.pos] in _WS else lx.pos))
                if not em:
                    lx.skip_ws()
                    em = _XREF_ENT_RE.match(d, lx.pos)
                    if not em:
                        return {}
                num = start + i
                if em.group(3) == b"n" and num not in self.xref:
                    self.xref[num] = ("n", int(em.group(1)))
                lx.pos = em.end()

    def _load_xref_stream(self, off: int) -> Dict[str, Any]:
        obj = self._parse_obj_at(off)
        if not isinstance(obj, PdfStream):
            raise PdfError("xref offset is not a stream")
        sd = obj.sdict
        data = apply_filters(obj.raw, sd.get("Filter"), sd.get("DecodeParms"))
        w = sd.get("W") or []
        if len(w) < 3:
            raise PdfError("bad /W")
        w1, w2, w3 = (int(x) for x in w[:3])
        size = int(sd.get("Size", 0))
        index = sd.get("Index") or [0, size]
        rec = w1 + w2 + w3
        pos = 0
        for k in range(0, len(index) - 1, 2):
            start, count = int(index[k]), int(index[k + 1])
            for i in range(count):
                if pos + rec > len(data):
                    break
                f1 = int.from_bytes(data[pos : pos + w1], "big") if w1 else 1
                f2 = int.from_bytes(data[pos + w1 : pos + w1 + w2], "big")
                f3 = int.from_bytes(data[pos + w1 + w2 : pos + rec], "big")
                pos += rec
                num = start + i
                if num in self.xref:
                    continue
                if f1 == 1:
                    self.xref[num] = ("n", f2)
                elif f1 == 2:
                    self.xref[num] = ("c", f2, f3)
        return {k: v for k, v in sd.items() if k not in ("W", "Index", "Filter")}

    def _rescue_scan(self) -> None:
        """Broken xref: scan every ``N G obj`` (later wins = newer)."""
        for m in _OBJ_HDR_RE.finditer(self.data):
            self.xref[int(m.group(1))] = ("n", m.start())
        self._cache.clear()
        if "Root" not in self.trailer:
            tm = None
            for tm in re.finditer(rb"trailer", self.data):
                pass
            if tm is not None:
                lx = Lexer(self.data, tm.end())
                try:
                    t = lx.read_object()
                    if isinstance(t, dict):
                        for k, v in t.items():
                            self.trailer.setdefault(k, v)
                except PdfError:
                    pass
        if "Root" not in self.trailer:
            for num in sorted(self.xref):
                try:
                    o = self.get_object(num)
                except PdfError:
                    continue
                if isinstance(o, dict) and str(o.get("Type")) == "Catalog":
                    self.trailer["Root"] = Ref(num, 0)
                    break

    # ---- object access ------------------------------------------------ #

    def get(self, obj: Any, depth: int = 0) -> Any:
        """Resolve an indirect reference (possibly chained)."""
        while isinstance(obj, Ref) and depth < 32:
            obj = self.get_object(obj.num)
            depth += 1
        return obj

    def get_object(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None:
            return None
        if ent[0] == "n":
            obj = self._parse_obj_at(ent[1], expect=num)
            if self._crypt is not None and num != self._encrypt_num:
                obj = self._decrypt_obj(obj, num)
        else:
            # objects inside object streams are NOT individually
            # encrypted — the ObjStm stream itself was (§7.5.7)
            obj = self._objstm_object(ent[1], ent[2], num)
        self._cache[num] = obj
        return obj

    def _parse_obj_at(self, off: int, expect: Optional[int] = None) -> Any:
        d = self.data
        m = _OBJ_HDR_RE.match(d, off) or _OBJ_HDR_RE.search(d, off, off + 64)
        if not m:
            raise PdfError(f"no obj header at {off}")
        if expect is not None and int(m.group(1)) != expect:
            # stale offset — rescue by scanning for the right header
            for m2 in _OBJ_HDR_RE.finditer(d):
                if int(m2.group(1)) == expect:
                    m = m2
            if int(m.group(1)) != expect:
                raise PdfError(f"object {expect} not found")
        lx = Lexer(d, m.end())
        obj = lx.read_object()
        lx.skip_ws()
        if isinstance(obj, dict) and d[lx.pos : lx.pos + 6] == b"stream":
            p = lx.pos + 6
            if d[p : p + 2] == b"\r\n":
                p += 2
            elif p < len(d) and d[p] in b"\n\r":
                p += 1
            length = self.get(obj.get("Length"))
            raw = None
            if isinstance(length, int) and 0 <= length <= len(d) - p:
                cand = d[p : p + length]
                tail = d[p + length : p + length + 24]
                if re.match(rb"\s*endstream", tail):
                    raw = cand
            if raw is None:  # bad /Length: recover via endstream scan
                e = d.find(b"endstream", p)
                if e < 0:
                    e = len(d)
                cand = d[p:e]
                if cand.endswith(b"\r\n"):
                    cand = cand[:-2]
                elif cand.endswith(b"\n") or cand.endswith(b"\r"):
                    cand = cand[:-1]
                raw = cand
            return PdfStream(obj, raw)
        return obj

    def _objstm_object(self, stm_num: int, idx: int, want: int) -> Any:
        tbl = self._objstms.get(stm_num)
        if tbl is None:
            tbl = {}
            stm = self.get_object(stm_num)
            if isinstance(stm, PdfStream):
                sd = stm.sdict
                data = apply_filters(stm.raw, sd.get("Filter"), sd.get("DecodeParms"))
                n = int(self.get(sd.get("N")) or 0)
                first = int(self.get(sd.get("First")) or 0)
                hdr = Lexer(data, 0)
                pairs = []
                try:
                    for _ in range(n):
                        onum = hdr.read_object()
                        ooff = hdr.read_object()
                        pairs.append((int(onum), int(ooff)))
                except (PdfError, TypeError, ValueError):
                    pass
                for onum, ooff in pairs:
                    try:
                        tbl[onum] = Lexer(data, first + ooff).read_object()
                    except PdfError:
                        tbl[onum] = None
            self._objstms[stm_num] = tbl
        return tbl.get(want)

    def stream_data(self, obj: Any) -> bytes:
        obj = self.get(obj)
        if not isinstance(obj, PdfStream):
            return b""
        return apply_filters(
            obj.raw,
            self.get(obj.sdict.get("Filter")),
            self.get(obj.sdict.get("DecodeParms")),
        )

    # ---- page tree (§7.7.3) ------------------------------------------- #

    _INHERIT = ("Resources", "MediaBox", "Rotate", "CropBox")

    def pages(self) -> List[Dict[str, Any]]:
        root = self.get(self.trailer.get("Root"))
        if not isinstance(root, dict):
            return self._pages_rescue()
        top = self.get(root.get("Pages"))
        if not isinstance(top, dict):
            return self._pages_rescue()
        out: List[Dict[str, Any]] = []
        seen: set = set()

        def walk(node: Dict[str, Any], inherited: Dict[str, Any]) -> None:
            if len(out) > 100_000:
                return
            inh = dict(inherited)
            for k in self._INHERIT:
                if k in node:
                    inh[k] = node[k]
            t = str(node.get("Type", ""))
            kids = self.get(node.get("Kids"))
            if t == "Page" or (t != "Pages" and kids is None):
                page = dict(inh)
                page.update(node)
                out.append(page)
                return
            if not isinstance(kids, list):
                return
            for kid in kids:
                key = kid if isinstance(kid, Ref) else id(kid)
                if key in seen:
                    continue
                seen.add(key)
                k = self.get(kid)
                if isinstance(k, dict):
                    walk(k, inh)

        walk(top, {})
        return out or self._pages_rescue()

    def _pages_rescue(self) -> List[Dict[str, Any]]:
        out = []
        for num in sorted(self.xref):
            try:
                o = self.get_object(num)
            except PdfError:
                continue
            if isinstance(o, dict) and str(o.get("Type")) == "Page":
                out.append(o)
        return out

    def page_content(self, page: Dict[str, Any]) -> bytes:
        c = self.get(page.get("Contents"))
        if isinstance(c, PdfStream):
            return self.stream_data(c)
        if isinstance(c, list):
            return b"\n".join(self.stream_data(x) for x in c)
        return b""

    def info(self) -> Dict[str, str]:
        """/Info metadata with PDF text-string decoding (§7.9.2.2)."""
        info = self.get(self.trailer.get("Info"))
        out: Dict[str, str] = {}
        if isinstance(info, dict):
            for k, v in info.items():
                v = self.get(v)
                if isinstance(v, bytes):
                    out[k] = decode_text_string(v)
                elif isinstance(v, str):
                    out[k] = str(v)
        return out


def decode_text_string(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", "replace")
    if b.startswith(b"\xef\xbb\xbf"):
        return b[3:].decode("utf-8", "replace")
    return b.decode("latin-1")


# --------------------------------------------------------------------- #
# ToUnicode CMaps (§9.10.3)

_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f]*)>")


def parse_tounicode(data: bytes) -> Tuple[int, Dict[int, str]]:
    """→ (code_bytes, {code: unicode string}).

    Parses ``begincodespacerange`` (for the code byte width) and all
    ``bfchar`` / ``bfrange`` sections (including the array form)."""
    code_bytes = 1
    m = re.search(
        rb"begincodespacerange(.*?)endcodespacerange", data, re.S
    )
    if m:
        toks = _HEXTOK_RE.findall(m.group(1))
        if toks:
            code_bytes = max(1, len(toks[0]) // 2)
    cmap: Dict[int, str] = {}

    def u(hexs: bytes) -> str:
        try:
            raw = bytes.fromhex(hexs.decode("latin-1"))
        except ValueError:
            return ""
        if len(raw) % 2:
            raw = b"\x00" + raw
        return raw.decode("utf-16-be", "replace")

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = _HEXTOK_RE.findall(m.group(1))
        for i in range(0, len(toks) - 1, 2):
            cmap[int(toks[i], 16)] = u(toks[i + 1])
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        body = m.group(1)
        lx = Lexer(body, 0)
        while True:
            lx.skip_ws()
            if lx.pos >= len(body):
                break
            try:
                lo = lx.read_object()
                hi = lx.read_object()
                dst = lx.read_object()
            except PdfError:
                break
            if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                break
            lo_i = int.from_bytes(lo, "big")
            hi_i = int.from_bytes(hi, "big")
            if isinstance(dst, list):
                for k, d in enumerate(dst):
                    if isinstance(d, bytes) and lo_i + k <= hi_i:
                        cmap[lo_i + k] = d.decode("utf-16-be", "replace")
            elif isinstance(dst, bytes):
                base = int.from_bytes(dst, "big") if len(dst) <= 4 else 0
                if len(dst) <= 4:
                    for c in range(lo_i, min(hi_i, lo_i + 65535) + 1):
                        cmap[c] = chr(base + (c - lo_i))
                else:
                    s = dst.decode("utf-16-be", "replace")
                    for c in range(lo_i, min(hi_i, lo_i + 65535) + 1):
                        cmap[c] = s[:-1] + chr(ord(s[-1]) + (c - lo_i))
    return code_bytes, cmap


# Adobe Glyph List core: ASCII punctuation + the common Latin-1 names.
# Letters/digits are generated; `uniXXXX` / `uXXXX(XX)` resolve by rule.
_AGL_CORE: Dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "endash": "–", "emdash": "—",
    "bullet": "•", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "trademark": "™", "Euro": "€",
    "florin": "ƒ", "fraction": "⁄", "minus": "−",
    "exclamdown": "\xa1", "cent": "\xa2", "sterling": "\xa3",
    "currency": "\xa4", "yen": "\xa5", "brokenbar": "\xa6",
    "section": "\xa7", "dieresis": "\xa8", "copyright": "\xa9",
    "ordfeminine": "\xaa", "guillemotleft": "\xab", "logicalnot": "\xac",
    "registered": "\xae", "macron": "\xaf", "degree": "\xb0",
    "plusminus": "\xb1", "acute": "\xb4", "mu": "\xb5",
    "paragraph": "\xb6", "periodcentered": "\xb7", "cedilla": "\xb8",
    "ordmasculine": "\xba", "guillemotright": "\xbb",
    "onequarter": "\xbc", "onehalf": "\xbd", "threequarters": "\xbe",
    "questiondown": "\xbf", "multiply": "\xd7", "divide": "\xf7",
    "germandbls": "\xdf", "eacute": "\xe9", "egrave": "\xe8",
    "agrave": "\xe0", "ccedilla": "\xe7", "ntilde": "\xf1",
    "oslash": "\xf8", "aring": "\xe5", "adieresis": "\xe4",
    "odieresis": "\xf6", "udieresis": "\xfc",
}
for _c in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    _AGL_CORE[_c] = _c
for _i, _n in enumerate(
    ("zero", "one", "two", "three", "four", "five", "six", "seven",
     "eight", "nine")
):
    _AGL_CORE[_n] = str(_i)


def glyph_name_to_unicode(name: str) -> Optional[str]:
    """AGL resolution: core names, the ``uniXXXX`` / ``uXXXX[XX]``
    conventions, single-character names."""
    g = _AGL_CORE.get(name)
    if g is not None:
        return g
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            cp = int(name[1:], 16)
            return chr(cp) if cp < 0x110000 else None
        except ValueError:
            return None
    if len(name) == 1:
        return name
    return None


def _base_encoding_map(name: str) -> Dict[int, str]:
    codec = {
        "WinAnsiEncoding": "cp1252",
        "MacRomanEncoding": "mac_roman",
    }.get(name)
    out: Dict[int, str] = {}
    if codec is None:
        return out
    for code in range(256):
        try:
            out[code] = bytes([code]).decode(codec)
        except UnicodeDecodeError:
            pass
    return out


class _Font:
    """Just enough font state to decode show-strings: /ToUnicode CMaps
    (authoritative), else simple-font /Encoding (WinAnsi/MacRoman base
    + /Differences glyph names), else Latin-1."""

    __slots__ = ("code_bytes", "cmap", "single_map")

    def __init__(self, doc: PdfDocument, fdict: Any):
        fdict = doc.get(fdict)
        self.code_bytes = 1
        self.cmap: Optional[Dict[int, str]] = None
        self.single_map: Optional[Dict[int, str]] = None
        if not isinstance(fdict, dict):
            return
        if str(doc.get(fdict.get("Subtype", ""))) == "Type0":
            self.code_bytes = 2
        tu = doc.get(fdict.get("ToUnicode"))
        if isinstance(tu, PdfStream):
            cb, cmap = parse_tounicode(doc.stream_data(tu))
            self.code_bytes = cb if cb > 1 else self.code_bytes
            self.cmap = cmap
        enc = doc.get(fdict.get("Encoding"))
        if isinstance(enc, Name):
            m = _base_encoding_map(str(enc))
            if m:
                self.single_map = m
        elif isinstance(enc, dict):
            m = _base_encoding_map(str(doc.get(enc.get("BaseEncoding", ""))))
            diffs = doc.get(enc.get("Differences"))
            if isinstance(diffs, list):
                code = 0
                for item in diffs:
                    if isinstance(item, (int, float)):
                        code = int(item)
                    elif isinstance(item, Name):
                        u = glyph_name_to_unicode(str(item))
                        if u is not None:
                            m[code] = u
                        code += 1
            if m:
                self.single_map = m

    def decode(self, s: bytes) -> str:
        if self.cmap is None and self.code_bytes == 1 and self.single_map is None:
            return s.decode("latin-1")
        out = []
        step = self.code_bytes
        for i in range(0, len(s) - step + 1, step):
            code = int.from_bytes(s[i : i + step], "big")
            if self.cmap is not None and code in self.cmap:
                out.append(self.cmap[code])
            elif step == 1:
                if self.single_map is not None:
                    out.append(self.single_map.get(code, chr(code)))
                else:
                    out.append(chr(code))
            else:
                out.append(chr(code) if code < 0x110000 else "�")
        return "".join(out)


_DEFAULT_FONT = object()

# --------------------------------------------------------------------- #
# Content-stream text interpreter (§9.4)

_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mmul(m1, m2):
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def extract_text_spans(
    doc: PdfDocument, page: Dict[str, Any]
) -> List[Tuple[float, float, str]]:
    """Run the page's content through the text machine → (x, y, text)
    spans in device space, in stream order."""
    content = doc.page_content(page)
    res = doc.get(page.get("Resources")) or {}
    fonts = doc.get(res.get("Font")) if isinstance(res, dict) else {}
    if not isinstance(fonts, dict):
        fonts = {}
    font_cache: Dict[str, _Font] = {}

    def font_for(name: str) -> _Font:
        f = font_cache.get(name)
        if f is None:
            f = _Font(doc, fonts.get(name))
            font_cache[name] = f
        return f

    spans: List[Tuple[float, float, str]] = []
    ctm = _ID
    gstack: List[Tuple] = []
    tm = tlm = _ID
    tl = 0.0
    font = _Font(doc, None)

    def show(s: Any) -> None:
        if not isinstance(s, bytes):
            return
        m = _mmul(tm, ctm)
        spans.append((m[4], m[5], font.decode(s)))

    lx = Lexer(content, 0)
    stack: List[Any] = []
    while True:
        try:
            tok = lx.read_object()
        except PdfError:
            if lx.pos >= len(content):
                break
            lx.pos += 1
            continue
        if not (isinstance(tok, tuple) and len(tok) == 2 and tok[0] == "op"):
            stack.append(tok)
            if len(stack) > 64:
                del stack[:-16]
            continue
        op = tok[1]
        try:
            if op == "BT":
                tm = tlm = _ID
            elif op == "ET":
                pass
            elif op == "Td" and len(stack) >= 2:
                tlm = _mmul((1, 0, 0, 1, float(stack[-2]), float(stack[-1])), tlm)
                tm = tlm
            elif op == "TD" and len(stack) >= 2:
                tl = -float(stack[-1])
                tlm = _mmul((1, 0, 0, 1, float(stack[-2]), float(stack[-1])), tlm)
                tm = tlm
            elif op == "TL" and stack:
                tl = float(stack[-1])
            elif op == "T*":
                tlm = _mmul((1, 0, 0, 1, 0.0, -tl), tlm)
                tm = tlm
            elif op == "Tm" and len(stack) >= 6:
                tm = tlm = tuple(float(v) for v in stack[-6:])
            elif op == "Tj" and stack:
                show(stack[-1])
            elif op == "'" and stack:
                tlm = _mmul((1, 0, 0, 1, 0.0, -tl), tlm)
                tm = tlm
                show(stack[-1])
            elif op == '"' and len(stack) >= 3:
                tlm = _mmul((1, 0, 0, 1, 0.0, -tl), tlm)
                tm = tlm
                show(stack[-1])
            elif op == "TJ" and stack and isinstance(stack[-1], list):
                parts = [x for x in stack[-1] if isinstance(x, bytes)]
                if parts:
                    m = _mmul(tm, ctm)
                    spans.append((m[4], m[5], font.decode(b"".join(parts))))
            elif op == "Tf" and len(stack) >= 2 and isinstance(stack[-2], Name):
                font = font_for(str(stack[-2]))
            elif op == "cm" and len(stack) >= 6:
                ctm = _mmul(tuple(float(v) for v in stack[-6:]), ctm)
            elif op == "q":
                gstack.append(ctm)
            elif op == "Q":
                if gstack:
                    ctm = gstack.pop()
            elif op in ("BI",):  # inline image: skip to EI
                e = content.find(b"EI", lx.pos)
                lx.pos = len(content) if e < 0 else e + 2
        except (TypeError, ValueError):
            pass  # malformed operands: fault tolerance, keep scanning
        stack = []
    return spans
