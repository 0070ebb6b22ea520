"""PDF structural-parser tests.

No PDF validator exists in this container (no poppler/mupdf/qpdf), so
conformance is pinned the way the 12-bit JPEG leg was: every
independent writer mode in ``pdfwrite.PDF_FAMILIES`` must decode to
identical span sequences, plus hand-built spec-shape goldens that do
NOT go through the writer, filter/codec unit round-trips, and
never-raise fuzz over byte soup, truncations, and mutations.
"""

import random
import zlib

import pytest

from hquery_php_spark.operators.pdf import (
    build_pdf,
    extract_pdf_spans,
    make_pdf,
    parse_pdf_pages,
    pdf_info,
    sniff_pdf,
)
from hquery_php_spark.operators.pdfparse import (
    Lexer,
    PdfDocument,
    lzw_decode,
    lzw_encode,
    parse_tounicode,
    rl_encode,
    _rl_decode,
    _png_unpredict,
)
from hquery_php_spark.operators.pdfwrite import PDF_FAMILIES

PAGES = [
    [
        (50.0, 750.0, "Title (with parens) \\ and back"),
        (50.0, 700.0, "body text one"),
        (50.0, 688.0, "body text two"),
        (50.0, 50.0, "footer"),
    ],
    [
        (72.0, 720.0, "second page"),
        (72.0, 708.0, "line two"),
        (72.0, 696.0, "line three"),
    ],
    [(10.0, 780.0, "third")],
]


# --------------------------------------------------------------------- #
# Differential validation: every container mechanism → identical spans


@pytest.mark.parametrize("family", sorted(PDF_FAMILIES))
def test_family_differential(family):
    ref_n, ref_spans = extract_pdf_spans(build_pdf(PAGES))
    assert ref_n == 3 and len(ref_spans) == 8
    fam = PDF_FAMILIES[family]
    n, spans = extract_pdf_spans(
        build_pdf(PAGES, **fam), fam.get("user_pwd", b"")
    )
    assert (n, spans) == (ref_n, ref_spans), family


def test_family_versions():
    assert sniff_pdf(build_pdf(PAGES)) == "1.4"
    assert sniff_pdf(build_pdf(PAGES, xref="stream")) == "1.5"
    assert sniff_pdf(build_pdf(PAGES, objstm=True)) == "1.5"


def test_unicode_through_tounicode():
    text = "héllo wörld — ünïcode ✓ 漢字"
    n, spans = extract_pdf_spans(
        build_pdf([[(10.0, 700.0, text)]], strmode="hex", filters=("FlateDecode",))
    )
    assert n == 1 and spans == [(10.0, 700.0, text)]


def test_cm_translation_reports_device_coords():
    """q/cm/Q: the writer shifts text space and the CTM cancels it —
    extracted coordinates must be device-space."""
    n, spans = extract_pdf_spans(
        build_pdf([[(100.0, 200.0, "at")]], ops="tm", cm_shift=(35.0, -17.0))
    )
    assert spans == [(100.0, 200.0, "at")]


def test_incremental_update_adds_page():
    base = build_pdf(PAGES[:-1])
    full = build_pdf(PAGES, incremental=True)
    assert full.startswith(base)  # true append-only update
    nb, _ = extract_pdf_spans(base)
    nf, spans = extract_pdf_spans(full)
    assert (nb, nf) == (2, 3)
    assert spans == extract_pdf_spans(build_pdf(PAGES))[1]


def test_info_metadata_and_utf16():
    data = build_pdf(PAGES, info={"Title": "A title", "Author": "someone"})
    assert pdf_info(data) == {"Title": "A title", "Author": "someone"}
    # UTF-16BE text string with BOM (§7.9.2.2), hand-spliced
    doc = PdfDocument(data)
    from hquery_php_spark.operators.pdfparse import decode_text_string

    assert decode_text_string(b"\xfe\xff" + "ünï".encode("utf-16-be")) == "ünï"
    assert decode_text_string(b"plain") == "plain"
    assert doc.version == "1.4"


# --------------------------------------------------------------------- #
# Hand-built golden (independent of pdfwrite): nested page tree,
# content array, indirect /Length, comments, octal + continuation


def _golden_pdf() -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        # two-level page tree with inherited /Resources
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 2 "
        b"/Resources << /Font << /F1 9 0 R >> >> >>",
        3: b"<< /Type /Pages /Kids [4 0 R 5 0 R] /Count 2 /Parent 2 0 R >>",
        4: b"<< /Type /Page /Parent 3 0 R /Contents [6 0 R 7 0 R] >>",
        5: b"<< /Type /Page /Parent 3 0 R /Contents 8 0 R >>",
        9: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    s6 = b"BT /F1 12 Tf 10 700 Td (first \\150alf) Tj ET"  # \150 = 'h'
    s7 = b"% comment line\nBT /F1 12 Tf 10 680 Td (sec\\\nond) Tj ET"
    s8 = b"BT /F1 12 Tf 20 650 Td (page two) Tj ET"
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num, body in sorted(objs.items()):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    for num, body, lnum in ((6, s6, 10), (7, s7, 11), (8, s8, 12)):
        offsets[num] = len(out)
        # /Length given INDIRECTLY — resolution through the xref
        out += b"%d 0 obj\n<< /Length %d 0 R >>\nstream\n" % (num, lnum)
        out += body + b"\nendstream\nendobj\n"
        offsets[lnum] = len(out)
        out += b"%d 0 obj\n%d\nendobj\n" % (lnum, len(body))
    xref_at = len(out)
    maxn = max(offsets)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (maxn + 1)
    for n in range(1, maxn + 1):
        if n in offsets:
            out += b"%010d 00000 n \n" % offsets[n]
        else:
            out += b"0000000000 65535 f \n"
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\n" % (maxn + 1)
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def test_golden_nested_tree_content_array_indirect_length():
    n, spans = extract_pdf_spans(_golden_pdf())
    assert n == 2
    assert spans == [
        (10.0, 700.0, "first half"),
        (10.0, 680.0, "second"),
        (20.0, 650.0, "page two"),
    ]


def test_golden_bad_length_recovers_on_endstream():
    data = _golden_pdf().replace(b"10 0 obj\n45\n", b"10 0 obj\n9999\n")
    n, spans = extract_pdf_spans(data)
    assert (n, [s[2] for s in spans]) == (
        2,
        ["first half", "second", "page two"],
    )


def test_golden_corrupt_xref_rescue_scan():
    good = _golden_pdf()
    idx = good.rfind(b"xref")
    bad = good[:idx] + good[idx:].replace(b"00000000", b"00099999", 5)
    assert extract_pdf_spans(bad) == extract_pdf_spans(good)


# --------------------------------------------------------------------- #
# Lexer / object-model units


def test_lexer_objects():
    lx = Lexer(
        b"<< /Key#20x [1 -2.5 (lit\\tstr) <48690A> /N true null 7 0 R] >>"
    )
    d = lx.read_object()
    assert list(d) == ["Key x"]
    arr = d["Key x"]
    assert arr[0] == 1 and arr[1] == -2.5
    assert arr[2] == b"lit\tstr"
    assert arr[3] == b"Hi\n"
    assert str(arr[4]) == "N" and arr[5] is True and arr[6] is None
    assert arr[7] == (7, 0)


def test_lexer_string_edges():
    # nested parens, octal, CR normalization, continuation, odd hex
    lx = Lexer(b"((a(b)c) \\101\\12\\7 x\\\r\ny \r z)")
    assert lx.read_object() == b"(a(b)c) A\n\x07 xy \n z"
    assert Lexer(b"<4 86>").read_object() == b"H`"  # odd digit padded with 0


def test_lzw_roundtrip():
    random.seed(7)
    for _ in range(25):
        n = random.randrange(0, 3000)
        data = bytes(random.randrange(4) for _ in range(n))  # repetitive
        assert lzw_decode(lzw_encode(data)) == data
    big = bytes(random.randrange(256) for _ in range(20000))
    assert lzw_decode(lzw_encode(big)) == big  # forces table resets


def test_rl_roundtrip():
    random.seed(8)
    for _ in range(50):
        n = random.randrange(0, 1000)
        data = bytes(random.randrange(3) for _ in range(n))
        assert _rl_decode(rl_encode(data)) == data


def test_png_predictor_sub_avg_paeth():
    # one row per filter type over 4-byte rows, bpp=1
    rows = bytes(
        [1, 10, 5, 5, 5]  # Sub: 10,15,20,25
        + [3, 2, 2, 2, 2]  # Average (prev = 10,15,20,25)
        + [4, 1, 1, 1, 1]  # Paeth
        + [0, 9, 8, 7, 6]  # None
    )
    out = _png_unpredict(rows, 1, 8, 4)
    assert out[:4] == bytes([10, 15, 20, 25])
    assert len(out) == 16


def test_tounicode_bfrange_forms():
    cmap_src = b"""
    1 begincodespacerange <00> <FF> endcodespacerange
    2 beginbfchar <01> <0041> <02> <20AC> endbfchar
    1 beginbfrange <10> <12> <0061> endbfrange
    1 beginbfrange <20> <21> [<00480069> <0042> ] endbfrange
    """
    nbytes, cmap = parse_tounicode(cmap_src)
    assert nbytes == 1
    assert cmap[0x01] == "A" and cmap[0x02] == "€"
    assert (cmap[0x10], cmap[0x11], cmap[0x12]) == ("a", "b", "c")
    assert cmap[0x20] == "Hi" and cmap[0x21] == "B"


# --------------------------------------------------------------------- #
# Fault tolerance: never raise


def test_fuzz_never_raises():
    good = build_pdf(PAGES, filters=("FlateDecode",))
    random.seed(42)
    for _ in range(150):
        cut = random.randrange(1, len(good))
        extract_pdf_spans(good[:cut])
        soup = bytes(random.randrange(256) for _ in range(random.randrange(400)))
        extract_pdf_spans(b"%PDF-1.4\n" + soup)
        j = random.randrange(len(good))
        mut = good[:j] + bytes([random.randrange(256)]) + good[j + 1 :]
        extract_pdf_spans(mut)
    assert extract_pdf_spans(b"") == (0, [])
    assert sniff_pdf(None) is None


def test_make_pdf_back_compat():
    pdf = make_pdf([(50, 750, "T (x)"), (50, 700, "body"), (50, 50, "f")])
    assert sniff_pdf(pdf) == "1.4"
    n, spans = extract_pdf_spans(pdf)
    assert n == 1 and [s[2] for s in spans] == ["T (x)", "body", "f"]
    nz, sz = extract_pdf_spans(make_pdf([(1, 2, "zz")], compress=True))
    assert sz == [(1.0, 2.0, "zz")]


def test_parse_pdf_pages_stream_order_vs_layout_order():
    # spans out of layout order in the stream: parse preserves stream
    # order, extract_pdf_spans sorts top-down/left-right
    blocks = [(50.0, 50.0, "low"), (50.0, 700.0, "high")]
    ver, pages = parse_pdf_pages(build_pdf([blocks]))
    assert ver == "1.4"
    assert [s[2] for s in pages[0]] == ["low", "high"]
    _, spans = extract_pdf_spans(build_pdf([blocks]))
    assert [s[2] for s in spans] == ["high", "low"]


# --------------------------------------------------------------------- #
# Encryption (standard security handler, empty user password)


def test_aes_fips197_vectors():
    from hquery_php_spark.operators.pdfcrypt import AES

    a = AES(bytes.fromhex("000102030405060708090a0b0c0d0e0f"))
    ct = a.encrypt_block(bytes.fromhex("00112233445566778899aabbccddeeff"))
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert a.decrypt_block(ct).hex() == "00112233445566778899aabbccddeeff"
    a192 = AES(bytes.fromhex("000102030405060708090a0b0c0d0e0f1011121314151617"))
    assert (
        a192.encrypt_block(bytes.fromhex("00112233445566778899aabbccddeeff")).hex()
        == "dda97ca4864cdfe06eaf70a0ec0d7191"
    )
    a256 = AES(
        bytes.fromhex(
            "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
        )
    )
    ct = a256.encrypt_block(bytes.fromhex("00112233445566778899aabbccddeeff"))
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert a256.decrypt_block(ct).hex() == "00112233445566778899aabbccddeeff"


def test_rc4_public_vectors():
    from hquery_php_spark.operators.pdfcrypt import rc4

    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert rc4(b"Secret", b"Attack at dawn").hex() == "45a01f645fc35b383552544b9bf5"


def test_aes_cbc_roundtrip_padding():
    import random as _r

    from hquery_php_spark.operators.pdfcrypt import aes_cbc_decrypt, aes_cbc_encrypt

    _r.seed(3)
    for n in (0, 1, 15, 16, 17, 31, 32, 100):
        d = bytes(_r.randrange(256) for _ in range(n))
        iv = bytes(_r.randrange(256) for _ in range(16))
        for key in (b"k" * 16, b"q" * 32):
            assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, d)) == d


@pytest.mark.parametrize("mode", ["rc4", "aes128", "aes256"])
def test_encrypted_families_decrypt_transparently(mode):
    ref = extract_pdf_spans(build_pdf(PAGES))
    data = build_pdf(PAGES, encrypt=mode, filters=("FlateDecode",))
    assert extract_pdf_spans(data) == ref
    # encrypted string objects (/Info) decrypt too
    d2 = build_pdf(PAGES, encrypt=mode, info={"Title": "secret"})
    assert pdf_info(d2) == {"Title": "secret"}


def test_encrypted_wrong_user_password_is_honest_boundary():
    """A file whose password is not supplied (here: corrupted /U, so
    no password can validate) decodes to nothing instead of raising."""
    from hquery_php_spark.operators import pdfcrypt

    data = build_pdf(PAGES, encrypt="rc4")
    # flip bytes inside /U so the empty-password check fails
    i = data.find(b"/U (")
    assert i > 0
    bad = data[: i + 4] + bytes(b ^ 0xFF for b in data[i + 4 : i + 8]) + data[i + 8 :]
    n, spans = extract_pdf_spans(bad)
    assert spans == []
    # and the handler itself reports it as a password requirement
    from hquery_php_spark.operators.pdfparse import PdfDocument

    doc = PdfDocument(data)
    assert doc._crypt is not None  # the good file authenticates


@pytest.mark.parametrize("mode", ["rc4", "aes128", "aes256"])
def test_user_password_opens_with_user_and_owner(mode):
    """Non-empty user passwords: the file opens with the user password
    (Algorithm 4/5; R6 Algorithm 2.A) AND with the owner password
    (Algorithm 7 /O recovery; R6 /OE unwrap); wrong or missing
    passwords degrade to decode-to-nothing, never an exception."""
    ref = extract_pdf_spans(build_pdf(PAGES))
    data = build_pdf(
        PAGES, encrypt=mode, filters=("FlateDecode",), user_pwd=b"s3cret"
    )
    assert extract_pdf_spans(data, b"s3cret") == ref
    assert extract_pdf_spans(data, b"owner") == ref
    for pwd in (b"", b"wrong"):
        _, spans = extract_pdf_spans(data, pwd)
        assert spans == []
    # encrypted string objects (/Info) decrypt under the password too
    d2 = build_pdf(PAGES, encrypt=mode, info={"Title": "pw"}, user_pwd=b"s3cret")
    from hquery_php_spark.operators.pdfparse import PdfDocument

    assert PdfDocument(d2, b"s3cret").info() == {"Title": "pw"}


def test_wrong_password_never_locks_out_empty_user_files():
    ref = extract_pdf_spans(build_pdf(PAGES))
    data = build_pdf(PAGES, encrypt="rc4", filters=("FlateDecode",))
    assert extract_pdf_spans(data, b"totally-wrong") == ref


def test_algorithm7_owner_key_recovery():
    """The file key derived via the owner password (Algorithm 7) is
    byte-identical to the user-password derivation."""
    from hquery_php_spark.operators.pdfcrypt import StdSecurity, make_encrypt_rc4
    from hquery_php_spark.operators.pdfparse import PdfError

    id0 = b"x" * 16
    enc, h_user = make_encrypt_rc4(id0, b"own3r", user_pwd=b"usr")
    assert StdSecurity(enc, id0, b"usr").key == h_user.key
    assert StdSecurity(enc, id0, b"own3r").key == h_user.key
    with pytest.raises(PdfError):
        StdSecurity(enc, id0, b"nope")


def test_encrypted_fuzz_never_raises():
    data = build_pdf(PAGES, encrypt="aes256", filters=("FlateDecode",))
    random.seed(99)
    # 25 iterations: a mutation inside /U's salts costs a fresh ~1 s
    # _r6_hash (the KDF is expensive by design)
    for _ in range(25):
        j = random.randrange(len(data))
        mut = data[:j] + bytes([random.randrange(256)]) + data[j + 1 :]
        extract_pdf_spans(mut)
        cut = random.randrange(1, len(data))
        extract_pdf_spans(data[:cut])


def test_r6_hash_invariants():
    """Algorithm 2.B: the validation/key salts produce the committed
    48-byte /U shape and /UE unwraps to the file key."""
    import hashlib as _h

    from hquery_php_spark.operators.pdfcrypt import (
        StdSecurity,
        _r6_hash,
        make_encrypt_aes256,
    )

    id0 = _h.md5(b"fixture").digest()
    enc, handler = make_encrypt_aes256(id0)
    assert len(enc["U"]) == 48 and len(enc["UE"]) == 32
    assert _r6_hash(b"", enc["U"][32:40]) == enc["U"][:32]
    h2 = StdSecurity(enc, id0)
    assert h2.key == handler.key and len(h2.key) == 32


# --------------------------------------------------------------------- #
# Simple-font /Encoding: WinAnsi base maps + /Differences glyph names


def test_diffenc_family_roundtrip_including_unicode():
    """The /Differences remap (non-identity codes -> uniXXXX names)
    must decode back; compared against the ToUnicode family because
    both are unicode-exact (the literal family is Latin-1-bound)."""
    pages = [[(10.0, 700.0, "héllo (x) — diff ✓")], [(20.0, 650.0, "page 2")]]
    hexref = extract_pdf_spans(build_pdf(pages, strmode="hex"))
    got = extract_pdf_spans(
        build_pdf(pages, strmode="diffenc", filters=("FlateDecode",))
    )
    assert got == hexref


def test_glyph_names_and_winansi():
    from hquery_php_spark.operators.pdfparse import (
        _base_encoding_map,
        glyph_name_to_unicode,
    )

    assert glyph_name_to_unicode("space") == " "
    assert glyph_name_to_unicode("A") == "A"
    assert glyph_name_to_unicode("seven") == "7"
    assert glyph_name_to_unicode("emdash") == "—"
    assert glyph_name_to_unicode("uni20AC") == "€"
    assert glyph_name_to_unicode("u1F600") == "\U0001f600"
    assert glyph_name_to_unicode("nosuchglyphname") is None
    w = _base_encoding_map("WinAnsiEncoding")
    assert w[0x80] == "€" and w[0xE9] == "é"  # cp1252
    m = _base_encoding_map("MacRomanEncoding")
    assert m[0xD0] == "–"  # en dash in mac_roman


def test_differences_with_classic_glyph_names():
    """Hand-built /Differences using AGL names (not uniXXXX)."""
    from hquery_php_spark.operators.pdfparse import PdfDocument, extract_text_spans

    # remap: 0x41 ('A' byte) -> /space, 0x42 -> /eacute, 0x43 -> /seven
    data = build_pdf([[(5.0, 10.0, "ABC")]])
    data = data.replace(
        b"/BaseFont /Helvetica",
        b"/BaseFont /Helvetica /Encoding << /Type /Encoding "
        b"/Differences [65 /space /eacute /seven] >>",
    )
    doc = PdfDocument(data)
    spans = extract_text_spans(doc, doc.pages()[0])
    assert spans == [(5.0, 10.0, " \xe97")]
