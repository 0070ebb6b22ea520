"""Fault-tolerance fuzzing: the engine must never crash and must keep
its structural invariants on ARBITRARY byte input (north star: repair
megabytes of invalid HTML; reference asserts survival on badHTML1/2)."""

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

import hquery_php_spark as hq
from hquery_php_spark.core.extract import ExtractOptions, extract_spans

# byte soup biased toward markup punctuation so tags actually form
_markup = st.sampled_from(
    [b"<", b">", b"/", b"=", b'"', b"'", b"<!--", b"-->", b"<div", b"</div",
     b"<script>", b"</script>", b"<a href=", b"<img src=", b" ", b"\n",
     b"x", b"\xc3\xa9", b"\xff", b"&amp;", b"<p class='a b'", b"<!", b"<?"]
)
_soup = st.lists(_markup, min_size=0, max_size=80).map(b"".join)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_never_crashes_and_invariants_hold(raw):
    doc = hq.HDoc(raw)  # must not raise, whatever the bytes
    idx = doc.index
    n = len(idx.html)
    begins = sorted(idx.ids)
    # intervals: begin <= end, inside the document
    for b in begins:
        e = idx.ids[b]
        assert 0 <= b <= n
        assert b <= e <= n
    # extents sorted by construction after merge; spans extraction runs
    spans = extract_spans(doc, ExtractOptions())
    offs = [s.offset for s in spans]
    assert offs == sorted(offs)
    for s in spans:
        assert s.kind in ("text", "media")
        assert 0 <= s.offset <= n
    # selector engine never crashes on the indexed soup
    for sel in ("div", "a[href]", "div > a", "p + a", ".a", "*:first"):
        doc.find(sel)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_pure_random_bytes(raw):
    doc = hq.HDoc(raw)
    extract_spans(doc)


# ---- differential fuzz vs stdlib html.parser ------------------------- #
# On well-formed (properly nested, properly quoted) HTML the reference's
# repair semantics coincide with a plain event parser, so stdlib
# html.parser is a usable independent oracle for tag counting.

_tags = st.sampled_from(["div", "p", "span", "a", "b", "script", "style"])
_word = st.text(alphabet="abc xyz0", min_size=0, max_size=8).map(
    lambda s: s.replace("<", "").replace("&", "")
)
_attrval = st.text(
    alphabet="ab >/'c", min_size=0, max_size=6
).map(lambda s: s.replace('"', ""))


@st.composite
def _element(draw, depth=0):
    tag = draw(_tags)
    attrs = ""
    if draw(st.booleans()):
        attrs = f' class="{draw(_attrval)}"'
    if draw(st.booleans()):
        attrs += f" data-x=\"{draw(_attrval)}\""
    if tag in ("script", "style"):
        body = draw(_word).replace("<", "")
        return f"<{tag}{attrs}>{body}</{tag}>"
    if depth >= 3 or draw(st.booleans()):
        return f"<{tag}{attrs}>{draw(_word)}</{tag}>"
    kids = draw(st.lists(_element(depth=depth + 1), min_size=0, max_size=3))
    return f"<{tag}{attrs}>{draw(_word)}{''.join(kids)}</{tag}>"


@st.composite
def _doc(draw):
    body = "".join(draw(st.lists(_element(), min_size=0, max_size=5)))
    return f"<html><body>{body}</body></html>"


@settings(max_examples=200, deadline=None)
@given(_doc())
def test_differential_vs_stdlib(html_text):
    from html.parser import HTMLParser

    class Counter(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=False)
            self.by = {}

        def handle_starttag(self, tag, attrs):
            self.by[tag] = self.by.get(tag, 0) + 1

    c = Counter()
    c.feed(html_text)
    doc = hq.HDoc(html_text.encode("utf-8"))
    ours = {n: len(ids) for n, ids in doc.index.tag_idx.items()}
    assert ours == c.by, (html_text, ours, c.by)


@settings(max_examples=150, deadline=None)
@given(_doc())
def test_differential_text_extraction_vs_stdlib(html_text):
    """The sequence of inter-tag text runs (whitespace-collapsed,
    script/style bodies excluded) must match an independent event
    parser run-for-run."""
    import re as _re
    from html.parser import HTMLParser

    class TextGrab(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=False)
            self.runs = []
            self.buf = []
            self.opaque = 0

        def _flush(self):
            if self.buf:
                t = _re.sub(r"\s+", " ", "".join(self.buf)).strip()
                if t:
                    self.runs.append(t)
                self.buf = []

        def handle_starttag(self, tag, attrs):
            self._flush()
            if tag in ("script", "style"):
                self.opaque += 1

        def handle_endtag(self, tag):
            self._flush()
            if tag in ("script", "style") and self.opaque:
                self.opaque -= 1

        def handle_data(self, data):
            if not self.opaque:
                self.buf.append(data)

    g = TextGrab()
    g.feed(html_text)
    g._flush()

    doc = hq.HDoc(html_text.encode("utf-8"))
    spans = extract_spans(
        doc, ExtractOptions(include_link_text_spans=True)
    )
    got = [s.text for s in spans if s.kind == "text"]
    assert got == g.runs, (html_text, got, g.runs)


# media + attribute differential: a/img refs and full attr dicts must
# agree with stdlib on well-formed input (single/double/bare/valueless)
_url = st.text(alphabet="abc/.:-", min_size=1, max_size=12)


@st.composite
def _media_doc(draw):
    parts = []
    for _ in range(draw(st.integers(0, 6))):
        kind = draw(st.sampled_from(["a", "img", "p"]))
        if kind == "a":
            parts.append(f'<a href="{draw(_url)}" id=x{draw(st.integers(0,9))}>t</a>')
        elif kind == "img":
            q = draw(st.sampled_from(['"', "'", ""]))
            # NB 'hidden />' not 'hidden/>': the reference's attr-name
            # scan includes '/' (strcspn break set, Parser/HTML.php:299),
            # so a valueless attr flush against '/>' is named 'hidden/'
            # there — a faithful quirk where stdlib normalizes.
            parts.append(f"<img src={q}{draw(_url)}{q} hidden />")
        else:
            parts.append(f"<p title='{draw(_url)}'>{draw(_word)}</p>")
    return f"<html><body>{''.join(parts)}</body></html>"


@settings(max_examples=200, deadline=None)
@given(_media_doc())
def test_differential_media_and_attrs_vs_stdlib(html_text):
    from html.parser import HTMLParser

    class Grab(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=False)
            self.tags = []

        def handle_starttag(self, tag, attrs):
            self.tags.append((tag, dict(attrs)))

        handle_startendtag = handle_starttag

    g = Grab()
    g.feed(html_text)

    doc = hq.HDoc(html_text.encode("utf-8"))
    idx = doc.index
    ours = []
    for b in sorted(idx.ids):
        a = idx.get_attr_by_id(b, None, raw=True) or {}
        extra = {}
        for attr_name in ("href", "src"):
            v = idx.idx_attr.get(attr_name, {}).get(b)
            if v is not None:
                extra[attr_name] = v
        ours.append((idx.tags[b].lower(), {**a, **extra}))
    assert ours == g.tags, (html_text, ours, g.tags)

    # media spans in document order = stdlib's a/img refs in event order
    expected_refs = [
        d.get("href") or d.get("src") for t, d in g.tags if t in ("a", "img")
    ]
    spans = extract_spans(doc)
    got_refs = [s.media_ref for s in spans if s.kind == "media"]
    assert got_refs == expected_refs, (html_text, got_refs, expected_refs)


# ---- PDF make→extract roundtrip property ------------------------------ #
_pdf_text = st.text(
    alphabet="abc (x)\\/-.", min_size=1, max_size=20
).map(lambda s: s.strip() or "x")
_pdf_blocks = st.lists(
    st.tuples(
        st.integers(0, 600), st.integers(0, 780).map(float), _pdf_text
    ).map(lambda t: (float(t[0]), t[1], t[2])),
    min_size=0,
    max_size=6,
)


@settings(max_examples=150, deadline=None)
@given(_pdf_blocks, st.booleans())
def test_pdf_roundtrip_property(blocks, compress):
    from hquery_php_spark.operators.pdf import extract_pdf_spans, make_pdf

    pdf = make_pdf(blocks, compress=compress)
    n, spans = extract_pdf_spans(pdf)
    assert n == 1
    expected = sorted(
        ((x, y, t) for x, y, t in blocks), key=lambda b: (-b[1], b[0])
    )
    got = sorted(spans, key=lambda b: (-b[1], b[0]))
    # y-sorted multisets equal (ties on (x,y) may reorder equal keys)
    assert sorted(got) == sorted(expected), (blocks, spans)


# --------------------------------------------------------------------- #
# Cross-engine parity fuzz: the portable hash family must produce
# IDENTICAL values in DuckDB on arbitrary text — that is the contract
# that makes cross-system dedup ledgers possible.

@pytest.fixture(scope="module")
def spark():
    pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


_texts = st.lists(
    st.text(
        alphabet=st.characters(
            min_codepoint=0x09,  # include the whitespace-class chars
            max_codepoint=0x2FFF,
            blacklist_categories=("Cs",),
        ),
        min_size=0,
        max_size=120,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(texts=_texts)
def test_portable_simhash_cross_engine_fuzz(spark, texts):
    import duckdb
    import pandas as pd

    from hquery_php_spark.operators.dedup import (
        simhash64_portable_df,
        simhash_oracle_sql,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r.simhash for r in simhash64_portable_df(df, k=8).collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {r[0]: r[1] for r in con.execute(simhash_oracle_sql(k=8)).fetchall()}
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    ids=st.lists(
        st.text(
            alphabet=st.characters(
                min_codepoint=0x21, max_codepoint=0x2FFF, blacklist_categories=("Cs",)
            ),
            min_size=1,
            # WARC corpora use URLs as doc_id — routinely over 64 chars,
            # which the old fixed-powers-table SQL twin silently mis-hashed
            max_size=160,
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_portable_row_hash_cross_engine_fuzz(spark, ids):
    """deterministic_sample / pack_sequences rest on this hash being the
    same number in every engine — fuzz it over arbitrary id strings."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from hquery_php_spark.functions.text import (
        portable_row_hash,
        portable_row_hash_sql,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", portable_row_hash(F.col("doc_id")).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": ids}))
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT doc_id, {portable_row_hash_sql('doc_id')} AS h FROM t"
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=_texts)
def test_portable_winnow_cross_engine_fuzz(spark, texts):
    """WINNOW_SQL_TEMPLATE is maintained separately from the
    char_gram_hashes Spark expressions — fuzz them in lockstep so the
    normalization and hash arithmetic cannot drift apart."""
    import duckdb
    import pandas as pd

    from hquery_php_spark.operators.dedup import (
        WINNOW_SQL_TEMPLATE,
        winnow_fingerprints,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id, r.fp) for r in winnow_fingerprints(df, k=8, window=4).collect()
    }
    sql = WINNOW_SQL_TEMPLATE.format(
        k=8, km1=7, wm1=3, mod=1_000_000_007
    ).replace("{powers}", str([pow(31, 7 - j, 1_000_000_007) for j in range(8)]))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 13),
    h=st.integers(1, 9),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    filt_mode=st.sampled_from(["cycle", "zero", "sub", "up", "avg", "paeth"]),
    interlace=st.booleans(),
)
def test_png_codec_roundtrip_property(w, h, ch, seed, filt_mode, interlace):
    """encode_png → decode_png is pixel-exact for every size, channel
    count, scanline filter type (incl. Paeth chains), and both the
    sequential and Adam7-interlaced layouts (small sizes exercise the
    empty-pass cases)."""
    import numpy as np

    from hquery_php_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    filters = {
        "cycle": lambda y: y % 5,
        "zero": lambda y: 0,
        "sub": lambda y: 1,
        "up": lambda y: 2,
        "avg": lambda y: 3,
        "paeth": lambda y: 4,
    }
    out = decode_png(encode_png(px, row_filter=filters[filt_mode], interlace=interlace))
    assert out is not None
    dw, dh, dch, dpx = out
    assert (dw, dh, dch) == (w, h, ch)
    assert dpx.tolist() == px.tolist()


_pii_texts = st.lists(
    st.text(
        alphabet=list("abcXY012345 @.+-()/%_\t\n"),
        min_size=0,
        max_size=80,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(texts=_pii_texts)
def test_redact_pii_cross_engine_fuzz(spark, texts):
    """redact_pii twins in lockstep over PII-shaped character soup —
    the explicit ASCII classes must behave identically in Java and RE2,
    including the sequential count-then-replace order."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from hquery_php_spark.functions.text import SQL as TSQL, redact_pii

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    got = {
        r.doc_id: (r.redacted, r.n_email, r.n_ip, r.n_phone)
        for r in df.select("doc_id", redact_pii(F.col("t")).alias("r"))
        .select("doc_id", "r.*")
        .collect()
    }
    rf = TSQL.redact_pii_fields("t")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "t"]))
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            "SELECT doc_id, " + ", ".join(
                f"{rf[k]} AS {k}" for k in ("redacted", "n_email", "n_ip", "n_phone")
            ) + " FROM documents"
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=_texts)
def test_repetition_stats_cross_engine_fuzz(spark, texts):
    """word_ngrams / repetition_stats twins in lockstep (normalization +
    gram-string assembly + ratio arithmetic must agree exactly)."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from hquery_php_spark.functions.text import SQL as TSQL, repetition_stats

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (
            r.n_tokens, r.n_distinct_tokens, r.distinct_ratio,
            r.dup_bigram_frac, r.top_bigram_frac,
        )
        for r in df.select("doc_id", repetition_stats(F.col("text")).alias("r"))
        .select("doc_id", "r.*")
        .collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = "SELECT doc_id, " + ", ".join(
        f"{e} AS {n}" for n, e in TSQL.repetition_fields("text").items()
    ) + " FROM documents"
    want = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(texts=_texts)
def test_bpe_and_tokens_cross_engine_fuzz(spark, texts):
    """token_count / bpe_token_count twins in lockstep — norm_ws must
    collapse the SAME characters in both engines (Java's \\s includes
    \\x0B, RE2's does not; both now use the explicit class)."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from hquery_php_spark.functions.text import (
        SQL as TSQL,
        bpe_token_count,
        token_count,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n, r.nb)
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("n"),
            bpe_token_count(F.col("text")).alias("nb"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT doc_id, {TSQL.token_count('text')} AS n, "
            f"{TSQL.bpe_token_count('text')} AS nb FROM documents"
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=_texts)
def test_hashed_linear_score_cross_engine_fuzz(spark, texts):
    """hashed_linear_score twins in lockstep: the per-token polynomial
    fold, bucketing, affine micro-weight, and the integer keep decision
    must agree bit-exactly across engines (no floats anywhere)."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from hquery_php_spark.functions.classify import (
        hashed_linear_score,
        hashed_linear_score_sql,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.s.n_tokens, r.s.score_micro, r.s.keep)
        for r in df.select(
            "doc_id",
            hashed_linear_score(F.col("text"), threshold_micro=-5).alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    f = hashed_linear_score_sql("text", threshold_micro=-5)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT doc_id, {f['n_tokens']}, {f['score_micro']}, {f['keep']} "
            f"FROM documents"
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=_texts)
def test_gopher_quality_cross_engine_fuzz(spark, texts):
    """gopher_quality twins in lockstep: normalization, line splitting,
    bullet/ellipsis tests, per-word alpha filter, stopword hits, and the
    combined pass flag must agree exactly across Java/RE2 dialects."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from hquery_php_spark.functions.text import SQL as TSQL, gopher_quality

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: tuple(r)[1:]
        for r in df.select(
            "doc_id", gopher_quality(F.col("text"), min_words=3).alias("g")
        )
        .select("doc_id", "g.*")
        .collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = "SELECT doc_id, " + ", ".join(
        f"{e} AS {n}"
        for n, e in TSQL.gopher_fields("text", min_words=3).items()
    ) + " FROM documents"
    want = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=_texts)
def test_hll_distinct_cross_engine_fuzz(spark, texts):
    """HLL twins in lockstep on arbitrary Unicode text: fold, bucket,
    rank-via-binary-length, exact power-of-two harmonic sum, and the
    linear-counting branch must agree bit-exactly (the register sum is
    provably order-independent — every partial sum is a dyadic rational
    within double precision)."""
    import duckdb
    import pandas as pd

    from hquery_php_spark.operators.sketches import (
        hll_distinct,
        hll_distinct_oracle_sql,
    )

    rows = [(i, t, f"g{i % 2}") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sorted(
        (r.source, r.est, r.exact_distinct) for r in hll_distinct(df).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    )
    want = sorted(
        tuple(r) for r in con.execute(hll_distinct_oracle_sql()).fetchall()
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=_texts)
def test_cms_cross_engine_fuzz(spark, texts):
    """Count-Min twins in lockstep on arbitrary Unicode text; the
    one-sided est >= exact guarantee must hold on every probe."""
    import duckdb
    import pandas as pd

    from hquery_php_spark.operators.sketches import (
        cms_estimates,
        cms_estimates_oracle_sql,
    )

    # probe a few tokens that actually occur (plus one that never does)
    first_toks = [t for txt in texts for t in txt.split()][:3]
    probes = sorted(set(first_toks) | {"zz-never-present"})
    # DuckDB probe literals travel through VALUES — exclude quotes-heavy
    # tokens the escaping test already covers elsewhere
    probes = [p for p in probes if "'" not in p][:4] or ["zz-never-present"]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.token, r.est, r.exact)
        for r in cms_estimates(df, probes).collect()
    )
    for _, est, exact in got:
        assert est >= exact
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(
        tuple(r)
        for r in con.execute(cms_estimates_oracle_sql(probes)).fetchall()
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=_texts)
def test_chunk_documents_cross_engine_fuzz(spark, texts):
    """Chunk windows, bounds, and rebuilt text in lockstep on arbitrary
    Unicode input (whitespace-only and short docs included)."""
    import duckdb
    import pandas as pd

    from hquery_php_spark.operators.pipeline import (
        chunk_documents,
        chunk_documents_oracle_sql,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.id, r.chunk_id, r.start_tok, r.n_tok, r.chunk_text)
        for r in chunk_documents(df, max_tokens=7, overlap=2).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            chunk_documents_oracle_sql(max_tokens=7, overlap=2)
        ).fetchall()
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=10_000),
                    min_size=1, max_size=8)
)
def test_temperature_thresholds_cross_engine_fuzz(counts):
    """The integer threshold formula agrees with its SQL twin for any
    domain-size mixture (⌊√n⌋ → truncating divisions → cap)."""
    import duckdb

    from hquery_php_spark.functions.text import temperature_thresholds

    cd = {f"d{i}": n for i, n in enumerate(counts)}
    want = temperature_thresholds(cd)
    con = duckdb.connect()
    vals = ", ".join(f"('d{i}', {n})" for i, n in enumerate(counts))
    mod = 1_000_000_007
    rows = con.execute(f"""
WITH c(d, n) AS (VALUES {vals}),
s AS (SELECT d, n, CAST(floor(sqrt(n)) AS BIGINT) AS sd FROM c),
tot AS (SELECT sum(sd) AS sS, sum(n) AS nN FROM s)
SELECT d, least({mod}, ((sd * {mod}) // sS) * nN // n) FROM s, tot
""").fetchall()
    got = {d: int(t) for d, t in rows}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(texts=_texts)
def test_lang_id_multi_cross_engine_fuzz(spark, texts):
    """lang_id_multi twins in lockstep — the greatest() + priority CASE
    chain must tie-break identically in both engines on arbitrary
    character soup (all-zero scores included)."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from hquery_php_spark.functions.text import SQL as TSQL, lang_id_multi

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.lang
        for r in df.select(
            "doc_id", lang_id_multi(F.col("text")).alias("lang")
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT doc_id, {TSQL.lang_id_multi('text')} AS lang FROM documents"
        ).fetchall()
    }
    assert got == want


def test_lang_id_multi_known_sentences(spark):
    """One natural sentence per language classifies correctly; an
    all-marker tie resolves to the priority order; no markers -> unk."""
    from pyspark.sql import functions as F

    from hquery_php_spark.functions.text import lang_id_multi

    cases = [
        ("the cat and the dog is on that mat", "en"),
        ("der hund und die katze ist nicht das problem", "de"),
        ("les enfants est dans la maison pour que tout aille bien", "fr"),
        ("los perros y las casas por una parte para todos", "es"),
        ("il fatto che della juventus per i tifosi con gli amici", "it"),
        ("acho que uma pessoa com mais tempo para tudo", "pt"),
        ("zxqj kwv 123", "unk"),
        # ' que ' occurs in the fr AND pt marker sets: a text with only
        # ' que ' ties fr/pt and the earlier language (fr) must win
        ("digo que sim", "fr"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.lang
        for r in df.select(
            "doc_id", lang_id_multi(F.col("text")).alias("lang")
        ).collect()
    }
    for i, (t, want) in enumerate(cases):
        assert got[i] == want, (t, got[i], want)


# richer soup: the structured-extraction walks see table/list/heading
# fragments in every broken combination
_struct_markup = st.sampled_from(
    [b"<table>", b"</table>", b"<tr>", b"<td", b"<th>", b' rowspan="2"',
     b' colspan="0"', b"<ul>", b"<li>", b"</li>", b"<h1>", b"</h2>",
     b"<h3>", b"<blockquote>", b"<pre>", b"<code>", b"<b>", b"<em>",
     b"<a href='/x'>", b"<img src=x>", b"<br>", b"<hr>", b">", b"<",
     b"t ", b"\n", b"&amp;", b"\xff", b"</"]
)
_struct_soup = st.lists(_struct_markup, min_size=0, max_size=60).map(b"".join)


@settings(max_examples=200, deadline=None)
@given(_struct_soup)
def test_structured_walks_never_crash(raw):
    """markdown / table-grid / outline walks share the parser's
    fault-tolerance bar: any byte soup renders to SOMETHING."""
    from hquery_php_spark.operators.markdown import render_markdown
    from hquery_php_spark.operators.sections import section_rows
    from hquery_php_spark.operators.tables import html_tables

    md = render_markdown(raw)
    assert isinstance(md, str)
    cells = html_tables(raw)
    # grid invariants: coordinates non-negative, spans >= 1
    for c in cells:
        assert c.row_no >= 0 and c.col_no >= 0
        assert c.rowspan >= 1 and c.colspan >= 1
    secs = section_rows(raw)
    # outline invariants: dense numbering, ascending offsets
    assert [s.section_no for s in secs] == list(range(len(secs)))
    assert all(a.offset <= b.offset for a, b in zip(secs, secs[1:]))
