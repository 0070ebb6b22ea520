"""Driver contract for the spark-graft builder (PySpark target).

Queries map to SURVEY.md §2 operators.  HTML-engine queries render the
driver's plain-text ``documents`` table into deterministic HTML (template
inversion — see hquery_php_spark/sources/html_synth.py) so that the full
tokenizer → index → selector → span-extraction path has an exact ANSI-SQL
oracle.  Training-data-pipeline queries (dedup, similarity, text analysis)
run Spark-native with their own SQL twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hquery_php_spark.functions.text import (
    SQL as TSQL,
    fingerprint,
    lang_id_en,
    quality_score,
    token_count,
)
from hquery_php_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_verify,
    simhash64,
)
from hquery_php_spark.operators.pipeline import (
    explode_spans,
    extract_spans_df,
    salted_repartition,
)
from hquery_php_spark.operators.similarity import brute_force_topk, ivf_topk
from hquery_php_spark.sources.html_synth import (
    BASE_URL,
    expected_spans_sql,
    synth_html_col,
)

_DOCS = "documents.parquet"

from hquery_php_spark.operators.events import (  # noqa: E402
    SESSIONIZE_SQL as _SESS_SQL_T,
    TUMBLING_SQL as _TUMB_SQL_T,
)

_EV_TUMBLING_SQL = _TUMB_SQL_T.format(width="hour")
_EV_SESSIONIZE_SQL = _SESS_SQL_T.format(gap_minutes=30)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{_DOCS}")


def _spread(df: DataFrame, spark: SparkSession, key: str = "doc_id") -> DataFrame:
    """Salted repartition to full parallelism before a heavy stage.

    The driver's test parquet is a single row group (one input split); on
    a real cluster the scan arrives pre-split, but the north rule's
    salted size-bucket repartition before the extract UDF is part of the
    design either way.  Skipped when the scan is already wide enough."""
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return salted_repartition(df, n, key_col=key)


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_docs(spark, sf_dir), spark)
    return d.select(
        "doc_id",
        synth_html_col(F.col("doc_id"), F.col("text"), F.col("source")).alias("html"),
        F.lit(BASE_URL).alias("base_url"),
    )


# --------------------------------------------------------------------- #
# HTML-engine queries (full tokenizer→index→selector→extraction path)

def q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: ordered (kind, text, media_ref, offset) span sequences."""
    spans = extract_spans_df(_synth(spark, sf_dir))
    return explode_spans(spans).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "ord",
        "kind",
        "text",
        "media_ref",
        "offset",
    )


_WORDWISE_PRE = '<html><body><div id="m">'
_WORDWISE_POST = "</div></body></html>"


def _wordwise_html() -> F.Column:
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    words = F.split(norm, " ")
    spans = F.concat_ws(
        "",
        F.zip_with(
            words,
            F.sequence(F.lit(0), F.size(words) - 1),
            lambda w, i: F.concat(
                F.lit('<span class="w'),
                F.pmod(i, F.lit(3)).cast("string"),
                F.lit('" data-k="v'),
                F.pmod(i, F.lit(2)).cast("string"),
                F.lit('">'),
                w,
                F.lit("</span>"),
            ),
        ),
    )
    return F.concat(F.lit(_WORDWISE_PRE), spans, F.lit(_WORDWISE_POST))


def q_selector_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selector algebra over per-word spans: tag/class/attr filters,
    descendant + child + sibling combinators, positional pseudos."""
    from hquery_php_spark.core.doc import HDoc
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    d = _spread(_docs(spark, sf_dir), spark).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        _wordwise_html().alias("html"),
    )
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("n_span", IntegerType()),
            StructField("n_w0", IntegerType()),
            StructField("n_v1", IntegerType()),
            StructField("n_desc", IntegerType()),
            StructField("n_child", IntegerType()),
            StructField("n_sib", IntegerType()),
            StructField("first_w", StringType()),
            StructField("third_w", StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in schema.fieldNames()}
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                doc = HDoc(html.encode("utf-8"))

                def n(sel):
                    r = doc.find(sel)
                    return len(r) if r else 0

                rows["doc_id"].append(doc_id)
                rows["n_span"].append(n("span"))
                rows["n_w0"].append(n("span.w0"))
                rows["n_v1"].append(n("span[data-k=v1]"))
                rows["n_desc"].append(n("div span"))
                rows["n_child"].append(n("div > span"))
                rows["n_sib"].append(n("span + span"))
                f = doc.find("span:first")
                t = doc.find("span:eq(2)")
                rows["first_w"].append(f.first().text() if f else None)
                rows["third_w"].append(t.first().text() if t else None)
            yield pd.DataFrame(rows)

    return d.mapInPandas(run, schema)


def q_media_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a[href] / img[src] found via the selector engine, URL-resolved."""
    from hquery_php_spark.core.doc import HDoc
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    d = _synth(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "html", "base_url"
    )
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("href_raw", StringType()),
            StructField("href_abs", StringType()),
            StructField("src_abs", StringType()),
            StructField("a_outer", StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in schema.fieldNames()}
            for doc_id, html, url in zip(pdf["doc_id"], pdf["html"], pdf["base_url"]):
                doc = HDoc(html.encode("utf-8"), url)
                a = doc.find("a[href]")
                img = doc.find("img[src]")
                rows["doc_id"].append(doc_id)
                rows["href_raw"].append(a.attr("href") if a else None)
                rows["href_abs"].append(a.attr("href", True) if a else None)
                rows["src_abs"].append(img.attr("src", True) if img else None)
                rows["a_outer"].append(a.outer_html() if a else None)
            yield pd.DataFrame(rows)

    return d.mapInPandas(run, schema)


def q_charset_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniffing (XML decl / meta) over a 3-charset template mix."""
    from hquery_php_spark.core.charset import detect_charset
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    label = F.element_at(
        F.array(F.lit("utf-8"), F.lit("ISO-8859-2"), F.lit("windows-1251")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    d = _spread(_docs(spark, sf_dir), spark).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(
            F.lit('<html><head><meta charset="'),
            label,
            F.lit('"><title>t</title></head><body>x</body></html>'),
        ).alias("html"),
    )
    schema = StructType(
        [StructField("doc_id", StringType()), StructField("charset", StringType())]
    )

    def run(batches):
        for pdf in batches:
            rows = {"doc_id": [], "charset": []}
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                rows["doc_id"].append(doc_id)
                rows["charset"].append(detect_charset(html.encode("utf-8")))
            yield pd.DataFrame(rows)

    return d.mapInPandas(run, schema)


# --------------------------------------------------------------------- #
# Training-data pipeline queries (Spark-native)

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact(_docs(spark, sf_dir)).select("fp", "keep_id", "n_dups")


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", lang_id_en(F.col("text")).alias("lang")
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", quality_score(F.col("text")).alias("q")
    ).select(
        "doc_id",
        F.col("q.n_chars").alias("n_chars"),
        F.col("q.n_tokens").alias("n_tokens"),
        F.col("q.avg_token_len").alias("avg_token_len"),
        F.col("q.alpha_ratio").alias("alpha_ratio"),
        F.col("q.digit_ratio").alias("digit_ratio"),
        F.col("q.n_spaces").alias("n_spaces"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    embs = _embs(spark, sf_dir)
    qvec = (
        embs.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    )
    return brute_force_topk(
        embs.where(F.col("vec_id") != 0), qvec, k=10
    ).select("id", F.round("cos", 4).alias("cos_r"))


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN (LSH-bucketed IVF) — rows-only check by design."""
    embs = _embs(spark, sf_dir)
    qvec = (
        embs.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    )
    return ivf_topk(
        embs.where(F.col("vec_id") != 0), qvec, k=10, n_planes=6, hamming_radius=2
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates verified by exact n-gram Jaccard
    (rows-only check: hash family is engine-specific)."""
    d = _spread(_docs(spark, sf_dir), spark)
    sigs = minhash_signatures(d, num_perm=16, shingle_k=8)
    cands = minhash_lsh_candidates(sigs, bands=2, rows_per_band=8)
    return ngram_jaccard_verify(d, cands, k=8, threshold=0.6)


def q_dedup_ngram_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 8-gram Jaccard self-pairs above 0.6 — the brute-force ground
    truth for the MinHash+LSH path (SQL oracle)."""
    d = _spread(_docs(spark, sf_dir), spark)
    ids = d.select(F.col("doc_id").alias("id"), F.col("text"))
    from hquery_php_spark.operators.dedup import char_shingles

    sh = ids.select("id", F.array_distinct(char_shingles(F.col("text"), 8)).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("a.sh", "b.sh"))
            / F.size(F.array_union("a.sh", "b.sh")),
        )
        .where(F.col("jaccard") >= 0.6)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc (rows-only: xxhash64 is engine-specific)."""
    return _spread(_docs(spark, sf_dir), spark).select(
        "doc_id", simhash64(F.col("text")).alias("simhash")
    )


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event rollup (map-side partial agg + one shuffle)."""
    from hquery_php_spark.operators.events import tumbling_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return tumbling_counts(ev, "ts", "hour")


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via window functions."""
    from hquery_php_spark.operators.events import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, gap_minutes=30)


# --------------------------------------------------------------------- #

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_spans": q_extract_spans,
        "selector_counts": q_selector_counts,
        "media_refs": q_media_refs,
        "charset_detect": q_charset_detect,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "lang_id": q_lang_id,
        "text_quality": q_text_quality,
        "fingerprint": q_fingerprint,
        "similarity_topk": q_similarity_topk,
        "similarity_ivf": q_similarity_ivf,
        "dedup_minhash": q_dedup_minhash,
        "dedup_ngram_exact": q_dedup_ngram_exact,
        "simhash": q_simhash,
        "events_window": q_events_window,
        "events_sessions": q_events_sessions,
    }


def oracle_sql() -> dict[str, str]:
    norm = TSQL.norm_ws("text")
    qf = TSQL.quality_fields("text")
    wordcount = TSQL.token_count("text")
    return {
        "extract_spans": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, ord, kind, text, "
            "media_ref, \"offset\" FROM (" + expected_spans_sql("documents") + ")"
        ),
        "selector_counts": f"""
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   W AS n_span,
                   (W + 2) // 3 AS n_w0,
                   W // 2 AS n_v1,
                   W AS n_desc,
                   W AS n_child,
                   W - 1 AS n_sib,
                   string_split({norm}, ' ')[1] AS first_w,
                   CASE WHEN W >= 3 THEN string_split({norm}, ' ')[3] END AS third_w
            FROM (SELECT doc_id, text, {wordcount} AS W FROM documents)
        """,
        "media_refs": f"""
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   '/docs/' || doc_id || '.html' AS href_raw,
                   'https://example.com/docs/' || doc_id || '.html' AS href_abs,
                   'https://cdn.example.com/' || source || '/' || doc_id || '.png' AS src_abs,
                   '<a class="next" href="/docs/' || doc_id || '.html">Next '
                     || doc_id || '</a>' AS a_outer
            FROM documents
        """,
        "charset_detect": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CASE doc_id % 3 WHEN 0 THEN 'UTF-8'
                                   WHEN 1 THEN 'ISO-8859-2'
                                   ELSE 'WINDOWS-1251' END AS charset
            FROM documents
        """,
        "dedup_exact": (
            f"SELECT {TSQL.fingerprint('text')} AS fp, min(doc_id) AS keep_id, "
            "count(*) AS n_dups FROM documents GROUP BY 1"
        ),
        "token_count": f"SELECT doc_id, {wordcount} AS n_tokens FROM documents",
        "lang_id": f"SELECT doc_id, {TSQL.lang_id_en('text')} AS lang FROM documents",
        "text_quality": (
            "SELECT doc_id, "
            + ", ".join(f"{expr} AS {name}" for name, expr in qf.items())
            + " FROM documents"
        ),
        "fingerprint": f"SELECT doc_id, {TSQL.fingerprint('text')} AS fp FROM documents",
        "similarity_topk": """
            SELECT vec_id AS id,
                   round(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
                   ), 4) AS cos_r
            FROM embeddings WHERE vec_id != 0
            ORDER BY list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
                     ) DESC, vec_id
            LIMIT 10
        """,
        "dedup_ngram_exact": """
            WITH t AS (
              SELECT doc_id AS id,
                     list_distinct([substring(text, i, 8)
                                    for i in range(1, greatest(length(text) - 6, 2))]) AS sh
              FROM (SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS text
                    FROM documents)
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
            FROM t a, t b
            WHERE a.id < b.id
              AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6
        """,
        "events_window": _EV_TUMBLING_SQL,
        "events_sessions": _EV_SESSIONIZE_SQL,
        # rows-only (engine-specific hash families / approximate results):
        # selector engine internals exercised via selector_counts above.
        # "similarity_ivf", "dedup_minhash", "simhash" intentionally omitted.
    }
