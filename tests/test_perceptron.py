"""Integer-perceptron classifier training: learning sanity, exactness
against an independent reference implementation, and DuckDB twin
lockstep (weights AND predictions, dtype-exact)."""

from __future__ import annotations

import pytest

pyspark = pytest.importorskip("pyspark")
duckdb = pytest.importorskip("duckdb")

import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hquery_php_spark.operators.perceptron import (  # noqa: E402
    perceptron_oracle_sql,
    score_with_weights,
    train_perceptron,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("hquery-perceptron-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


GOOD = "the quick brown fox jumps over the lazy dog near the river bank "
SPAM = "buy cheap pills now click here spam spam offer "


def _rows():
    rows = []
    for i in range(40):
        good = i % 2 == 0
        text = GOOD * (2 + i % 3) if good else SPAM * (1 + i % 2)
        rows.append((str(i), text, 1 if good else 0))
    rows.append(("empty", "", 0))
    return rows


def _ref_train(rows, n_buckets, epochs):
    """Independent reference: dict-based batch perceptron with the same
    normalization/bucket hash, plain Python integers."""
    MOD, BASE = 1_000_000_007, 31

    def buckets(text):
        toks = " ".join(text.lower().split()).split(" ")
        out = {}
        for t in toks:
            if t == "":
                continue
            h = 0
            for ch in t:
                h = (h * BASE + ord(ch)) % MOD
            b = h % n_buckets
            out[b] = out.get(b, 0) + 1
        return out

    feats = [(buckets(t), y) for _, t, y in rows]
    w = [0] * (n_buckets + 1)
    for _ in range(epochs):
        delta = [0] * (n_buckets + 1)
        for x, y in feats:
            if not x:
                continue
            score = sum(c * w[b] for b, c in x.items()) + w[-1]
            if (1 if score >= 0 else 0) != y:
                d = 2 * y - 1
                for b, c in x.items():
                    delta[b] += d * c
                delta[-1] += d
        w = [a + b for a, b in zip(w, delta)]
    return w


def test_train_matches_independent_reference(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id string, text string, label int")
    got = train_perceptron(df, n_buckets=16, epochs=3)
    assert got == _ref_train(rows, 16, 3)
    # and it actually learns: trained predictions separate the classes
    preds = {
        r.doc_id: r.keep
        for r in df.select(
            "doc_id", score_with_weights(F.col("text"), got, 16)["keep"].alias("keep")
        ).collect()
    }
    acc = sum(int(preds[d] == y) for d, _, y in rows) / len(rows)
    assert acc >= 0.9, acc


def test_duckdb_twin_lockstep(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id string, text string, label int")
    B, E = 16, 3
    w = train_perceptron(df, n_buckets=B, epochs=E)
    sp = (
        df.select("doc_id", score_with_weights(F.col("text"), w, B).alias("s"))
        .select("doc_id", "s.n_tokens", "s.score_micro", "s.keep")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "docs_pd", pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    )
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_pd")
    wsql, psql = perceptron_oracle_sql("label", n_buckets=B, epochs=E)
    ow = con.execute(wsql).df().sort_values("b").reset_index(drop=True)
    assert list(ow.w) == [w[int(b)] for b in ow.b] and len(ow) == B + 1
    assert str(ow.w.dtype) == "int64"
    op = con.execute(psql).df().sort_values("doc_id").reset_index(drop=True)
    assert sp.dtypes.tolist() == op.dtypes.tolist()
    pd.testing.assert_frame_equal(sp, op)


def test_empty_doc_scores_bias_only(spark):
    df = spark.createDataFrame(
        [("a", "good text here", 1), ("e", "", 0)],
        "doc_id string, text string, label int",
    )
    w = train_perceptron(df, n_buckets=8, epochs=2)
    row = (
        df.where(F.col("doc_id") == "e")
        .select(score_with_weights(F.col("text"), w, 8).alias("s"))
        .collect()[0]["s"]
    )
    assert row["n_tokens"] == 0 and row["score_micro"] == w[-1]


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc ", min_size=0, max_size=24),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=2,
        max_size=16,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_fuzz_train_vs_reference_and_twin(spark, docs, epochs):
    """Random tiny corpora (degenerate labels, empty texts, ties
    included): Spark training equals the independent reference AND the
    DuckDB twin, weights and predictions both."""
    rows = [(f"d{i}", t, y) for i, (t, y) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, text string, label int")
    B = 8
    w = train_perceptron(df, n_buckets=B, epochs=epochs)
    assert w == _ref_train(rows, B, epochs)
    con = duckdb.connect()
    con.register("docs_pd", pd.DataFrame(rows, columns=["doc_id", "text", "label"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_pd")
    wsql, psql = perceptron_oracle_sql("label", n_buckets=B, epochs=epochs)
    ow = con.execute(wsql).df().sort_values("b").reset_index(drop=True)
    assert list(ow.w) == w
    sp = (
        df.select("doc_id", score_with_weights(F.col("text"), w, B).alias("s"))
        .select("doc_id", "s.n_tokens", "s.score_micro", "s.keep")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    op = con.execute(psql).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(sp, op)


def test_calibrate_keep_threshold(spark):
    """Threshold keeps at least the requested fraction, overshooting by
    at most the threshold bin's own population (histogram granularity)."""
    from hquery_php_spark.operators.perceptron import calibrate_keep_threshold

    scores = [(f"d{i}", (i * 37) % 1000 - 300) for i in range(500)]
    df = spark.createDataFrame(scores, "doc_id string, score_micro long")
    for keep in (100, 70, 30, 5):
        thr = calibrate_keep_threshold(df, keep, bin_width=50)
        vals = [s for _, s in scores]
        kept = sum(1 for v in vals if v >= thr) / len(vals)
        in_bin = sum(1 for v in vals if thr <= v < thr + 50) / len(vals)
        assert kept >= keep / 100 - 1e-9, (keep, thr, kept)
        assert kept <= keep / 100 + in_bin + 1e-9, (keep, thr, kept, in_bin)


def test_calibrate_empty_input_raises(spark):
    from hquery_php_spark.operators.perceptron import calibrate_keep_threshold

    empty = spark.createDataFrame([], "doc_id string, score_micro long")
    for keep in (100, 50):
        with pytest.raises(ValueError, match="no scored rows"):
            calibrate_keep_threshold(empty, keep)
