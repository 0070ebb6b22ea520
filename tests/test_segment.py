"""Sentence segmentation: portable rule, Spark/DuckDB lockstep."""

import duckdb
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


CASES = [
    "Hello world. This is fine! Is it? yes no Caps. A. Ok.",
    "",
    "   ",
    "one",
    "Hi. A. Ok.",
    "Dr. Smith went home. He slept.",
    "No boundary here: all lowercase. still lowercase",
    "Multi  spaces.  Big gap stays one sentence? Yes.",
    "Trailing punct.",
    "Ends mid",
    "A! B? C. D",
    "tab\tand\nnewline. Next one.",
]


def test_spark_duckdb_lockstep(spark):
    from pyspark.sql import functions as F

    from hquery_php_spark.functions.segment import SegSQL, sentence_stats

    df = spark.createDataFrame([(c,) for c in CASES], "text string")
    out = (
        df.select(sentence_stats(F.col("text")).alias("s"))
        .select("s.*")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": CASES}))
    f = SegSQL.stats_fields("text")
    odf = con.execute(
        "SELECT " + ", ".join(f"{e} AS {k}" for k, e in f.items()) + " FROM t"
    ).df()
    assert list(out.dtypes.astype(str)) == list(odf.dtypes.astype(str))
    pd.testing.assert_frame_equal(out, odf)


def test_sentences_values(spark):
    from pyspark.sql import functions as F

    from hquery_php_spark.functions.segment import sentences

    df = spark.createDataFrame(
        [("One two. Three four! Five?",)], "text string"
    )
    [row] = df.select(sentences(F.col("text")).alias("s")).collect()
    assert row["s"] == ["One two.", "Three four!", "Five?"]


def test_empty_gives_empty_array(spark):
    from pyspark.sql import functions as F

    from hquery_php_spark.functions.segment import sentences

    df = spark.createDataFrame([("",), ("  ",)], "text string")
    rows = df.select(sentences(F.col("text")).alias("s")).collect()
    assert all(r["s"] == [] for r in rows)
