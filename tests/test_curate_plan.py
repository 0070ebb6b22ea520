"""Plan-shape pin for the curate quality gate.

The gate's nested higher-order-function expressions MUST evaluate in
ProjectExec (where whole-stage codegen does subexpression
elimination), never inlined into FilterExec — the measured regression
is ~70x (20.4 s vs 3.0 s at sf0.1).  The barrier that guarantees this
is a nondeterministic value-constant conjunct
(operators/curate.py::_pushdown_barrier); this test converts any
future optimizer-behavior drift into a loud failure:

* with the barrier, the Filter reads ONLY the projected ``__keep``
  boolean and the HOF forest sits in the Project below it;
* sensitivity check: withOUT the barrier the same gate DOES inline
  into Filter on the current Spark — proving the assertion actually
  detects the regression it exists to catch.  If a Spark upgrade makes
  this check fail, the barrier has become unnecessary and can go.
"""

import os
import re

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _filter_chunk(plan: str) -> str:
    """The executed-plan text from the first Filter operator up to the
    next operator boundary (Project / ColumnarToRow / FileScan)."""
    i = plan.find("Filter")
    assert i >= 0, plan
    rest = plan[i:]
    ends = [
        m.start()
        for m in re.finditer(r"Project \[|ColumnarToRow|FileScan", rest)
    ]
    return rest[: min(ends)] if ends else rest


def _gate_plan(spark, barrier: bool) -> str:
    from pyspark.sql import functions as F

    from hquery_php_spark.operators.curate import quality_gate

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    d = quality_gate(docs.select("doc_id", "text"), barrier=barrier)
    return d._jdf.queryExecution().executedPlan().toString()


def test_gate_evaluates_in_project_not_filter(spark):
    plan = _gate_plan(spark, barrier=True)
    chunk = _filter_chunk(plan)
    # the Filter must consume only the projected boolean...
    assert "__keep" in chunk, chunk[:500]
    # ...and none of the gate's HOF machinery may inline into it
    for marker in ("lambdafunction", "CASE WHEN", "regexp_replace"):
        assert marker not in chunk, (
            f"quality-gate expression ({marker}) inlined into FilterExec — "
            f"the pushdown barrier stopped working (70x perf cliff):\n"
            + chunk[:800]
        )
    # the gate really is computed in a Project below the Filter
    below = plan[plan.find("Filter"):]
    assert "lambdafunction" in below, plan[:800]


def test_gate_plan_check_detects_regression(spark):
    # sensitivity: with the barrier removed, the current optimizer DOES
    # push the gate into Filter — so the assertions above genuinely
    # detect the regression.  If THIS test ever fails, Spark stopped
    # pushing projected predicates and the barrier can be retired.
    plan = _gate_plan(spark, barrier=False)
    chunk = _filter_chunk(plan)
    assert "lambdafunction" in chunk or "CASE WHEN" in chunk, chunk[:800]


def test_gate_rows_identical_with_and_without_barrier(spark):
    # the barrier is value-constant: row set must not depend on it
    from hquery_php_spark.operators.curate import CurateOptions, quality_gate

    # synthetic corpus text has few stopwords — same relaxation the
    # driver's curate query uses (__spark_entry__.py)
    o = CurateOptions(gopher_kwargs=dict(min_stop_hits=1))
    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .limit(300)
    )
    a = sorted(r["doc_id"] for r in quality_gate(docs, o, barrier=True).collect())
    b = sorted(r["doc_id"] for r in quality_gate(docs, o, barrier=False).collect())
    assert a == b and len(a) > 0
