"""Plan inspection: assert the physical plan is the one we want.

Used in tests and the bench to keep the engine honest at scale:
column pruning must reach the scan (ReadSchema), filters must push down
(PushedFilters), and expression stages should sit inside
WholeStageCodegen spans.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from typing import Dict

from pyspark.sql import DataFrame

__all__ = ["explain_str", "plan_facts"]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def plan_facts(df: DataFrame) -> Dict[str, object]:
    """Facts a scale review cares about, parsed from the formatted plan."""
    plan = explain_str(df, "formatted")
    return {
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "read_schema_cols": _read_schema_width(plan),
        "wholestage_codegen": "codegen id" in plan or "WholeStageCodegen" in plan,
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "plan": plan,
    }


def _read_schema_width(plan: str) -> int:
    width = 0
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1]
            width = max(width, schema.count(":"))
    return width
