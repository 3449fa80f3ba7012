"""Plan inspection: assert the optimizer actually did its job.

Used by tests to pin the scale-critical plan properties (SURVEY §4):
filters pushed to the parquet reader, scans pruned to the projected
columns, broadcast joins where a dimension is small, and wide
WholeStageCodegen spans.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears in the scan's PushedFilters list."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (ReadSchema)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)
            if len(inner) == 2:
                body = inner[1].rsplit(">", 1)[0]
                cols.extend(
                    f.split(":")[0].strip() for f in body.split(",") if ":" in f
                )
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen spans in the physical plan.

    Uses the executed-plan string: explain("formatted") marks codegen'd
    nodes only with a `*` prefix, and under AQE the codegen spans exist
    only in the final (post-execution) plan."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd operators render as `*(N) OperatorName`; N is the span id
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
