"""Plan inspection — assert the physical plan is the one we want.

The reference hand-codes its optimizations (pre-filtering, column
pruning by construction — SURVEY §4); here Catalyst does them, and these
helpers make that VERIFIABLE: tests assert that filters reach the
parquet scan (PushedFilters), that only needed columns are read
(ReadSchema), that small-side joins broadcast, and that no extra
shuffles appear.  A plan regression then fails CI instead of shipping a
100x slowdown at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet/file scan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the column-pruning evidence."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*>)", plan)]


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (formatted mode
    prints each node once in the tree and once as a detail header; count
    the detail headers only)."""
    plan = formatted_plan(df)
    n = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    if n == 0:  # fall back for plan shapes without detail sections
        n = len(re.findall(r"\bExchange\b", plan))
    return n


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))
