"""Inspect Catalyst physical plans.

The optimizer guarantees SURVEY.md 4.2 relies on (predicate pushdown into
parquet scans, column pruning, broadcast joins for the entity dictionary,
TakeOrderedAndProject for top-k, partial aggregation) are asserted by
tests/test_plans.py using these helpers — a plan regression fails CI, not a
production run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string `df.explain(mode)` would print."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_contains(df: DataFrame, *needles: str, mode: str = "formatted") -> bool:
    plan = physical_plan(df, mode)
    return all(n in plan for n in needles)


def first_index(df: DataFrame, needle: str, mode: str = "formatted") -> int:
    """Offset of ``needle`` in the plan string; -1 when absent.  In Spark's
    tree rendering parents print before children, so a smaller offset means
    closer to the root (later in execution)."""
    return physical_plan(df, mode).find(needle)
