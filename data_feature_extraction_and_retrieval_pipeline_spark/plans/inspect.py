"""Physical-plan inspection utilities.

Used by tests to assert the plans we *want* (broadcast joins for dims,
pushed parquet filters, TakeOrderedAndProject for top-k) — not merely
plans that produce correct rows. At 100 TB the difference between a
BroadcastHashJoin and an accidental SortMergeJoin on a dim table is
the difference between seconds and hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_summary(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_broadcast_join(df: DataFrame) -> None:
    text = _plan_text(df)
    assert "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text, (
        "expected a broadcast join in plan:\n" + text
    )


def pushed_filters(df: DataFrame) -> str:
    """The parquet-scan PushedFilters section of the formatted plan."""
    return "\n".join(
        line
        for line in plan_summary(df).splitlines()
        if "PushedFilters" in line or "ReadSchema" in line
    )


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in _plan_text(df)
