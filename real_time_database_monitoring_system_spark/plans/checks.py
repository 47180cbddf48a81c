"""Physical-plan assertions.

The 100 TB posture is enforced by *looking at the plan*, not hoping:
tests assert that filters reach the parquet scan (PushedFilters),
dimension joins broadcast, top-K plans TakeOrderedAndProject, and the
shuffle count stays at the budgeted number for each operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears in the scan's PushedFilters list."""
    plan = explain_str(df)
    return any(
        "PushedFilters" in line and fragment in line for line in plan.splitlines()
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df, "simple")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded)."""
    plan = explain_str(df, "simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count codegen stages. AQE's unexecuted plan hides codegen
    annotation, so both the `*(n)` markers (AQE off) and
    WholeStageCodegen nodes (formatted/executed plans) are counted."""
    plan = explain_str(df, "simple")
    stars = {
        line.split("*(")[1].split(")")[0]
        for line in plan.splitlines()
        if "*(" in line
    }
    if stars:
        return len(stars)
    return sum(1 for line in plan.splitlines() if "WholeStageCodegen" in line)
