"""Gap-based sessionization (batch twin of streaming session_window).

Classic two-window composition: flag rows whose gap to the previous event
exceeds the threshold, then a running sum of flags assigns session ids.
One shuffle+sort per key; identical semantics to DuckDB window SQL, so it
is oracle-checkable (the streaming variant uses F.session_window instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["sessionize"]


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign ``session_id`` (1-based per key, in time order).

    Gap comparison uses second-truncated epochs (matching DuckDB
    date_diff('second', ...) boundary semantics).
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
