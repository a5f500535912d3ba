"""Joins, aggregations, event-time windows (SURVEY §2.5-§2.7).

Everything here is declarative DataFrame API: Catalyst chooses broadcast vs
shuffle joins, inserts partial/final hash aggregates, and (in streaming)
wires StateStoreRestore/Save around the windowed aggregation. No custom
physical operators are needed for parity (SURVEY §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "enrich_join",
    "windowed_sum",
    "alert_filter",
    "group_count",
]

# The window-agg input measures (reference TumblingWindow.scala:53-58).
SENSOR_MEASURES = ("temperature", "humidity", "ph", "whc")


def enrich_join(
    stream_df: DataFrame,
    master_df: DataFrame,
    key: str = "sensor_id",
    how: str = "left_outer",
    broadcast_master: bool = True,
) -> DataFrame:
    """Stream-static left-outer equi-join (SURVEY J1; reference
    StreamingWithKafkaJoinedData.scala:46).

    Deviations, per SURVEY J1: join on the column *name* so the duplicate
    key column the reference emitted is deduped.

    Scale: the master side of a stream-static enrich is a dimension table —
    broadcast it (the reference's 5-row CSV planned as BroadcastHashJoin
    automatically; at 100 TB the stream side must never shuffle for an
    enrich, so we hint explicitly and leave AQE as the fallback when the
    dimension outgrows the threshold).
    """
    if broadcast_master:
        master_df = F.broadcast(master_df)
    return stream_df.join(master_df, on=key, how=how)


def windowed_sum(
    df: DataFrame,
    ts_col: str = "timestamp",
    group_col: str = "field_id",
    window_duration: str = "5 minutes",
    slide_duration: str | None = "1 minute",
    measures: Sequence[str] = SENSOR_MEASURES,
    watermark: str | None = None,
    prefix: str = "sum_",
) -> DataFrame:
    """Tumbling/sliding event-time window multi-sum (SURVEY A2/A3, W1-W4;
    reference TumblingWindow.scala:52-58, SlidingWindow.scala:52-59).

    The reference computes ``sum`` but aliases the results ``avg_*``
    (SURVEY §2.6 semantic trap); we keep the computation under honest
    ``sum_*`` names. Pass ``slide_duration=None`` for a tumbling window.
    ``watermark`` (e.g. "10 minutes", reference SlidingWindow.scala:52) only
    matters on streaming inputs, where it bounds state and drops late rows.

    Scale: one shuffle on (window, group) with map-side partial aggregation;
    skewed groups are split by AQE. State size in streaming is bounded by
    watermark horizon x groups — exactly how it must behave at 100 TB/day.
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    )
    aggs = [F.sum(m).alias(f"{prefix}{m}") for m in measures]
    out = df.groupBy(win, F.col(group_col)).agg(*aggs)
    # Window-bounds extraction (SURVEY W4; reference TumblingWindow.scala:60).
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        group_col,
        *[f"{prefix}{m}" for m in measures],
    )


def alert_filter(df: DataFrame, col: str, threshold: float = 25.0) -> DataFrame:
    """Post-aggregation HAVING-style threshold filter (SURVEY F1; reference
    SlidingWindow.scala:63 ``filter($"avg_whc" < 25.0)``)."""
    return df.filter(F.col(col) < F.lit(threshold))


def group_count(df: DataFrame, *keys: str) -> DataFrame:
    """Running group-count (SURVEY A1; reference Basic.scala:23
    ``groupBy("value").count()``). In streaming complete/update mode this is
    also the capability-equivalent of the DStream ``updateStateByKey`` word
    count (SURVEY A4)."""
    return df.groupBy(*keys).count()
