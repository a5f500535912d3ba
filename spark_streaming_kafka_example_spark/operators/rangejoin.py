"""Bucketized interval-point range join.

Spark plans a raw inequality join (``p.ts BETWEEN i.start AND i.end``) as a
broadcast-nested-loop / cartesian — O(n*m) and a non-starter at scale. The
scalable composition: quantize time into fixed buckets, explode each
interval onto the buckets it covers, equi-join points on (key, bucket), then
re-apply the exact range predicate. Work is proportional to
|points| + |interval-bucket pairs| + true matches — the classic
bucketize-then-refine range join (cf. pyspark_guide "As-of / range join").

Bucket size trades explode factor vs join selectivity: ~= median interval
length is a good default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["interval_point_join"]


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Rows = (interval row, point row) where point.ts in
    [start, end] (closed bounds, matching SQL BETWEEN) and keys match.
    Columns: all interval columns + point columns suffixed ``_pt`` on
    collisions."""
    i_b0 = F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds)
    i_b1 = F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds)
    iv = intervals.withColumn("_bucket", F.explode(F.sequence(i_b0, i_b1)))
    pt_cols = {
        c: (f"{c}_pt" if c in intervals.columns and c != key else c)
        for c in points.columns
    }
    pt = points.select(
        *[F.col(c).alias(a) for c, a in pt_cols.items()],
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).alias("_bucket"),
    )
    ts_out = pt_cols[ts_col]
    joined = iv.join(pt, [key, "_bucket"]).filter(
        (F.col(ts_out) >= F.col(start_col)) & (F.col(ts_out) <= F.col(end_col))
    )
    return joined.drop("_bucket")
