"""Salted two-phase aggregation for skewed group keys.

When one group key carries a disproportionate share of rows (hot user, hot
event type), a plain groupBy sends that share through a single reducer.
Salting splits each key into ``salt_buckets`` subkeys for a partial
aggregate, then combines partials in a second (tiny) aggregate — the hot
key's work spreads across the cluster. AQE's skew handling covers joins;
for aggregations over pathological keys this is the explicit tool.

Result-identical to the plain groupBy for any commutative re-aggregatable
measure (sum/count/min/max); avg must be carried as (sum, count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_agg"]

_REAGG = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """``measures`` maps output column -> (agg, input column) with agg in
    {sum, count, min, max}. Example::

        salted_agg(events, ["event_type"], {"total": ("sum", "value"),
                                            "n": ("count", "event_id")})
    """
    # Content-hash salt: spreads a hot key's rows across buckets no matter
    # how the input is partitioned (partition-id or rand() salts either
    # don't redistribute or aren't reproducible).
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets)).cast("int")
    )
    partial_aggs = []
    for out, (agg, col) in measures.items():
        fn = F.count if agg == "count" else _REAGG[agg]
        partial_aggs.append(fn(col).alias(f"_p_{out}"))
    partials = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [
        _REAGG[agg](f"_p_{out}").alias(out) for out, (agg, _) in measures.items()
    ]
    return partials.groupBy(*keys).agg(*final_aggs)
