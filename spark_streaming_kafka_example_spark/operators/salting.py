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

__all__ = ["salted_agg", "salted_join"]

_REAGG = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def _salt_col(df: DataFrame, salt_buckets: int):
    """Salt expression that spreads a hot key even when its rows are
    byte-identical: content hash over the hashable columns (MapType is not
    xxhash64-able) folded with monotonically_increasing_id(), so identical
    rows still land in different buckets. The salt's value never affects the
    RESULT (partials re-aggregate / dim side is replicated to every bucket),
    only the spread, so the id's non-determinism across retries is safe."""
    hashable = [
        F.col(f.name)
        for f in df.schema.fields
        if "map<" not in f.dataType.simpleString()
    ]
    return F.pmod(
        F.xxhash64(*hashable, F.monotonically_increasing_id()),
        F.lit(salt_buckets),
    ).cast("int")


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
    salted = df.withColumn("_salt", _salt_col(df, salt_buckets))
    partial_aggs = []
    for out, (agg, col) in measures.items():
        fn = F.count if agg == "count" else _REAGG[agg]
        partial_aggs.append(fn(col).alias(f"_p_{out}"))
    partials = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [
        _REAGG[agg](f"_p_{out}").alias(out) for out, (agg, _) in measures.items()
    ]
    return partials.groupBy(*keys).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: spread each hot fact key across ``salt_buckets``
    subkeys, replicate the (small) right side once per bucket, and join on
    (key, salt). Result-identical to ``fact.join(dim, key, how)``.

    Use when the small side is too big to broadcast outright but a hot fact
    key overwhelms one reducer of a shuffle join and AQE's skew splitting
    can't kick in (e.g. the join feeds a window function that pins
    partitioning). Shuffle volume: |fact| + buckets x |dim| — cheap whenever
    dim << fact, which is the only regime where key skew hurts.

    Only inner/left joins make sense here (every fact row keeps exactly the
    matches it had; dim-preserving sides would see replicated dim rows).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_fact = fact.withColumn("_salt", _salt_col(fact, salt_buckets))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = salted_fact.join(replicated_dim, [key, "_salt"], how)
    return joined.drop("_salt")
