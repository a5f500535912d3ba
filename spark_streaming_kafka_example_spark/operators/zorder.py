"""Z-order (Morton-curve) layout for multi-dimensional data skipping.

A single sort key gives parquet min/max skipping on ONE column; queries
filtering the other columns read every file. Interleaving the bits of
several normalized key columns into one z-value and range-partitioning +
sorting by it localizes EVERY interleaved dimension: each output file's
min/max envelope is tight on all of them, so point/range predicates on any
single dimension skip most files (the technique behind Delta/Iceberg
OPTIMIZE ZORDER, here with nothing but built-in expressions).

Scale notes: the z-value is pure bit arithmetic inside whole-stage codegen
(no UDF); `repartitionByRange` samples boundaries (no global sort) and
`sortWithinPartitions` keeps each file internally ordered so row-group
stats are tight too. Normalization uses per-column min/max computed in one
tiny aggregate — at 100 TB compute them from table statistics instead, or
use fixed domain bounds; rank-based normalization (equi-depth) is the
upgrade when a dimension is heavily skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["z_value", "zorder_layout"]


def z_value(cols: list[Column | str], bits: int = 12) -> Column:
    """Morton code: interleave the low ``bits`` bits of each (already
    normalized to [0, 2^bits)) integer column. Column i contributes bit b
    to output position b*len(cols)+i, so all dimensions alternate from the
    least-significant end."""
    if bits * len(cols) > 63:
        raise ValueError(
            f"z_value needs bits*len(cols) <= 63 (got {bits}*{len(cols)}="
            f"{bits * len(cols)}); JVM shiftleft wraps shifts mod 64, which "
            "would silently corrupt the Morton ordering — lower bits"
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    acc = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            acc = acc.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return acc


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
) -> DataFrame:
    """Return ``df`` arranged for a z-ordered write: each input column is
    min/max-normalized to ``bits`` bits, the z-value computed, and the rows
    range-partitioned into ``n_files`` and sorted by it. Write the result
    with ``.write.parquet`` to get one tight-enveloped file per partition.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    stats = df.agg(*aggs).collect()[0]  # one scalar row: bounds only
    # An all-NULL interleave column has no bounds: drop it from the
    # interleave set and keep clustering the rest — otherwise a single
    # fully-NULL column (e.g. one day's dead dimension) would silently
    # abandon the whole layout while a 99%-NULL column lays out fine.
    cols = [c for c in cols if stats[f"_min_{c}"] is not None]
    if not cols:
        return df  # empty input or every column all-NULL: nothing to order
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = stats[f"_min_{c}"], stats[f"_max_{c}"]
        span = max(float(hi) - float(lo), 1.0)
        # NULL keys are bucketed deliberately at the low end of the curve
        # (coalesce to 0) instead of propagating to a NULL z-value.
        scaled.append(
            F.coalesce(
                F.least(
                    F.lit(top),
                    ((F.col(c).cast("double") - F.lit(float(lo)))
                     / F.lit(span) * F.lit(top)).cast("long"),
                ),
                F.lit(0).cast("long"),
            )
        )
    with_z = df.withColumn("_z", z_value(scaled, bits))
    return (
        with_z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
