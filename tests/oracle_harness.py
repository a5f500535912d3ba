"""Local replica of the driver's DuckDB-oracle differential check
(SURVEY §5): run the PySpark query and the oracle SQL on the same parquet,
then compare row count + dtypes + order-insensitive values.

Stricter than the driver (exact cell equality after canonicalization) so
that passing here makes passing there very likely.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import pandas as pd

from spark_streaming_kafka_example_spark.sources import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v: Any) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        if v == 0:
            return repr(0.0)  # -0.0 == 0.0: DuckDB round() keeps the IEEE
            # sign, Spark's BigDecimal round never emits it — same value.
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return repr(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> None:
    actual = spark_df.toPandas()
    expected = con.execute(sql).df()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch spark={sorted(actual.columns)} "
        f"duckdb={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count spark={len(actual)} duckdb={len(expected)}"
    )
    a, e = canonicalize(actual), canonicalize(expected)
    mismatches = [(x, y) for x, y in zip(a, e) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} row diffs; first: {mismatches[0]}"
