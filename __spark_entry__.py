"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``spark_streaming_kafka_example_spark`` (see
SURVEY.md); this module only adapts the plan registry to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_streaming_kafka_example_spark import plans  # noqa: E402

plans.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _apply_session_conf(spark: SparkSession) -> None:
    """The driver owns the SparkSession; re-apply the runtime-settable confs
    our plans rely on (engine.get_session sets the same ones)."""
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.timeParserPolicy": "CORRECTED",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a started session — engine default applies


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _apply_session_conf(spark)
    return plans.QUERIES["flagship_sliding_alert"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""

    def wrap(fn: plans.QueryFn) -> plans.QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _apply_session_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in plans.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted => driver runs
    the weaker rows-only check; used only for non-SQL-expressible ops)."""
    return dict(plans.ORACLE)
