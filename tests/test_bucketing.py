"""Bucketing: the at-scale mechanism for shuffle-free repeated joins
(SCALE.md "Joins"). Write both sides bucketed on the join key, join with
broadcast disabled, and assert the plan has NO hash-partitioning exchange —
the join runs co-located."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka_example_spark.sources import load_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_eliminates_exchange(spark, sf_dir, tmp_path, no_broadcast):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path}/wh'")
    try:
        (
            load_table(spark, sf_dir, "orders")
            .write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable("bktest.orders_b")
        )
        (
            load_table(spark, sf_dir, "customer")
            .write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .saveAsTable("bktest.customer_b")
        )
        joined = spark.table("bktest.orders_b").join(
            spark.table("bktest.customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located by buckets
        # and the co-located join still computes the right thing
        n = joined.count()
        baseline = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert n == baseline
    finally:
        spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
        spark.sql("DROP TABLE IF EXISTS bktest.customer_b")
        spark.sql("DROP DATABASE IF EXISTS bktest")
