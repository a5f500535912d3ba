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


def test_partition_pruning_inferred_through_join(spark, tmp_path, sf_dir):
    """At 100 TB a filtered dimension join must prune the partitioned fact
    scan, not read every partition. With the dim filtered on the join key,
    Catalyst infers the equality onto the fact side and prunes statically
    (plan-time): the fact scan's PartitionFilters must carry the literal.
    (Runtime DPP subqueries never materialize in this PySpark build's local
    mode — verified against the canonical catalog-table setup — so the
    static inference path is the one pinned here.)"""
    from pyspark.sql import functions as F

    from spark_streaming_kafka_example_spark.sources import load_table

    part_dir = str(tmp_path / "events_by_type")
    load_table(spark, sf_dir, "events").write.partitionBy("event_type").parquet(
        part_dir
    )
    fact = spark.read.parquet(part_dir)
    dim = (
        load_table(spark, sf_dir, "events")
        .select("event_type").distinct()
        .filter(F.col("event_type") == "purchase")
    )
    joined = fact.join(F.broadcast(dim), "event_type").agg(
        F.sum("value").alias("total")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "PartitionFilters:" in l]
    pruned = [
        l for l in scans
        if "purchase" in l.split("PartitionFilters:")[1].split("PushedFilters:")[0]
    ]
    assert pruned, scans
    assert joined.count() == 1
