"""Drive each reference-program entrypoint (apps.py) end-to-end with
bounded inputs, plus source/sink coverage: CSV-with-declared-schema (S4),
console sinks (K1-K3), partition-pruned archive read-back (S5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_streaming_kafka_example_spark import apps
from spark_streaming_kafka_example_spark.schemas import SENSOR_MASTER_SCHEMA
from spark_streaming_kafka_example_spark.sources import load_table, read_csv_master

from .test_streaming import VALUE_SCHEMA, sensor_json, write_value_batch

MASTER_CSV = """sensor_id,field_id
1851632,field1
1851633,field1
1851634,field2
1851635,field3
1851636,field3
"""


def write_master_csv(tmp_path) -> str:
    p = tmp_path / "sensor_field.csv"
    p.write_text(MASTER_CSV)
    return str(p)


def test_csv_master_declared_schema(spark, tmp_path):
    """S4: header consumed, schema declared — never inferred."""
    df = read_csv_master(spark, write_master_csv(tmp_path))
    assert df.schema == SENSOR_MASTER_SCHEMA
    rows = {r.sensor_id: r.field_id for r in df.collect()}
    assert rows[1851632] == "field1" and len(rows) == 5


def test_udf_sql_demo(spark, tmp_path):
    """UdfRegister.scala parity: view + UDF + SQL + show (U1-U3, K9)."""
    out = apps.udf_sql_demo(spark, write_master_csv(tmp_path))
    rows = {r.sensor_id: r.double_field_id for r in out.collect()}
    assert rows[1851634] == "field2field2"


def test_basic_word_count_console(spark, tmp_path):
    """Basic.scala parity on a bounded file source; console sink (K2) must
    run to completion."""
    src = str(tmp_path / "lines")
    write_value_batch(spark, src, ["spark streams words", "spark again"], 0)
    lines = spark.readStream.schema(VALUE_SCHEMA).parquet(src)
    q = apps.basic_word_count(spark, lines=lines)
    q.processAllAvailable()
    q.stop()


def test_kafka_to_console_app_with_injected_source(spark, tmp_path):
    """StreamingWithKafka.scala parity: the Kafka raw frame is injected as a
    bounded (value: string) source; console sink append (K1)."""
    src = str(tmp_path / "raw")
    write_value_batch(
        spark, src, [sensor_json(1851632, "2018/06/15 09:12:00", whc=24.1)], 0
    )
    raw = spark.readStream.schema(VALUE_SCHEMA).parquet(src)
    q = apps.kafka_to_console(spark, raw=raw)
    q.processAllAvailable()
    q.stop()


def test_archive_app_and_partition_pruned_readback(spark, tmp_path):
    """ParquetOutput.scala parity + the S5 read-back: filtering the archive
    on the month partition key must prune partitions at plan time."""
    src = str(tmp_path / "arch_src")
    write_value_batch(
        spark, src,
        [sensor_json(1851632, "2018/06/15 09:12:00", whc=24.1),
         sensor_json(1851633, "2018/07/01 00:00:00", whc=26.0)],
        0,
    )
    raw = spark.readStream.schema(VALUE_SCHEMA).parquet(src)
    out_dir = str(tmp_path / "archive")
    q = apps.kafka_to_parquet_archive(
        spark, out_dir, str(tmp_path / "ckpt"), raw=raw
    )
    q.awaitTermination()

    back = spark.read.parquet(out_dir).filter(F.col("month") == 201806)
    assert back.count() == 1
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(month" in plan  # pruned, not scanned


def test_sliding_window_analysis_app(spark, tmp_path):
    """SlidingWindow.scala parity via injected joined rows: console query
    runs; threshold alert filters (F1)."""
    src = str(tmp_path / "joined_src")
    write_value_batch(
        spark, src,
        [sensor_json(1851632, "2018/06/15 09:12:00", whc=10.0),
         sensor_json(1851632, "2018/06/15 09:13:00", whc=90.0)],
        0,
    )
    raw = spark.readStream.schema(VALUE_SCHEMA).parquet(src)
    from spark_streaming_kafka_example_spark.streaming.pipelines import sensor_ingest

    joined = sensor_ingest(raw).withColumnRenamed("id", "sensor_id").withColumn(
        "field_id", F.lit("field1")
    )
    queries = apps.sliding_window_analysis(spark, joined=joined, alert_topic=None)
    for q in queries:
        q.processAllAvailable()
        q.stop()


def test_foreach_external_app(spark, tmp_path):
    """StreamingWithCasssandra.scala capability: external store receives the
    archive rows via foreachBatch bulk writes."""
    src = str(tmp_path / "ext_src")
    write_value_batch(
        spark, src, [sensor_json(1851632, "2018/06/15 09:12:00", whc=24.1)], 0
    )
    raw = spark.readStream.schema(VALUE_SCHEMA).parquet(src)
    store = str(tmp_path / "store")

    def handler(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(store)

    q = apps.kafka_foreach_external(
        spark, handler, str(tmp_path / "ext_ckpt"), raw=raw
    )
    q.awaitTermination()
    got = spark.read.parquet(store).collect()
    assert len(got) == 1 and got[0].id == 1851632 and got[0].month == "201806"


def test_from_json_failfast_mode(spark):
    """Beyond the reference's silent PERMISSIVE default (SURVEY §1.4):
    FAILFAST surfaces malformed payloads as errors instead of nulls."""
    from spark_streaming_kafka_example_spark.schemas import SENSOR_RAW_SCHEMA

    bad = spark.createDataFrame([("{not json",)], VALUE_SCHEMA)
    df = bad.select(
        F.from_json("value", SENSOR_RAW_SCHEMA, {"mode": "FAILFAST"}).alias("p")
    )
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        df.collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_batch_format_roundtrips(spark, sf_dir, tmp_path):
    """S4/S5 family completeness: the engine reads and writes every
    text/columnar batch format Spark ships (json-lines, csv, orc) with
    declared schemas — no inference — and values survive the round trip."""
    src = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(100)
    )
    expected = {r.event_id: (r.user_id, r.event_type, round(r.value, 6))
                for r in src.collect()}
    for fmt in ("json", "csv", "orc"):
        out = str(tmp_path / f"rt_{fmt}")
        src.write.format(fmt).option("header", "true").save(out)
        back = (
            spark.read.format(fmt)
            .schema(src.schema)
            .option("header", "true")
            .load(out)
        )
        got = {r.event_id: (r.user_id, r.event_type, round(r.value, 6))
               for r in back.collect()}
        assert got == expected, f"{fmt} roundtrip mismatch"


def test_stateful_count_on_rocksdb_state_store(spark, sf_dir, tmp_path):
    """The 100 TB state-store posture (SCALE.md): the same windowed agg runs
    on the RocksDB provider (spill-to-disk state, bounded executor memory)
    and produces the in-memory provider's results."""
    from pyspark.sql import functions as F

    from spark_streaming_kafka_example_spark.plans.stream import (
        events_stream,
        run_to_table,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        agg = (
            events_stream(spark, sf_dir)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("event_type", "n")
        )
        got = run_to_table(spark, agg, "complete")
        expected = (
            load_table(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("event_type", "n")
        )
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_orc_and_json_roundtrip(spark, sf_dir, tmp_path):
    """Engine format breadth beyond the reference's parquet/CSV: documents
    written to ORC and JSON-lines read back value-identical (JSON via the
    declared schema — no inference drift on the long columns)."""
    from spark_streaming_kafka_example_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    expect = {tuple(r) for r in docs.collect()}

    orc_dir = str(tmp_path / "docs_orc")
    docs.write.orc(orc_dir)
    assert {tuple(r) for r in spark.read.orc(orc_dir).collect()} == expect

    json_dir = str(tmp_path / "docs_json")
    docs.write.json(json_dir)
    back = spark.read.schema(docs.schema).json(json_dir)
    assert {tuple(r) for r in back.collect()} == expect
