"""Kafka integration — exercised only when a broker is configured
(KAFKA_BOOTSTRAP env var + spark-sql-kafka package on the classpath).
The test container has neither, so these skip; the code path is the same
``sources.kafka_stream`` / ``sinks.kafka_sink`` wiring the apps use."""

from __future__ import annotations

import os
import uuid

import pytest

KAFKA = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not KAFKA, reason="no Kafka broker configured (set KAFKA_BOOTSTRAP)"
)


def test_kafka_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from spark_streaming_kafka_example_spark.sources import kafka_batch
    from spark_streaming_kafka_example_spark.streaming.pipelines import sensor_ingest
    from spark_streaming_kafka_example_spark.streaming.sinks import kafka_sink

    from .test_streaming import VALUE_SCHEMA, sensor_json, write_value_batch

    topic = f"t_{uuid.uuid4().hex[:8]}"
    src = str(tmp_path / "src")
    write_value_batch(
        spark, src, [sensor_json(1851632, "2018/06/15 09:12:00", whc=24.1)], 0
    )
    stream = spark.readStream.schema(VALUE_SCHEMA).parquet(src)
    q = kafka_sink(
        sensor_ingest(stream), KAFKA, topic, str(tmp_path / "ck"), mode="append"
    )
    q.processAllAvailable()
    q.stop()
    back = kafka_batch(spark, KAFKA, topic).selectExpr("CAST(value AS STRING) v")
    assert back.filter(F.col("v").contains('"id":1851632')).count() == 1
