"""Python DataSource API (Spark 4) JSONL source: schema inference,
declared schemas, PERMISSIVE malformed handling, and — the scale
contract — newline-aligned byte-range partitioning that reads every line
exactly once no matter where the split boundaries fall."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from spark_streaming_kafka_example_spark.sources.jsonl import (
    JsonlReader,
    read_jsonl,
)

ROWS = [
    {"id": i, "name": f"user{i}", "score": i * 0.5, "active": i % 2 == 0}
    for i in range(200)
]


def _write(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_jsonl_matches_builtin_json_reader(spark, tmp_path):
    p = str(tmp_path / "d.jsonl")
    _write(p, ROWS)
    got = read_jsonl(spark, p).orderBy("id").toPandas()
    exp = spark.read.json(p).select("id", "name", "score", "active").orderBy(
        "id"
    ).toPandas()
    assert got.columns.tolist() == ["id", "name", "score", "active"]
    assert (got.values == exp.values).all()


def test_jsonl_partition_boundaries_read_each_line_once(spark, tmp_path):
    """Force many byte-range slices (far smaller than the file) and require
    the same multiset of rows as one slice — the newline-alignment
    contract under arbitrary boundary placement."""
    p = str(tmp_path / "d.jsonl")
    _write(p, ROWS)
    one = read_jsonl(spark, p, partition_bytes=1 << 30)
    for pb in (64, 97, 256, 1000):  # boundaries mid-line on purpose
        df = read_jsonl(spark, p, partition_bytes=pb)
        assert df.rdd.getNumPartitions() > 1
        assert sorted(r.id for r in df.collect()) == sorted(
            r.id for r in one.collect()
        )


def test_jsonl_declared_schema_and_permissive_nulls(spark, tmp_path):
    """S4's declared-schema path plus P2's PERMISSIVE convention: missing
    keys and malformed lines surface as nulls, never task failures."""
    p = str(tmp_path / "m.jsonl")
    with open(p, "w") as fh:
        fh.write(json.dumps({"id": 1, "name": "ok"}) + "\n")
        fh.write("{broken json!!\n")
        fh.write(json.dumps({"id": 3}) + "\n")
        fh.write(json.dumps({"id": "not-an-int", "name": "x"}) + "\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    rows = read_jsonl(spark, p, schema=schema).collect()
    assert len(rows) == 4
    by_name = {r.name: r for r in rows}
    assert by_name["ok"].id == 1
    assert by_name["x"].id is None  # uncastable value -> null cell
    assert sum(1 for r in rows if r.id is None and r.name is None) == 1


def test_jsonl_directory_input_and_slice_plan(spark, tmp_path):
    """Directory inputs enumerate every file; the slice plan covers each
    file's full byte range with non-overlapping, contiguous slices."""
    d = tmp_path / "dir"
    d.mkdir()
    _write(str(d / "a.jsonl"), ROWS[:50])
    _write(str(d / "b.jsonl"), ROWS[50:120])
    df = read_jsonl(spark, str(d))
    assert df.count() == 120
    reader = JsonlReader(
        T.StructType([T.StructField("id", T.LongType())]),
        {"path": str(d), "partition_bytes": "128"},
    )
    by_file: dict[str, list] = {}
    for s in reader.partitions():
        by_file.setdefault(s.path, []).append((s.start, s.end))
    import os

    for path, spans in by_file.items():
        spans.sort()
        assert spans[0][0] == 0 and spans[-1][1] == os.path.getsize(path)
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))


def test_jsonl_option_and_schema_validation(spark, tmp_path):
    """Invalid inputs fail loudly at plan time (r07 review): unsupported
    declared types, non-positive partition_bytes; a malformed FIRST line
    doesn't break inference (it's data, not a planning failure)."""
    import pytest

    p = str(tmp_path / "v.jsonl")
    with open(p, "w") as fh:
        fh.write("{not json\n")
        fh.write(json.dumps({"id": 1, "name": "a"}) + "\n")
    # inference skips the malformed head line
    df = read_jsonl(spark, p)
    assert set(df.columns) == {"id", "name"} and df.count() == 2
    with pytest.raises(Exception, match="unsupported type"):
        read_jsonl(
            spark, p,
            schema=T.StructType([T.StructField("ts", T.TimestampType())]),
        ).collect()
    with pytest.raises(Exception, match="partition_bytes"):
        read_jsonl(spark, p, partition_bytes=0).collect()
