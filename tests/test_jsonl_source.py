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


def test_jsonl_inference_merges_probe_window(spark, tmp_path):
    """Schema inference must merge keys/types across the probe window
    (r07 ADVICE), not stop at the first parseable object: late-appearing
    keys exist, a null-first field takes its later-observed type,
    long+double widens to double, and a hard conflict widens to string."""
    p = str(tmp_path / "m.jsonl")
    _write(
        p,
        [
            {"id": 1, "maybe": None, "num": 1, "mixed": 7},
            {"id": 2, "maybe": 2.5, "num": 0.5, "late": "x"},
            {"id": 3, "mixed": "seven"},
        ],
    )
    df = read_jsonl(spark, p)
    got = {f.name: f.dataType for f in df.schema.fields}
    assert got == {
        "id": T.LongType(),
        "maybe": T.DoubleType(),   # null first, double later
        "num": T.DoubleType(),     # long + double widen
        "mixed": T.StringType(),   # long + string conflict
        "late": T.StringType(),    # key absent from line 1
    }
    # and the null-only probe case types as string (documented default)
    p2 = str(tmp_path / "n.jsonl")
    _write(p2, [{"id": 1, "allnull": None}])
    assert dict(read_jsonl(spark, p2).dtypes)["allnull"] == "string"


def test_jsonl_string_cast_renders_json_text(spark, tmp_path):
    """Casting non-string JSON values into a declared string column must
    yield JSON text — {"a":1}, true — exactly like spark.read.json, never
    Python reprs (r07 ADVICE: str() gave "{'a': 1}" / "True")."""
    p = str(tmp_path / "s.jsonl")
    with open(p, "w") as fh:
        fh.write('{"id": 1, "payload": {"a": 1, "b": [2, 3]}}\n')
        fh.write('{"id": 2, "payload": [1, {"c": true}]}\n')
        fh.write('{"id": 3, "payload": true}\n')
        fh.write('{"id": 4, "payload": 2.5}\n')
        fh.write('{"id": 5, "payload": "plain"}\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("payload", T.StringType())]
    )
    got = {
        r.id: r.payload
        for r in read_jsonl(spark, p, schema=schema).collect()
    }
    exp = {
        r.id: r.payload
        for r in spark.read.schema(schema).json(p).collect()
    }
    # spark.read.json returns the RAW input substring for nested values
    # (original whitespace); we re-serialize via json.dumps (the r07
    # ADVICE fix), so nested rows compare as parsed JSON and scalars
    # compare exactly.
    for rid in (1, 2):
        assert json.loads(got[rid]) == json.loads(exp[rid]), rid
    for rid in (3, 4, 5):
        assert got[rid] == exp[rid], rid
    assert got[1] == '{"a":1,"b":[2,3]}'
    assert got[3] == "true"
