"""Line-delimited-JSON source via the Spark 4 Python DataSource API.

The reference's source surface is fixed formats wired in Scala (SURVEY
§2.1); this module demonstrates the engine's EXTENSION surface — a custom
format registered at runtime (``spark.dataSource.register``) that
participates in normal planning: ``spark.read.format("jsonl")`` with a
declared or inferred schema.

Scale design (the part that matters at 100 TB):
- ``partitions()`` splits every input file into byte-range partitions of
  ``partition_bytes`` (default 32 MB), so one large file fans out across
  the cluster instead of serializing through one task — the classic
  line-oriented InputFormat contract.
- Newline alignment: a partition that does not start at offset 0 skips
  its (partial) first line — the previous partition reads one line past
  its end boundary instead. Every line is read exactly once, no matter
  where the byte boundaries fall.
- PERMISSIVE parsing: a malformed JSON line or a missing key yields
  nulls for the affected columns (the from_json convention, P2), never a
  task failure.

Batch-only by design: streaming JSONL ingestion goes through the file
stream source on a directory (``sources.file_stream``), which already
handles discovery/exactly-once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

__all__ = ["JsonlDataSource", "register_jsonl", "read_jsonl"]

_DEFAULT_PARTITION_BYTES = 32 * 1024 * 1024


class _Slice(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _infer_field(value) -> T.DataType:
    # bool before int: bool is an int subclass in Python
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    return T.StringType()


class JsonlReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl source requires a path")
        self.partition_bytes = int(
            options.get("partition_bytes", _DEFAULT_PARTITION_BYTES)
        )

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".jsonl", ".json", ".ndjson"))
            )
        return [self.path]

    def partitions(self) -> list[_Slice]:
        slices = []
        for f in self._files():
            size = os.path.getsize(f)
            start = 0
            while start < size or (start == 0 and size == 0):
                end = min(start + self.partition_bytes, size)
                slices.append(_Slice(f, start, end))
                if end >= size:
                    break
                start = end
        return slices

    def read(self, partition: _Slice):
        names = [f.name for f in self.schema.fields]
        casts = {
            f.name: (bool if isinstance(f.dataType, T.BooleanType)
                     else int if isinstance(f.dataType, T.LongType)
                     else float if isinstance(f.dataType, T.DoubleType)
                     else str)
            for f in self.schema.fields
        }
        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            if partition.start > 0:
                fh.readline()  # partial line — owned by the previous slice
            while fh.tell() <= partition.end:
                line = fh.readline()
                if not line:
                    break
                line = line.strip()
                if not line:
                    continue
                try:
                    obj = json.loads(line)
                    if not isinstance(obj, dict):
                        raise ValueError("not an object")
                except (json.JSONDecodeError, ValueError):
                    yield tuple(None for _ in names)  # PERMISSIVE
                    continue
                row = []
                for n in names:
                    v = obj.get(n)
                    if v is None:
                        row.append(None)
                    else:
                        try:
                            row.append(casts[n](v))
                        except (TypeError, ValueError):
                            row.append(None)
                yield tuple(row)


class JsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl"

    def schema(self) -> T.StructType:
        """Infer from the first non-empty line when the caller declared no
        schema (S4's declared-schema path is ``.schema(...)`` on the
        reader, which bypasses this)."""
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl source requires a path")
        probe = path
        if os.path.isdir(path):
            cands = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith((".jsonl", ".json", ".ndjson"))
            )
            if not cands:
                raise ValueError(f"no JSONL files under {path}")
            probe = cands[0]
        with open(probe, "rb") as fh:
            for raw in fh:
                raw = raw.strip()
                if raw:
                    first = json.loads(raw)
                    return T.StructType(
                        [T.StructField(k, _infer_field(v), True)
                         for k, v in first.items()]
                    )
        raise ValueError(f"cannot infer schema from empty file {probe}")

    def reader(self, schema: T.StructType) -> JsonlReader:
        return JsonlReader(schema, dict(self.options))


def register_jsonl(spark: SparkSession) -> None:
    """Idempotently register the format for this session."""
    spark.dataSource.register(JsonlDataSource)


def read_jsonl(spark: SparkSession, path: str, schema=None, **options):
    register_jsonl(spark)
    reader = spark.read.format("jsonl").options(path=path, **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load()
