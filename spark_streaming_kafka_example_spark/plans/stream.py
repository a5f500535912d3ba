"""Streaming queries run to a deterministic batch-equivalent result
(SURVEY §5): bounded file source + trigger(availableNow) + memory sink, so
the same windowed-agg arithmetic is DuckDB-checkable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import file_stream, load_table
from . import register

# placeholder — populated in Phase 2
