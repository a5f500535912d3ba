"""Arbitrary keyed streaming state (SURVEY §2.9 T4, A4).

The reference's DStream ``updateStateByKey`` word count
(reference BasicStreaming.scala:17,23-25: state = running occurrence count
per word) is reproduced with ``applyInPandasWithState`` — the Structured
Streaming arbitrary-state operator. State lives in the executor-side state
store (RocksDB-backed on a real cluster), partitioned by key: scales
horizontally, survives restarts via the checkpoint.

Note ``groupBy(key).count()`` in update/complete mode already covers the
*capability* (SURVEY A4); this module exists for exact arbitrary-state
parity and as the template for richer per-key state machines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = ["stateful_running_count"]

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType()),
        T.StructField("count", T.LongType()),
    ]
)
_STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType())])


def _update_count(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """updateCount(newValues, lastSum) = newValues.size + lastSum.getOrElse(0)
    (reference BasicStreaming.scala:23-25) — counts occurrences, ignores
    values, emits the updated total for the key."""
    new_occurrences = sum(len(pdf) for pdf in pdfs)
    (prior,) = state.get if state.exists else (0,)
    total = prior + new_occurrences
    state.update((total,))
    yield pd.DataFrame({"word": [key[0]], "count": [total]})


def stateful_running_count(words: DataFrame, key_col: str = "word") -> DataFrame:
    """Running per-word occurrence count with explicit user state."""
    return words.groupBy(key_col).applyInPandasWithState(
        _update_count,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
