"""Streaming queries run to a deterministic batch-equivalent result
(SURVEY §5 streaming determinism): bounded file source +
trigger(availableNow=True) + memory sink; ``awaitTermination`` returns when
the backlog is drained, and the memory table is the exact table a batch run
would produce — so the same DuckDB SQL oracles the streaming machinery
(incremental window aggregation, stream-static join, state store).

Watermark late-drop behavior is NOT oracle-checkable this way (it needs
multiple micro-batches) — tests/test_streaming.py covers it by feeding
batches through a file directory incrementally.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..analytics import enrich_join
from ..sources import load_table
from ..streaming.sinks import memory_sink
from ..streaming.stateful import stateful_running_count, stateful_topk_fold
from . import register

# Physical schema of events.parquet as the *streaming* reader sees it (file
# streams require an explicit schema). The testdata generator has shipped
# ``ts`` as both TIMESTAMP(NANOS) (surfaced as raw-nanos LongType under
# nanosAsLong) and TIMESTAMP(MICROS) (a plain TimestampType) across rounds,
# so the schema is chosen per-directory from the parquet footer.


def _events_schema(sf_dir: str) -> tuple[T.StructType, bool]:
    """(streaming schema for events.parquet, whether ts is raw nanos).

    Mirrors what the batch reader (sources.load_table) surfaces for the same
    footer:
    - TIMESTAMP(NANOS): raw-nanos LongType (nanosAsLong), converted below
      to TimestampType via timestamp_micros(ts div 1000).
    - TIMESTAMP(MICROS/MILLIS, naive or UTC-adjusted): TimestampType.
      NOT TimestampNTZType: event-time watermarks require TimestampType
      (Spark raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ), so both
      readers unify on it — load_table casts its inferred NTZ the same way.
      Under the pinned UTC session the naive->instant read is wall-clock
      identity, which is what keeps DuckDB value parity.
    """
    ts_is_nanos = True
    try:
        import pyarrow.parquet as pq

        t = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
        ts_is_nanos = getattr(t, "unit", "ns") == "ns"
    except (ImportError, OSError, KeyError, ValueError) as exc:
        # ValueError covers pyarrow's ArrowInvalid (its subclass) on a
        # corrupt/truncated footer — r03 ADVICE: without it the documented
        # warn-and-assume fallback never fired for exactly that case.
        # Unreadable footer: assume the original nanos layout, but say so —
        # a mis-sniffed round would otherwise fail opaquely downstream.
        import warnings

        warnings.warn(
            f"events.parquet footer unreadable ({exc!r}); assuming "
            "TIMESTAMP(NANOS) layout for the streaming schema",
            stacklevel=2,
        )
    ts_type: T.DataType = T.LongType() if ts_is_nanos else T.TimestampType()
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    return schema, ts_is_nanos

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded view of events.parquet with ts as TimestampType
    (mirrors sources.load_table, including the ns->micros conversion when
    the file carries raw nanos)."""
    schema, ts_is_nanos = _events_schema(sf_dir)
    # Stream the directory with a glob filter (a bare file path breaks the
    # source's basePath/partition discovery on some plans).
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_is_nanos:
        # Integer div, NOT /1000: epoch nanos exceed double's 2^53 mantissa.
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )


def run_to_table(
    spark: SparkSession,
    df: DataFrame,
    mode: str,
    require_single_batch: bool = False,
) -> DataFrame:
    """Start df -> memory sink with availableNow, drain, return the table.

    ORACLE HARNESS ONLY: a memory sink (append mode especially) materializes
    the entire relation on the driver — fine for bounded sf0.01 parity runs,
    never the production idiom. Real pipelines write through the parquet /
    kafka / foreachBatch sinks in streaming/sinks.py (checkpointed,
    executor-side, exactly-once).

    Update-mode parity additionally assumes the whole bounded source fits in
    ONE micro-batch (CLAUDE.md: "update only safe single-batch"): a second
    batch would re-emit updated rows for the same key and the memory table
    would hold both versions. availableNow over a single parquet file
    satisfies that today; this guard turns a silent parity break (e.g. a
    multi-file testdata drop or a maxFilesPerTrigger option) into a loud one.

    ``require_single_batch`` applies the same loud guard to append-mode
    queries whose RESULT depends on intra-shard arrival order (e.g. the
    greedy packing fold): their bounded drain equals the batch oracle only
    when everything lands in one micro-batch.
    """
    name = f"mem_{uuid.uuid4().hex[:10]}"
    query = memory_sink(df, name, mode=mode)
    query.awaitTermination()
    if require_single_batch and mode != "update":
        data_batches = sum(
            1 for p in query.recentProgress if p["numInputRows"] > 0
        )
        if data_batches > 1:
            raise AssertionError(
                f"order-sensitive oracle run processed {data_batches} "
                "micro-batches; the fold would run in arrival order, not "
                "the global order the oracle replays. Re-bound the source "
                "to a single batch before comparing."
            )
    if mode == "update":
        data_batches = sum(
            1 for p in query.recentProgress if p["numInputRows"] > 0
        )
        if data_batches > 1:
            raise AssertionError(
                f"update-mode oracle run processed {data_batches} micro-batches;"
                " per-key update rows would be duplicated in the memory table."
                " Re-bound the source to a single batch or dedupe to the last"
                " update per key before comparing."
            )
    return spark.table(name)


# ---------------------------------------------------------------------------
# W1/W2 + A2 through the real streaming machinery: watermark + tumbling
# window in complete mode (complete keeps all windows => batch-equivalent;
# reference TumblingWindow.scala:51-65 runs the same plan in update mode).
# ---------------------------------------------------------------------------


@register(
    "stream_tumbling_complete",
    """
    SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
           time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute'
               AS window_end,
           event_type,
           round(sum(value), 2) AS sum_value,
           count(*) AS n_events
    FROM events GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute"), "event_type")
        .agg(
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "sum_value",
            "n_events",
        )
    )
    return run_to_table(spark, agg, "complete")


# ---------------------------------------------------------------------------
# A3/W3 in update mode (reference SlidingWindow.scala:52-66). The testdata is
# one file -> one micro-batch -> update output == batch aggregation.
# ---------------------------------------------------------------------------


@register(
    "stream_sliding_update",
    """
    WITH panes AS (
        SELECT time_bucket(INTERVAL '1 minute', ts) - i.i * INTERVAL '1 minute'
                   AS window_start,
               event_type, value
        FROM events, range(5) i(i)
    )
    SELECT window_start,
           window_start + INTERVAL '5 minutes' AS window_end,
           event_type,
           round(sum(value), 2) AS sum_value
    FROM panes GROUP BY 1, 2, 3
    """,
)
def stream_sliding_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes", "1 minute"), "event_type")
        .agg(F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "sum_value",
        )
    )
    return run_to_table(spark, agg, "update")


# ---------------------------------------------------------------------------
# J1 through streaming: stream-static broadcast enrich join, append mode
# (reference StreamingWithKafkaJoinedData.scala:46-54).
# ---------------------------------------------------------------------------


@register(
    "stream_enrich_join_append",
    """
    SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_enrich_join_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = enrich_join(stream, dim, key="user_id", how="left_outer").select(
        "event_id", "user_id", "event_type", "c_mktsegment"
    )
    return run_to_table(spark, joined, "append")


# ---------------------------------------------------------------------------
# A1 through streaming: running word count, complete mode (reference
# Basic.scala:17-25 — the structured socket word count; file source stands in
# for the socket per SURVEY S2 note).
# ---------------------------------------------------------------------------

WORDCOUNT_ORACLE = """
    SELECT word, count(*) AS count
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
"""


@register("stream_wordcount_complete", WORDCOUNT_ORACLE)
def stream_wordcount_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = documents_stream(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("word")
    )
    counts = words.groupBy("word").count()
    return run_to_table(spark, counts, "complete")


# ---------------------------------------------------------------------------
# A4/T4: arbitrary keyed state (applyInPandasWithState running count —
# the updateStateByKey parity, reference BasicStreaming.scala:17). One
# bounded batch => totals equal the batch word count, so it oracles too.
# ---------------------------------------------------------------------------


@register("stream_stateful_running_count", WORDCOUNT_ORACLE)
def stream_stateful_running_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = documents_stream(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("word")
    )
    counts = stateful_running_count(words)
    return run_to_table(spark, counts, "update")


# ---------------------------------------------------------------------------
# W5 extension through streaming: session_window gap sessions with watermark,
# complete mode (update is unsupported for streaming session windows; oracle
# is the same lag/cumsum derivation as the batch twin in plans/tpch.py).
# ---------------------------------------------------------------------------


@register(
    "stream_session_window",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    return run_to_table(spark, agg, "complete")


# ---------------------------------------------------------------------------
# Stream-stream inner join with event-time range + watermarks (beyond the
# reference's stream-static J1): both sides keep bounded state (watermark
# horizon) and matches emit in append mode. Bounded single-batch run =>
# result == the batch range join, so it oracles.
# ---------------------------------------------------------------------------


@register(
    "stream_stream_join",
    """
    SELECT p.event_id AS purchase_id, e.event_id AS error_id, e.ts AS error_ts
    FROM events p JOIN events e ON p.user_id = e.user_id
    WHERE p.event_type = 'purchase' AND e.event_type = 'error'
      AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL '1 hour'
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    errors = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user_id"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", "1 hour")
    )
    joined = purchases.join(
        errors,
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("error_ts") >= F.col("p_ts"))
        & (F.col("error_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("purchase_id", "error_id", "error_ts")
    return run_to_table(spark, joined, "append")


# ---------------------------------------------------------------------------
# Streaming dedup: dropDuplicatesWithinWatermark on the content fingerprint —
# the streaming half of the LLM dedup stack (state = fingerprints within the
# watermark horizon; bounded, unlike global dropDuplicates). Single bounded
# batch => kept set == global distinct, so it oracles.
# ---------------------------------------------------------------------------


@register(
    "stream_dedup_fingerprint",
    # Output is the kept fingerprint SET: which doc survives per fp depends
    # on arrival order (first wins), so only the fp set is deterministic.
    """
    SELECT DISTINCT
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fp
    FROM documents
    """,
)
def stream_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import fingerprint

    docs = documents_stream(spark, sf_dir).select(
        "doc_id",
        fingerprint("text").alias("fp"),
        F.current_timestamp().alias("arr_ts"),  # processing-time watermark
    )
    deduped = (
        docs.withWatermark("arr_ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["fp"])
        .select("fp")
    )
    return run_to_table(spark, deduped, "append")


# ---------------------------------------------------------------------------
# At-ingest dedup with a PERSISTED fingerprint store (r16): the dedup twin
# of the incremental IVF appendix, and the production shape
# dedup_incremental_exact (plans/llm.py:176) sketches — the store is not a
# one-shot relation but a partitioned table MAINTAINED at ingest: each
# micro-batch's decisions join against the store as of arrival, and the
# batch's novel fingerprints append as their own batch_id partition via
# dynamic partition overwrite (replays overwrite themselves). Cross-batch
# duplicates are therefore decided by fingerprints an EARLIER micro-batch
# appended — the store maintenance is load-bearing for the emitted
# statuses, which is exactly what the shared-semantics oracle hash proves
# (first-arrival-wins: arrival order is id order by construction, so the
# oracle's min-doc_id-per-fp rank replays the decisions batch-split-free).

from .llm import _FP_SQL as _LLM_FP_SQL  # noqa: E402  (one fp definition)
#
# Scale: per batch this is |batch| fingerprints (computed in-scan) against
# an fp-keyed store read — prune with a Bloom/min-max prefilter over the
# store partitions at 100 TB (layout_bloom_prefilter is that pattern) —
# and the append writes |novel fps in batch| rows, never rewriting the
# store. Statuses land in their own partitioned table, also idempotent.
# ---------------------------------------------------------------------------


# Used for the independent state writes inside the foreachBatch
# maintenance handlers and the independent seed/arrival writes in their
# setups — at any scale these jobs share no lineage ordering requirement
# (each targets its own directory and replay overwrites per-partition),
# so overlapping them costs nothing and collapses the serialized
# per-job latency the driver otherwise pays.
from ..engine import run_parallel as _run_jobs  # noqa: E402


def _write_id_ordered_arrivals(src_dir: str, parts: list) -> None:
    """Write each part as one file with ascending mtimes so the file
    source replays them IN ORDER under maxFilesPerTrigger=1 — arrival
    order == doc_id order is what lets a first-arrival-wins oracle rank
    by doc_id (shared by the fp-store and minhash-catalog ingests).

    r19: ONE Spark job writes every part (partitionBy on the part tag,
    one task per part, then the partition dirs rename into the b{i}
    layout the reader globs) — the per-part coalesce(1) writes paid one
    serialized job + commit per part. Intra-file row order changes
    (shuffle by tag), which no consumer observes: every handler decides
    by doc_id rank / set joins, never by arrival-row position, and the
    oracles replay by doc_id. One file per part is guaranteed (the
    dynamic-partition writer opens one file per partition value per
    task), keeping batch boundaries — which TTL oracles hard-code —
    exactly as before; a missing partition dir (an empty part) fails
    loudly below rather than silently shifting batch numbering."""
    tagged = parts[0].withColumn("_arr_part", F.lit(0))
    for i, part in enumerate(parts[1:], start=1):
        tagged = tagged.unionByName(part.withColumn("_arr_part", F.lit(i)))
    stage_dir = src_dir + "__stage"
    (
        tagged.repartition(len(parts), "_arr_part")
        .write.partitionBy("_arr_part")
        .parquet(stage_dir)
    )
    os.makedirs(src_dir, exist_ok=True)
    for i in range(len(parts)):
        part_dir = os.path.join(stage_dir, f"_arr_part={i}")
        if not os.path.isdir(part_dir):
            raise ValueError(
                f"_write_id_ordered_arrivals: part {i} wrote no rows — "
                "an empty arrival file would silently renumber the "
                "micro-batches the oracles replay"
            )
        os.rename(part_dir, os.path.join(src_dir, f"b{i}"))
    # The staging dir has served its purpose (_SUCCESS marker + any
    # empty partition dirs would otherwise accumulate per run and trap
    # future directory scans — r19 ADVICE).
    import shutil

    shutil.rmtree(stage_dir, ignore_errors=True)
    for i in range(len(parts)):
        for root, _dirs, files in os.walk(os.path.join(src_dir, f"b{i}")):
            for fn in files:
                os.utime(
                    os.path.join(root, fn),
                    (1_700_000_000 + i, 1_700_000_000 + i),
                )


def _id_range_parts(
    odds: DataFrame, plants: DataFrame, plant_offset: int | None = None
) -> list:
    """Split the odd-id arrivals into 3 contiguous id ranges (one scalar
    driver fetch for the boundaries — the fixed-size class) + the plants
    file last (their ids sit above every real id by construction).
    ``plant_offset`` guards that construction: the first-arrival-wins
    oracles rank by doc_id, which is only the arrival order if every
    plant id exceeds every real id."""
    m = odds.agg(F.max("doc_id")).first()[0]
    if m is None:
        raise ValueError(
            "_id_range_parts: odd-id arrival relation is empty — the "
            "id-ordered multi-batch arrival fixture needs real rows"
        )
    if plant_offset is not None and m >= plant_offset:
        raise ValueError(
            f"_id_range_parts: max real doc_id {m} >= plant offset "
            f"{plant_offset}; plant ids must sit above every real id or "
            "arrival order stops matching the oracle's rank-by-doc_id rule"
        )
    return [
        odds.filter(F.col("doc_id") <= m // 3),
        odds.filter((F.col("doc_id") > m // 3) & (F.col("doc_id") <= 2 * m // 3)),
        odds.filter(F.col("doc_id") > 2 * m // 3),
        plants,
    ]


# Explicit state-relation schemas (r20, guide §6 / r19 VERDICT task 1):
# every per-batch state read names the WRITER's schema instead of
# re-inferring it from parquet footers — measured ~70-95 ms of
# driver-side footer-read latency saved per read on this host, paid 1-3x
# per micro-batch by every maintenance handler. batch_id is the
# partition column every state write appends (int: F.lit(batch_id)).
# The strings must track the writers exactly; schemas were captured from
# the live relations (simpleString) when introduced.
_FP_STORE_SCHEMA = "fp string, batch_id int"
_BLOOM_BITS_SCHEMA = "pos bigint, batch_id int"
_MH_CATALOG_SCHEMA = (
    "doc_id long, band_id int, band_val string, batch_id int"
)
_IMG_CATALOG_SCHEMA = (
    "doc_id long, phash string, chunk_id int, chunk_val string, "
    "batch_id int"
)
_EMB_CODES_SCHEMA = "doc_id long, band_id int, code int, batch_id int"
_EMB_VECS_SCHEMA = "doc_id long, embedding array<float>, batch_id int"
_CLUSTER_MAP_SCHEMA = (
    "doc_id long, rep_id long, rep_fp string, batch_id int"
)


def _read_state(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Partitioned state-dir read with the writer's explicit schema (no
    per-batch footer inference — see the schema constants above)."""
    return spark.read.schema(schema).parquet(path)


def _overwrite_batch_partition(
    df: DataFrame, path: str, batch_id: int
) -> None:
    """Write df as THIS batch's (batch_id=...) partition via dynamic
    overwrite — the exactly-once idiom every ingest-maintenance handler
    shares: a replayed batch overwrites its own partition instead of
    double-appending."""
    (
        df.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def _fp_store_ranked(
    store_dir: str,
    fps: DataFrame,
    batch_id: int,
    retention_batches: int | None = None,
) -> DataFrame:
    """Exact-dup decision relation shared by the store handlers: the batch's
    (doc_id, fp) rows ranked within-batch by doc_id per fp and left-joined
    against the store AS OF this batch — only partitions appended by
    EARLIER batches (batch_id is the partition key, so this prunes at
    scan). Without the bound a REPLAYED batch would see its own appended
    fps and flip its novel decisions to duplicate — the exactly-once
    contract needs read-your-predecessors, never read-yourself (pinned by
    test_dedup_store_cross_batch_maintenance's replay).
    ``retention_batches`` additionally EXPIRES old state: only partitions
    with batch_id >= current - W are visible (the seed -1 ages out after
    W batches like any other append), so content re-admits after W
    batches of absence — still a partition-pruned scan, now bounded on
    BOTH sides. Output columns: the fps columns + rn + hit (True / null)."""
    from pyspark.sql import Window

    store = _read_state(
        fps.sparkSession, store_dir, _FP_STORE_SCHEMA
    ).filter(F.col("batch_id") < batch_id)
    if retention_batches is not None:
        store = store.filter(
            F.col("batch_id") >= batch_id - retention_batches
        )
    store = store.select("fp").distinct()
    w = Window.partitionBy("fp").orderBy("doc_id")
    return fps.withColumn("rn", F.row_number().over(w)).join(
        store.withColumn("hit", F.lit(True)), "fp", "left_outer"
    )


def _dedup_store_handler(
    store_dir: str,
    decisions_dir: str,
    retention_batches: int | None = None,
):
    """foreachBatch handler: decide novel/duplicate against the store AS
    OF this batch, then append this batch's novel fps. Both writes are
    (batch_id)-partitioned dynamic overwrites — exactly-once on replay.
    With ``retention_batches`` the decision window is the TTL'd store
    (see _fp_store_ranked); a re-admitted fp appends again under its new
    batch_id, restarting its lifetime — duplicates never refresh it."""
    from ..functions.text import fingerprint

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        fps = batch_df.select(
            "doc_id", fingerprint("text").alias("fp")
        ).localCheckpoint()  # one derivation feeds decisions AND the append
        ranked = _fp_store_ranked(store_dir, fps, batch_id, retention_batches)
        # The two state writes are independent (own dirs, replay
        # overwrites per-partition) — overlap them (r19, guide §2.6).
        _run_jobs(
            lambda: _overwrite_batch_partition(
                ranked.select(
                    "doc_id",
                    F.when(F.col("hit") | (F.col("rn") > 1), "duplicate")
                    .otherwise("novel")
                    .alias("status"),
                ),
                decisions_dir,
                batch_id,
            ),
            lambda: _overwrite_batch_partition(
                ranked.filter(
                    F.col("hit").isNull() & (F.col("rn") == 1)
                ).select("fp"),
                store_dir,
                batch_id,
            ),
        )

    return handler


# Re-crawl plant ids = doc_id + _FP_PLANT_OFFSET. The offset must exceed
# every real doc_id (guarded in _id_range_parts): the plants file arrives
# LAST, so arrival order == doc_id order only holds if plant ids sort
# above all real ids — the oracle's rank-by-doc_id rule depends on it.
_FP_PLANT_OFFSET = 300000

# One oracle for BOTH store-ingest variants: the Bloom prefilter has no
# false negatives, so the prefiltered query's decisions are provably
# identical — registering it against the same text makes the driver
# hash-prove that.
STREAM_DEDUP_STORE_ORACLE = f"""
    WITH store AS (
        SELECT DISTINCT {_LLM_FP_SQL.format(t='text')} AS fp
        FROM documents WHERE doc_id % 2 = 0
    ),
    newbatch AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + {_FP_PLANT_OFFSET} AS doc_id, text
        FROM documents WHERE doc_id % 6 = 0
    ),
    nf AS (SELECT doc_id, {_LLM_FP_SQL.format(t='text')} AS fp FROM newbatch),
    ranked AS (
        SELECT doc_id, fp,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM nf
    )
    SELECT r.doc_id,
           CASE WHEN s.fp IS NOT NULL OR r.rn > 1 THEN 'duplicate'
                ELSE 'novel' END AS status
    FROM ranked r LEFT JOIN store s ON r.fp = s.fp
    """


def _seed_state(rows: DataFrame, state_dir: str) -> None:
    """Write the pre-ingest state as the batch_id=-1 partition."""
    rows.withColumn("batch_id", F.lit(-1)).write.partitionBy(
        "batch_id"
    ).parquet(state_dir)


def _fp_store_seed(docs: DataFrame) -> DataFrame:
    """The ingested corpus's distinct fingerprints (even doc ids)."""
    from ..functions.text import fingerprint

    return (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(fingerprint("text").alias("fp"))
        .distinct()
    )


def _fp_arrival_parts(docs: DataFrame) -> list:
    """The store-ingest arrival files: odd ids in 3 id ranges + the
    +_FP_PLANT_OFFSET exact re-crawls of every 6th doc, id-ordered so
    arrival order == doc_id order (the oracle's rank-by-doc_id rule)."""
    plants = docs.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + _FP_PLANT_OFFSET).alias("doc_id"), "text"
    )
    odds = docs.filter(F.col("doc_id") % 2 == 1)
    return _id_range_parts(odds, plants, plant_offset=_FP_PLANT_OFFSET)


def _arrivals_stream(
    spark: SparkSession,
    src_dir: str,
    schema: str = "doc_id long, text string",
) -> DataFrame:
    """One file per micro-batch over the id-ordered arrival files. The
    default schema is the document ingests'; the embedding-catalog arm
    passes its vector schema (id column stays doc_id — the shared
    id-ordered plumbing keys on it)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir + "/*")
    )


def _fp_store_setup(spark: SparkSession, sf_dir: str, prefix: str):
    """Seed the fingerprint store (batch_id=-1) and write the id-ordered
    arrival files — the shared setup of both store-ingest variants.
    Returns (base_dir, store_dir, decisions_dir, arrivals stream)."""
    from . import tmp_run_dir

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_dir = tmp_run_dir(prefix)
    store_dir = os.path.join(base_dir, "store")
    decisions_dir = os.path.join(base_dir, "decisions")
    src_dir = os.path.join(base_dir, "arrivals")

    # Seed and arrival writes are independent jobs — overlap (r19 §2.6).
    _run_jobs(
        lambda: _seed_state(_fp_store_seed(docs), store_dir),
        lambda: _write_id_ordered_arrivals(src_dir, _fp_arrival_parts(docs)),
    )
    return base_dir, store_dir, decisions_dir, _arrivals_stream(spark, src_dir)


@register("stream_dedup_store_ingest", STREAM_DEDUP_STORE_ORACLE)
def stream_dedup_store_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, status): the already-ingested corpus (even ids) seeds the
    fingerprint store; the rest (odd ids + the +300000 re-crawl plants)
    arrives as an id-ordered multi-batch stream (3 id-ranged files + the
    plants file, maxFilesPerTrigger=1), each batch deciding against and
    appending to the store. First arrival of novel content wins; every
    later copy — same batch, later batch, or seeded — reads 'duplicate'.
    Cross-file odd/odd copies make the APPENDED partitions load-bearing
    (pytest: test_dedup_store_cross_batch_maintenance)."""
    from ..streaming.sinks import foreach_batch_sink

    base_dir, store_dir, decisions_dir, arriving = _fp_store_setup(
        spark, sf_dir, "fpstore_"
    )
    q = foreach_batch_sink(
        arriving,
        _dedup_store_handler(store_dir, decisions_dir),
        checkpoint=os.path.join(base_dir, "ckpt"),
        mode="append",
    )
    q.awaitTermination()
    return spark.read.parquet(decisions_dir).select("doc_id", "status")


# ---------------------------------------------------------------------------
# Bloom-prefiltered store ingest (r16): SCALE.md's "prefilter the store
# read at 100 TB" made driver-checked. A Bloom filter over the store's
# fingerprints is MAINTAINED alongside it (per-batch set-bit partitions,
# merged by reading them — OR of bit sets is plain distinct-union), and
# each batch probes the Bloom FIRST: only possible-hit fingerprints touch
# the fp-keyed store join; definite misses (the vast majority of novel
# content) skip it entirely. Bloom filters have NO false negatives, so
# the decisions are provably identical to stream_dedup_store_ingest —
# both register against STREAM_DEDUP_STORE_ORACLE and the driver hash
# proves the equivalence. The Bloom uses the PRODUCTION hash (xxhash64,
# k positions as codegen columns) precisely because no oracle replays
# it: only decisions need cross-engine exactness, the prefilter needs
# speed. m is sized from the seed store (8 bits/item, next power of two,
# capped) and FIXED for the store's lifetime — merging positions hashed
# under different m is meaningless, so a resize is a rebuild (the
# centroid re-train rule). Capability lineage: the reference's dedup
# intent (BasicStreaming.scala:17 state) + the r11 Bloom probe pattern.
# ---------------------------------------------------------------------------

_STORE_BLOOM_K = 3
_STORE_BLOOM_M_CAP = 4194304  # 2^22 — same cap as the gram Bloom


def _store_bloom_pos(fp_col, m: int, j: int):
    """Bit position j for a fingerprint: pmod(xxhash64(j, fp), m) — the
    fast production hash; k fixed columns, pure codegen."""
    return F.pmod(F.xxhash64(F.lit(j), fp_col), F.lit(m)).alias(f"pos{j}")


def _store_bloom_bits(fps: DataFrame, m: int) -> DataFrame:
    """(pos) set-bit rows for a fingerprint relation: k positions per fp,
    distinct (<= min(k*|fps|, m) rows)."""
    out = None
    for j in range(_STORE_BLOOM_K):
        b = fps.select(_store_bloom_pos(F.col("fp"), m, j))
        b = b.select(F.col(f"pos{j}").alias("pos"))
        out = b if out is None else out.unionByName(b)
    return out.distinct()


def _dedup_store_bloom_handler(
    store_dir: str, decisions_dir: str, bits_dir: str, m: int
):
    """The _dedup_store_handler contract with a Bloom gate in front of
    the store join: possible = fps passing ALL k set-bit checks (chained
    left-semi joins on the position columns, the r11 probe's stateless
    form); only those join the store. Appends novel fps AND their set
    bits, both (batch_id)-partitioned dynamic overwrites with the same
    read-your-predecessors bound."""
    from pyspark.sql import Window

    from ..functions.text import fingerprint

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fps = batch_df.select(
            "doc_id", fingerprint("text").alias("fp")
        ).localCheckpoint()
        cand = fps.select("fp").distinct().select(
            "fp",
            *[_store_bloom_pos(F.col("fp"), m, j)
              for j in range(_STORE_BLOOM_K)],
        )
        bits = (
            _read_state(spark, bits_dir, _BLOOM_BITS_SCHEMA)
            .filter(F.col("batch_id") < batch_id)
            .select("pos")
            .distinct()
        )
        possible = cand
        for j in range(_STORE_BLOOM_K):
            possible = possible.join(
                bits.withColumnRenamed("pos", f"pos{j}"), f"pos{j}",
                "left_semi",
            )
        # ONLY possible fps touch the store (the fp-keyed join the Bloom
        # exists to spare; definite misses never read it)
        store_hits = possible.select("fp").join(
            _read_state(spark, store_dir, _FP_STORE_SCHEMA)
            .filter(F.col("batch_id") < batch_id)
            .select("fp"),
            "fp",
            "left_semi",
        )
        w = Window.partitionBy("fp").orderBy("doc_id")
        ranked = fps.withColumn("rn", F.row_number().over(w)).join(
            store_hits.withColumn("hit", F.lit(True)), "fp", "left_outer"
        )
        novel = ranked.filter(
            F.col("hit").isNull() & (F.col("rn") == 1)
        ).select("fp").localCheckpoint()  # feeds the store AND bits appends
        # Three independent state writes (own dirs, replay overwrites
        # per-partition) — overlap them (r19, guide §2.6).
        _run_jobs(
            lambda: _overwrite_batch_partition(
                ranked.select(
                    "doc_id",
                    F.when(F.col("hit") | (F.col("rn") > 1), "duplicate")
                    .otherwise("novel")
                    .alias("status"),
                ),
                decisions_dir,
                batch_id,
            ),
            lambda: _overwrite_batch_partition(novel, store_dir, batch_id),
            lambda: _overwrite_batch_partition(
                _store_bloom_bits(novel, m), bits_dir, batch_id
            ),
        )

    return handler


@register("stream_dedup_store_bloom_ingest", STREAM_DEDUP_STORE_ORACLE)
def stream_dedup_store_bloom_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """stream_dedup_store_ingest behind a maintained Bloom prefilter —
    same oracle, so the driver hash proves the prefilter changes nothing
    but the store-join traffic (no false negatives). Prune effectiveness
    and decision equality pinned by
    tests/test_streaming.py::test_dedup_store_bloom_prunes_and_agrees."""
    from ..streaming.sinks import foreach_batch_sink

    base_dir, store_dir, decisions_dir, arriving = _fp_store_setup(
        spark, sf_dir, "fpbloom_"
    )
    bits_dir = os.path.join(base_dir, "bloombits")

    seed = _read_state(spark, store_dir, _FP_STORE_SCHEMA).select("fp")
    n_seed = seed.count()  # one scalar: sizes m for the store's lifetime
    m = min(_STORE_BLOOM_M_CAP, 1 << max(8 * n_seed - 1, 1).bit_length())
    (
        _store_bloom_bits(seed, m)
        .withColumn("batch_id", F.lit(-1))
        .write.partitionBy("batch_id")
        .parquet(bits_dir)
    )

    q = foreach_batch_sink(
        arriving,
        _dedup_store_bloom_handler(store_dir, decisions_dir, bits_dir, m),
        checkpoint=os.path.join(base_dir, "ckpt"),
        mode="append",
    )
    q.awaitTermination()
    return spark.read.parquet(decisions_dir).select("doc_id", "status")


# ---------------------------------------------------------------------------
# In-stream PII scrubbing: the cleaning stage of a streaming ingest
# pipeline — a pure per-row projection (no state, no watermark, append
# mode), so the drained bounded run equals the batch query and shares its
# oracle. At scale this runs at source parallelism with zero shuffle.
# ---------------------------------------------------------------------------

from .llm import _PII_ORACLE, pii_scrub_projection  # noqa: E402


@register("stream_pii_scrub", _PII_ORACLE)
def stream_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    scrubbed = pii_scrub_projection(documents_stream(spark, sf_dir))
    return run_to_table(spark, scrubbed, "append")


# ---------------------------------------------------------------------------
# At-ingest content-keyed split assignment (r16): the streaming twin of
# split_by_cluster — the property that makes the content gate the RIGHT
# split for an ingest pipeline is exactly that it needs no state: a doc's
# split depends only on its own bytes, so arriving docs are labeled by a
# pure per-row projection (fp + md5 gate in codegen; append mode, no
# watermark) and a re-crawled copy arriving years later STILL lands in
# its original's split. Shares split_by_cluster's oracle verbatim.
# ---------------------------------------------------------------------------

from .textprep import SPLIT_BY_CLUSTER_ORACLE, cluster_split_column  # noqa: E402


@register("stream_split_by_cluster", SPLIT_BY_CLUSTER_ORACLE)
def stream_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents_stream(spark, sf_dir)
    labeled = docs.select(
        "doc_id", "source", cluster_split_column().alias("split")
    )
    return run_to_table(spark, labeled, "append")


# ---------------------------------------------------------------------------
# At-ingest NEAR-DUP-robust split assignment (r17, r16 VERDICT task 5):
# stream_split_by_cluster's stateless gate handles exact copies, but a
# truncated re-crawl arriving at ingest has a different fingerprint -> an
# independent gate -> it can land opposite its source (the measured
# 4-doc leak split_by_neardup_cluster fixes in batch). The streaming twin
# joins each arriving doc against the MATERIALIZED rep-fp map from the
# last batch clustering run (doc_id -> its cluster representative's
# fingerprint; eager localCheckpoint so the planner has true stats, NO
# broadcast hint — the map grows with the corpus's duplicate subset, the
# _media_probe_plan discipline) and gates on coalesce(rep_fp, own fp):
# unseen/singleton docs fall back to the stateless gate, so the twin
# degrades to stream_split_by_cluster exactly where no cluster knowledge
# exists. Shares split_by_neardup_cluster's oracle verbatim. Re-crawl
# lands in its source's split: test_stream_split_by_neardup_recrawl.
# ---------------------------------------------------------------------------

from .textprep import SPLIT_BY_NEARDUP_ORACLE  # noqa: E402


def stream_split_by_neardup_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-drain streaming plan (arriving near corpus -> unhinted
    doc_id-keyed rep-fp map join -> gate projection), exposed for the
    hint-free plan-shape test."""
    from ..functions.text import fingerprint
    from ..operators.components import connected_components
    from .llm import _near_corpus, jaccard_pair_graph, near_plants

    corpus = _near_corpus(spark, sf_dir)
    fps = corpus.select("doc_id", fingerprint("text").alias("fp"))
    cc = connected_components(jaccard_pair_graph(spark, sf_dir)).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    rep_fps = fps.select(
        F.col("doc_id").alias("cluster_id"), F.col("fp").alias("rep_fp")
    )
    rep_map = (
        cc.join(rep_fps, "cluster_id")
        .select("doc_id", "rep_fp")
        .localCheckpoint()
    )

    ds = documents_stream(spark, sf_dir).select("doc_id", "text")
    arriving = ds.unionByName(near_plants(ds))
    return (
        arriving.withColumn("fp", fingerprint("text"))
        .join(rep_map, "doc_id", "left_outer")
        .select(
            "doc_id",
            cluster_split_column(
                F.coalesce(F.col("rep_fp"), F.col("fp"))
            ).alias("split"),
        )
    )


@register("stream_split_by_neardup", SPLIT_BY_NEARDUP_ORACLE)
def stream_split_by_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split) per arriving doc under the representative-fp gate:
    clustered docs (including re-crawls the clustering has seen) gate on
    their cluster rep's fingerprint via the materialized map; unseen docs
    fall back to their own fp — the whole cluster moves as one unit, so a
    truncated re-crawl lands in its source's split."""
    return run_to_table(
        spark, stream_split_by_neardup_plan(spark, sf_dir), "append"
    )


# ---------------------------------------------------------------------------
# In-stream vector bucketization: an embedding ingest pipeline assigning
# each arriving vector to its nearest IVF centroid (stream-static broadcast
# of the centroid table + ONE stateful argmax aggregation — streaming
# allows a single aggregation, so the argmax IS the agg and the state per
# key is just the best-(ccos, cent_id) pair, never the vector). The
# drained single-batch run equals the batch assignment, which the oracle
# replays with the same round(4) + centroid-id tie-break.
# ---------------------------------------------------------------------------

from .llm import _DOT, _IVF_STRIDE_SQL, _NORM, _STRIDE_K_CAP  # noqa: E402


@register(
    "stream_vector_bucketize",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
             WHERE vec_id % 50 = 0 AND vec_id < {50 * _STRIDE_K_CAP})
    SELECT vec_id, bucket FROM (
        SELECT e.vec_id, cent.cent_id AS bucket,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY round({_DOT.format(a='e.v', b='cent.cv')}
                         / ({_NORM.format(a='e.v')} * {_NORM.format(a='cent.cv')}), 4)
                         DESC, cent.cent_id) AS crnk
        FROM e, cent)
    WHERE crnk = 1
    """,
)
def stream_vector_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arriving vectors bucketed against a FIXED-K broadcast centroid set
    (stride pick capped at _STRIDE_K_CAP rows — a bare id-stride subset
    grows linearly with the corpus and so would the broadcast; r06 VERDICT
    task 2)."""
    from ..functions.vectors import cosine_pandas

    from .llm import stride_centroids

    cent = stride_centroids(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    scored = (
        embeddings_stream(spark, sf_dir)
        .select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cent_id",
            F.round(cosine_pandas("embedding", "cv"), 4).alias("ccos"),
        )
    )
    key = F.struct(F.col("ccos"), (-F.col("cent_id")).alias("neg_cent"))
    assigned = scored.groupBy("vec_id").agg(F.max_by("cent_id", key).alias("bucket"))
    return run_to_table(spark, assigned, "update")


# ---------------------------------------------------------------------------
# Incremental IVF index maintenance at ingest (r16, r15 VERDICT task 7):
# the index-freshness story a 100 TB serving tier needs. The batch index
# is built ONCE over the already-ingested corpus; newly arriving vectors
# are bucketized in-stream (the stream_vector_bucketize assignment, batch
# machinery per micro-batch inside foreachBatch) and APPENDED to the
# index layout — each micro-batch lands as its own (bucket, batch_id)
# parquet partitions via dynamic partition overwrite, so a replayed batch
# overwrites itself (the idempotent_parquet_handler exactly-once pattern)
# and NO rebuild ever touches the base. The probe then reads base ∪
# appendix and must return EXACTLY the from-scratch full-corpus IVF
# result — which is why this query shares _IVF_STRIDE_SQL verbatim: the
# hash match IS the freshness proof (append-maintained index ≡ rebuilt
# index).
#
# Scale: the base build is the one-time assignment pass SCALE.md already
# prices; per micro-batch the appendix write is |batch| rows through a
# FIXED-K broadcast argmax (no shuffle of the corpus, no read of the
# base); the probe stays partition-pruned on bucket on BOTH sides of the
# union. Compaction of the appendix into the base is an offline
# housekeeping job, not a serving dependency.
# ---------------------------------------------------------------------------


def _ivf_appendix_handler(path: str, centroids: DataFrame):
    """foreachBatch handler appending bucket assignments to the index
    appendix: per (bucket, batch_id) dynamic-partition overwrite — replay
    rewrites the same partitions with the same rows (exactly-once)."""
    from ..operators.similarity import assign_buckets

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        (
            assign_buckets(batch_df, centroids)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket", "batch_id")
            .parquet(path)
        )

    return handler


def _build_base_and_appendix(
    spark: SparkSession, sf_dir: str, emb: DataFrame, cent: DataFrame
) -> tuple[str, str]:
    """(base_path, appendix_path): batch-build the base index over the
    already-ingested corpus (even vec_ids), then stream the rest (odd
    vec_ids) through the appendix handler. Fresh tempdirs per call (the
    k4/k6 sink convention) — shared by the appendix probe and the
    compaction twin."""
    from ..operators.similarity import build_ivf_index
    from ..streaming.sinks import foreach_batch_sink

    from . import tmp_run_dir

    base_dir = tmp_run_dir("ivf_incr_")
    base = os.path.join(base_dir, "base")
    appendix = os.path.join(base_dir, "appendix")

    # 1. the already-ingested corpus: batch index build (even ids)
    build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), cent, base)

    # 2. ingest: the rest of the corpus arrives as a stream and appends
    arriving = embeddings_stream(spark, sf_dir).filter(
        F.col("vec_id") % 2 == 1
    ).select("vec_id", "embedding")
    q = foreach_batch_sink(
        arriving,
        _ivf_appendix_handler(appendix, cent),
        checkpoint=os.path.join(base_dir, "ckpt"),
        mode="append",
    )
    q.awaitTermination()
    return base, appendix


@register("stream_ivf_appendix_probe", _IVF_STRIDE_SQL)
def stream_ivf_appendix_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_id, n_id, cos, rnk): the IVF probe over (batch-built base index
    over even vec_ids) ∪ (streamed appendix of the odd vec_ids, appended
    micro-batch by micro-batch at ingest) — byte-equal to the full-corpus
    assignment's probe, proven by sharing sim_ivf_topk's oracle. Every
    invocation exercises build + streamed maintenance + probe
    end-to-end."""
    from ..operators.similarity import ivf_topk_over_index

    from .llm import stride_centroids

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = stride_centroids(emb)
    base, appendix = _build_base_and_appendix(spark, sf_dir, emb, cent)

    # 3. serve: probe base ∪ appendix — no rebuild happened, results must
    # equal the from-scratch assignment (shared oracle pins it). The two
    # parts are passed SEPARATELY so each bucket-partitioned scan sits
    # directly under its probe join and dynamic partition pruning can
    # reach it (a Union between join and scan defeats DPP — observed).
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk_over_index(
        [spark.read.parquet(base), spark.read.parquet(appendix)],
        queries, cent, k=5, n_probe=2,
    )


@register("sim_ivf_compacted_probe", _IVF_STRIDE_SQL)
def sim_ivf_compacted_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The offline housekeeping job the appendix defers, as a
    driver-checked fact: COMPACT base ∪ appendix into one fresh
    bucket-partitioned index (a single rewrite — batch_id partitions
    collapse away, each bucket's rows land in one partition again) and
    probe the compacted directory. Build -> append -> compact -> probe
    all share sim_ivf_topk's oracle, so the hash match proves the whole
    index LIFECYCLE preserves serving results exactly. At 100 TB the
    compaction reads base + appendix once and writes once, off the
    serving path; probes before and after are interchangeable, which is
    what lets it run as background housekeeping with a directory swap."""
    from ..operators.similarity import ivf_topk_over_index

    from . import tmp_run_dir
    from .llm import stride_centroids

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = stride_centroids(emb)
    base, appendix = _build_base_and_appendix(spark, sf_dir, emb, cent)

    compacted = os.path.join(tmp_run_dir("ivf_compact_"), "index")
    (
        spark.read.parquet(base)
        .unionByName(spark.read.parquet(appendix).drop("batch_id"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(compacted)
    )
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk_over_index(
        spark.read.parquet(compacted), queries, cent, k=5, n_probe=2
    )


# ---------------------------------------------------------------------------
# Continuous incremental top-k (EDBT'20 flavor): the same top-3-per-window
# aggregate as plans/tpch.topk_incremental_per_window, maintained by the
# state store over the stream — the rank lives INSIDE the agg, which is what
# makes it streamable.
# ---------------------------------------------------------------------------


from .tpch import TOPK_WINDOW_ORACLE, _topk_window_agg


@register("stream_topk_incremental", TOPK_WINDOW_ORACLE)
def stream_topk_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = _topk_window_agg(
        events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    )
    return run_to_table(spark, agg, "complete")


# ---------------------------------------------------------------------------
# The full reference pipeline through the streaming machinery in one query:
# stream-static enrich join -> watermarked sliding window agg -> post-agg
# alert filter (StreamingWithKafkaJoinedData.scala:46 + SlidingWindow.scala:
# 52-66 chained, as the reference runs them across two programs via the
# joined-sensor-data topic). Complete mode keeps every window, so the
# drained result equals the batch flagship and shares its oracle.
# ---------------------------------------------------------------------------

from .parity import FLAGSHIP_ORACLE  # noqa: E402  (same result, same oracle)


@register("stream_flagship_alert", FLAGSHIP_ORACLE)
def stream_flagship_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    enriched = enrich_join(stream, dim, key="user_id", how="left_outer")
    agg = (
        enriched.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes", "1 minute"), "segment")
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "segment",
            "sum_value",
            "n_events",
        )
        .filter(F.col("sum_value") < 200.0)
    )
    return run_to_table(spark, agg, "complete")


# ---------------------------------------------------------------------------
# T4 deepened: explicit-user-state gap sessionizer (streaming/stateful.py)
# — the state-machine template updateStateByKey hints at. Emits CLOSED
# sessions; the oracle derives the same set in SQL (gap sessionization
# minus each key's final, still-open session).
# ---------------------------------------------------------------------------


@register(
    "stream_sessionizer_closed",
    """
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN date_diff('second',
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
                        > 1800
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ), per_session AS (
        SELECT user_id, sid,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events, round(sum(value), 2) AS session_value,
               max(sid) OVER (PARTITION BY user_id) AS max_sid
        FROM sessions GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end, n_events, session_value
    FROM per_session WHERE sid <> max_sid
    """,
)
def stream_sessionizer_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import stateful_sessionizer

    out = stateful_sessionizer(
        events_stream(spark, sf_dir).select("user_id", "ts", "value"),
        gap_seconds=1800,
    )
    table = run_to_table(spark, out, "append")
    return table.select(
        "user_id", "session_start", "session_end", "n_events",
        F.round("session_value", 2).alias("session_value"),
    )


# ---------------------------------------------------------------------------
# Streaming greedy sequence packing (r05): the pack_sequences_greedy fold
# as arbitrary keyed state — one open (seq, fill) pair per shard carried
# across micro-batches, each doc's assignment emitted exactly once
# (append). The bounded single-batch drain equals the batch operator, so
# the oracle is the same recursive CTE.
# ---------------------------------------------------------------------------

from .textprep import PACK_GREEDY_ORACLE, _PACK_CAP  # noqa: E402


@register("stream_pack_greedy", PACK_GREEDY_ORACLE)
def stream_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import stateful_greedy_packer

    docs = documents_stream(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    out = stateful_greedy_packer(docs, cap=_PACK_CAP)
    return run_to_table(spark, out, "append", require_single_batch=True)


# ---------------------------------------------------------------------------
# Decontamination AT INGEST (r05): the batch text_decontaminate check as a
# stream-static join — arriving docs explode to n-grams and semi-join the
# broadcast benchmark set, so contaminated docs are flagged the moment
# they enter the pipeline (map-side per micro-batch, no streaming state at
# all: the gram explode + broadcast lookup needs no watermark and the
# per-doc count is confined to each arriving doc's own rows via a batch
# groupBy inside the doc — here the aggregation keys on doc_id, which is
# unique per arrival, so append mode works through foreachBatch semantics).
# Implementation note: a streaming groupBy(doc_id) would be stateful; we
# instead count gram hits per doc WITHIN the row via array_intersect on
# the collected benchmark gram array — zero state, pure projection.
# ---------------------------------------------------------------------------

from .textprep import _BENCH_GRAMS_CTE, _DECON_N  # noqa: E402


@register(
    "stream_decontaminate",
    f"""
    WITH {_BENCH_GRAMS_CTE.strip()},
    bg AS (SELECT DISTINCT gram FROM bench_grams),
    cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    cg AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - {_DECON_N - 1}, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))
                   AS grams
        FROM cw
    ),
    bga AS (SELECT list(gram) AS bg FROM bg)
    SELECT doc_id,
           CAST(len(list_intersect(grams, bg)) AS BIGINT) AS n_hit_ngrams
    FROM cg CROSS JOIN bga
    WHERE len(list_intersect(grams, bg)) > 0
    """,
)
def stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contaminated docs flagged at ingest: per arriving doc, the count of
    its distinct {_DECON_N}-grams that appear in the benchmark set. The
    benchmark gram ARRAY is collected once from the static relation and
    broadcast inside the plan (a scalar subquery at 100 TB memory cost =
    |eval-set grams|, exactly what decontamination broadcasts anyway);
    array_intersect keeps the whole check a stateless projection."""
    from ..functions.text import shingles_from_words

    from .textprep import _bench_grams_df

    docs = load_table(spark, sf_dir, "documents")
    bench_gram_array = (
        _bench_grams_df(docs)
        .select("gram")
        .distinct()
        .agg(F.collect_list("gram").alias("bg"))
    )
    stream = (
        documents_stream(spark, sf_dir)
        .select("doc_id", F.split("text", " ").alias("_w"))
        .select(
            "doc_id",
            F.array_distinct(shingles_from_words("_w", _DECON_N)).alias("grams"),
        )
    )
    flagged = (
        stream.crossJoin(F.broadcast(bench_gram_array))
        .select(
            "doc_id",
            F.size(F.array_intersect("grams", "bg")).cast("long").alias(
                "n_hit_ngrams"
            ),
        )
        .filter(F.col("n_hit_ngrams") > 0)
    )
    return run_to_table(spark, flagged, "append")


# ---------------------------------------------------------------------------
# Streaming quality-drift monitor (r06): the at-ingest twin of
# dq_quality_drift — per-source mean logistic quality maintained as ONE
# streaming aggregation (complete mode), z-scored against a STATIC
# baseline (the across-shard moments, prefetched from the batch table:
# two scalars, a driver fetch of the same class as zorder's bounds row).
# In production the baseline is yesterday's materialized moments; scoring
# each micro-batch against it is exactly this plan. The drained
# availableNow result equals the batch query, so they share one oracle.
# ---------------------------------------------------------------------------

from .textprep import QUALITY_DRIFT_ORACLE, quality_p_col  # noqa: E402


@register("stream_quality_drift", QUALITY_DRIFT_ORACLE)
def stream_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    base_src = (
        load_table(spark, sf_dir, "documents")
        .select("source", quality_p_col().alias("quality_p"))
        .groupBy("source")
        .agg(F.round(F.avg("quality_p"), 6).alias("mean_q"))
    )
    base = base_src.agg(
        F.round(F.avg("mean_q"), 6).alias("g_mean"),
        F.round(F.stddev_samp("mean_q"), 6).alias("g_sd"),
    ).first()  # two scalars — the static baseline the stream scores against
    # Fail LOUDLY on a degenerate baseline instead of emitting null/inf
    # z-scores that silently diverge from the batch oracle: stddev_samp is
    # NULL below 2 sources and 0 when every per-source mean coincides
    # (r06 ADVICE).
    if base["g_mean"] is None or base["g_sd"] is None or base["g_sd"] == 0:
        raise ValueError(
            "stream_quality_drift: degenerate quality baseline"
            f" (g_mean={base['g_mean']}, g_sd={base['g_sd']}) — need >= 2"
            " sources with distinct mean quality to z-score against"
        )
    agg = (
        documents_stream(spark, sf_dir)
        .select("source", quality_p_col().alias("quality_p"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality_p"), 6).alias("mean_q"),
        )
    )
    z = F.round((F.col("mean_q") - F.lit(base["g_mean"])) / F.lit(base["g_sd"]), 4)
    scored = agg.select(
        "source", "n_docs", "mean_q", z.alias("z"), (F.abs(z) >= 2.0).alias("drift_flag")
    )
    return run_to_table(spark, scored, "complete")


# ---------------------------------------------------------------------------
# Streaming ANN probe (r06, fixed-k r07): vectors arrive on a stream and
# are answered against the STATIC corpus — the serving shape of the IVF
# family. Streams cannot rank with window functions, so the two rank steps
# of the batch plan are re-expressed stream-legally:
# - probe-bucket selection happens MAP-SIDE per query row: the centroid
#   table — k-means-trained, so EXACTLY _KMEANS_K rows at any corpus size
#   (the r06 stride pick collected N/50 full vectors to the driver, a
#   scale-killer; r06 VERDICT task 2) — is fetched once to the driver and
#   embedded as a literal array; slice(array_sort(transform(...))) picks
#   the n_probe nearest buckets inside codegen;
# - the per-query top-k is a BOUNDED keyed-state fold
#   (streaming.stateful.stateful_topk_fold, r14 — r12/r13 VERDICT task 1):
#   each micro-batch merges its candidates into the stored best-k and keeps
#   exactly k, so state is O(k) per query key. The r12-era shape
#   (complete-mode slice(array_sort(collect_list(...)))) held EVERY probed
#   candidate (~ n_probe/k of the corpus) per query in one state row
#   before the emit-time slice — the state-space version of the
#   corpus-proportional-literal problem the FIXED-K rule killed in r06/r07.
# Drained availableNow result == sim_ivf_kmeans_topk, so it shares that
# oracle (the SQL replays Lloyd training exactly).
# ---------------------------------------------------------------------------

from .llm import _IVF_KMEANS_SQL, _KMEANS_K  # noqa: E402  (same result/oracle)


# r20: the guarded literal builder moved to operators.similarity (and
# became ONE parsed expr instead of a py4j round trip per value); this
# name stays the streaming modules' import path.
from ..operators.similarity import _centroid_literal_array  # noqa: E402


@register("stream_ann_probe", _IVF_KMEANS_SQL)
def stream_ann_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine, cosine_pandas
    from ..operators.similarity import assign_buckets, kmeans_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb, k=_KMEANS_K, iterations=2)
    cent_arr = _centroid_literal_array(cent.collect(), _KMEANS_K)
    assigned = assign_buckets(
        emb,
        cent.select(F.col("cent_id").alias("vec_id"), F.col("cv").alias("embedding")),
    ).select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"), "bucket")

    q = (
        embeddings_stream(spark, sf_dir)
        .filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    )
    scored_cents = F.transform(
        cent_arr,
        lambda s: F.struct(
            (-F.round(cosine(F.col("qv"), s["cv"]), 4)).alias("neg"),
            s["cent_id"].alias("cent_id"),
        ),
    )
    probed = q.select(
        "q_id", "qv",
        F.explode(
            F.transform(
                F.slice(F.array_sort(scored_cents), 1, 2), lambda s: s["cent_id"]
            )
        ).alias("bucket"),
    )
    cand = (
        probed.join(assigned, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id", "n_id", F.round(cosine_pandas("qv", "nv"), 4).alias("cos")
        )
    )
    topk = stateful_topk_fold(cand, k=5)
    return run_to_table(spark, topk, "update")


# ---------------------------------------------------------------------------
# Streaming cohort retention (r07, r06 VERDICT task 7): the live-dashboard
# twin of cohort_daily_retention. Cohort assignment (user -> first-seen
# day) is a MATERIALIZED dimension — in production yesterday's cohort map,
# here derived once from the static batch table (the stream_quality_drift
# baseline pattern) — so the stream side is one stream-static broadcast
# join plus ONE streaming aggregation: exact distinct-user counts via
# size(collect_set(user_id)) (count(DISTINCT) is not streamable; the set
# state per (cohort, offset) cell is the standard exact-distinct cost —
# approx_count_distinct is the drop-in at 100 TB if cells get hot).
# Drained availableNow result == the batch matrix, so they share one
# oracle.
# ---------------------------------------------------------------------------

from .windows_stats import COHORT_RETENTION_ORACLE  # noqa: E402


def stream_cohort_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-drain streaming plan, exposed for plan-shape tests.

    The cohort map GROWS WITH USERS, so it must NOT carry a hard-coded
    broadcast hint (r08 VERDICT task 1): it is eagerly checkpointed so the
    planner sees its real size and picks broadcast while it fits under
    autoBroadcastJoinThreshold, falling back to a shuffled equi-join beyond
    — exactly the degradation a 100x scale-up needs.
    """
    cohort_map = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
        .localCheckpoint()
    )
    activity = (
        events_stream(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.date_trunc("day", "ts").alias("d"))
        .join(cohort_map, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
        )
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.size(F.collect_set("user_id")).cast("long").alias("n_active")
    )


@register("stream_cohort_retention", COHORT_RETENTION_ORACLE)
def stream_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    matrix = stream_cohort_retention_plan(spark, sf_dir)
    return run_to_table(spark, matrix, "complete")


# ---------------------------------------------------------------------------
# Streaming volume-anomaly monitor (r07): the at-ingest twin of
# anomaly_minute_zscore. Per-minute counts/sums maintained as ONE
# complete-mode streaming aggregation, z-scored against a STATIC baseline
# (the batch minute-count moments — in production yesterday's materialized
# moments; the stream_quality_drift pattern). Degenerate baselines fail
# loudly instead of emitting null/inf z-scores. Drained availableNow
# result == the batch query, so they share one oracle.
# ---------------------------------------------------------------------------

from .windows_stats import ANOMALY_ZSCORE_ORACLE  # noqa: E402


@register("stream_anomaly_zscore", ANOMALY_ZSCORE_ORACLE)
def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .agg(
            F.round(F.avg(F.col("n_events").cast("double")), 6).alias("mean_n"),
            F.round(F.stddev_samp(F.col("n_events").cast("double")), 6).alias("sd_n"),
        )
        .first()
    )
    if base["mean_n"] is None or base["sd_n"] is None or base["sd_n"] == 0:
        raise ValueError(
            "stream_anomaly_zscore: degenerate volume baseline"
            f" (mean_n={base['mean_n']}, sd_n={base['sd_n']}) — need >= 2"
            " minutes with differing event counts to z-score against"
        )
    agg = (
        events_stream(spark, sf_dir)
        .groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    z = F.round(
        (F.col("n_events") - F.lit(base["mean_n"])) / F.lit(base["sd_n"]), 4
    )
    scored = agg.select(
        "minute", "n_events", "sum_value",
        z.alias("z"), (F.abs(z) >= 3.0).alias("is_anomaly"),
    )
    return run_to_table(spark, scored, "complete")


# ---------------------------------------------------------------------------
# Streaming funnel (r07, the r06 VERDICT task-7 pair): the live
# final-stage monitor of funnel_view_click_purchase. The earlier stages'
# entry times (first view, first qualifying click) are MATERIALIZED
# dimensions — in production yesterday's stage tables, here derived once
# from the static batch relation (the cohort/quality-drift baseline
# pattern), with the two stage counts driver-fetched as fixed-size
# scalars. The STREAM side is the business end: purchase events
# stream-static join the click map, keep those at/after the user's click
# entry, and ONE streaming aggregation (size(collect_set)) maintains the
# exact distinct purchase-stage count. Drained complete-mode result ==
# the batch one-row summary, so they share one oracle.
# ---------------------------------------------------------------------------

from .windows_stats import FUNNEL_ORACLE  # noqa: E402


def stream_funnel_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-drain streaming plan, exposed for plan-shape tests.

    The click-stage map is PER-USER, i.e. unbounded in the data — no
    hard-coded broadcast hint (r08 VERDICT task 1). Both stage tables are
    checkpoint-materialized (the count() below forces the lazy checkpoint),
    so the planner has accurate stats: broadcast while small, shuffled
    equi-join at scale.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint(eager=False)
    )
    n_view = v.count()  # two fixed-size stage scalars (materialized dims)
    n_click = c.count()
    if n_view == 0 or n_click == 0:
        raise ValueError(
            "stream_funnel: degenerate stage tables"
            f" (n_view={n_view}, n_click={n_click}) — upstream stages must"
            " be non-empty for conversion ratios to exist"
        )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(
            F.col("user_id").isNotNull() & (F.col("event_type") == "purchase")
        )
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
    )
    agg = purchases.groupBy().agg(
        F.size(F.collect_set("user_id")).cast("long").alias("n_purchase")
    )
    return agg.select(
        F.lit(n_view).cast("long").alias("n_view"),
        F.lit(n_click).cast("long").alias("n_click"),
        "n_purchase",
        F.round(F.lit(float(n_click)) / n_view, 4).alias("view_to_click"),
        F.round(F.col("n_purchase").cast("double") / n_click, 4)
            .alias("click_to_purchase"),
    )


@register("stream_funnel", FUNNEL_ORACLE)
def stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    summary = stream_funnel_plan(spark, sf_dir)
    return run_to_table(spark, summary, "complete")


# ---------------------------------------------------------------------------
# Streaming Markov transition monitor (r08, r07 VERDICT task 8): the
# at-ingest twin of paths_markov_transitions. The pair mining runs through
# applyInPandasWithState holding ONLY each user's last event — O(1) per-key
# state, the bounded-state alternative to the batch collect (which needs
# the _PATH_MAX_EVENTS cap precisely because it accumulates history). The
# drained pair stream is then counted/normalized batch-side; on a bounded
# single-batch drain the pairs equal the batch derivation exactly (and the
# 10k cap never binds on test data), so both twins share MARKOV_ORACLE.
# ---------------------------------------------------------------------------

from ..streaming.stateful import stateful_transition_pairs  # noqa: E402
from .windows_stats import MARKOV_ORACLE  # noqa: E402


@register("stream_markov_transitions", MARKOV_ORACLE)
def stream_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = (
        events_stream(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
    )
    # Twin-divergence guard (r08 ADVICE): MARKOV_ORACLE embeds the batch
    # _PATH_MAX_EVENTS rank cap; the stateful miner enforces the same
    # bound INSIDE its O(1) state (pair counter) and fails the offending
    # key at ingest — no post-drain audit job.
    from .windows_stats import _PATH_MAX_EVENTS

    pairs = stateful_transition_pairs(ev, pair_cap=_PATH_MAX_EVENTS - 1)
    drained = run_to_table(spark, pairs, "append", require_single_batch=True)
    c = drained.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wsrc = Window.partitionBy("src")
    return c.select(
        "src", "dst", "n",
        F.round(F.col("n") / F.sum("n").over(wsrc).cast("double"), 4).alias("p"),
    )


# ---------------------------------------------------------------------------
# Streaming image-dedup probe (r08): the at-ingest NEAR-dup complement of
# stream_dedup_fingerprint's exact check — every arriving image is
# fingerprinted (real decode -> aHash, mapInPandas works unchanged on a
# stream) and probed against a STATIC fingerprint catalog via the
# Hamming-band chunks: a stream-static BROADCAST equi-join on
# (chunk_id, chunk_val), hamming computed in codegen, append mode, no
# stream-side state at all. Here the catalog is the same corpus the
# stream delivers, so the drained pairs equal the batch self-join and
# share dedup_image_phash's oracle; in production the catalog is
# yesterday's index (broadcast while dim-sized, shuffle join beyond).
# Multi-chunk matches dedupe batch-side after the drain.
# ---------------------------------------------------------------------------


from .llm import IMAGE_PHASH_PAIRS_ORACLE  # noqa: E402


def _media_probe_plan(spark: SparkSession, sf_dir: str, fingerprint) -> DataFrame:
    """Shared at-ingest media-dedup probe shape (image aHash / audio
    envelope / audio scalogram differ ONLY in the fingerprint stage):
    static Hamming-band chunk catalog over the exact corpus, stream side
    fingerprinted map-side, stream-static equi-join on (chunk_id,
    chunk_val), hamming in codegen, no stream-side state.

    The catalog is 4x|corpus| rows — CORPUS-proportional, so no
    hard-coded broadcast hint (r08 VERDICT task 1). The eager
    localCheckpoint gives the planner its true size: broadcast while
    dim-sized, shuffled equi-join beyond. ``fingerprint`` maps a
    (doc_id, text) relation to (doc_id, phash) through the real
    synthesize -> decode -> hash stack.
    """
    from ..operators.dedup import phash_chunks, phash_hamming
    from .llm import _exact_corpus

    catalog = phash_chunks(
        fingerprint(_exact_corpus(spark, sf_dir))
    ).localCheckpoint()

    ds = documents_stream(spark, sf_dir).select("doc_id", "text")
    plants = ds.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    probe = phash_chunks(fingerprint(ds.unionByName(plants))).alias("s")
    cat = catalog.alias("c")
    return (
        probe.join(
            cat,
            (F.col("s.chunk_id") == F.col("c.chunk_id"))
            & (F.col("s.chunk_val") == F.col("c.chunk_val"))
            & (F.col("s.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("s.doc_id").alias("id_a"),
            F.col("c.doc_id").alias("id_b"),
            phash_hamming(F.col("s.phash"), F.col("c.phash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )


def stream_image_phash_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-drain streaming plan, exposed for plan-shape tests."""
    from ..operators.dedup import image_phash_fingerprints
    from ..operators.multimodal import attach_synthetic_image

    return _media_probe_plan(
        spark,
        sf_dir,
        lambda df: image_phash_fingerprints(attach_synthetic_image(df)),
    )


@register("stream_image_phash", IMAGE_PHASH_PAIRS_ORACLE)
def stream_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = stream_image_phash_plan(spark, sf_dir)
    drained = run_to_table(spark, pairs, "append")
    return drained.distinct()


# ---------------------------------------------------------------------------
# Streaming audio-dedup probe (r09, r08 VERDICT task 3): the audio twin of
# stream_image_phash, completing the at-ingest modality matrix. Every
# arriving clip is rendered/decoded through the REAL WAV path and envelope-
# hashed map-side (mapInPandas works unchanged on a stream); the resulting
# phash column is modality-agnostic, so the SAME phash_chunks Hamming-band
# machinery and the SAME stream-static equi-join shape (task-1-fixed: no
# broadcast hint, planner-chosen by catalog size) apply verbatim. Shares
# dedup_audio_envelope's oracle: the static catalog is the exact corpus the
# stream delivers (+ higher-id plants that the s.doc_id < c.doc_id guard
# keeps out of the pair set), so the drained pairs equal the batch
# self-join.
# ---------------------------------------------------------------------------


from .llm import AUDIO_ENVELOPE_PAIRS_ORACLE  # noqa: E402


def stream_audio_envelope_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-drain streaming plan, exposed for plan-shape tests."""
    from ..operators.dedup import audio_envelope_fingerprints
    from ..operators.multimodal import attach_synthetic_audio

    return _media_probe_plan(
        spark,
        sf_dir,
        lambda df: audio_envelope_fingerprints(
            attach_synthetic_audio(df), hash_size=8
        ),
    )


@register("stream_audio_envelope", AUDIO_ENVELOPE_PAIRS_ORACLE)
def stream_audio_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = stream_audio_envelope_plan(spark, sf_dir)
    drained = run_to_table(spark, pairs, "append")
    return drained.distinct()


# ---------------------------------------------------------------------------
# Streaming spectral-dedup probe (r09): the Haar-scalogram twin — catches
# at-ingest duplicates whose loudness contour was altered but whose
# spectral shape survives. Same probe shape, same oracle-sharing argument.
# ---------------------------------------------------------------------------


from .llm import AUDIO_SPECTRAL_PAIRS_ORACLE  # noqa: E402


def stream_audio_spectral_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-drain streaming plan, exposed for plan-shape tests."""
    from ..operators.dedup import audio_spectral_fingerprints
    from ..operators.multimodal import attach_synthetic_audio

    return _media_probe_plan(
        spark,
        sf_dir,
        lambda df: audio_spectral_fingerprints(
            attach_synthetic_audio(df), levels=4, segments=16
        ),
    )


@register("stream_audio_spectral", AUDIO_SPECTRAL_PAIRS_ORACLE)
def stream_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = stream_audio_spectral_plan(spark, sf_dir)
    drained = run_to_table(spark, pairs, "append")
    return drained.distinct()


# ---------------------------------------------------------------------------
# Streaming video-dedup probe (r09): the VIDEO twin completing the
# at-ingest modality matrix (image/audio envelope/audio spectral/video).
# Frame-set Jaccard needs per-PAIR aggregation, so unlike the phash
# probes the stream emits one (id_a, id_b, fh) HIT row per shared frame
# OCCURRENCE (stream-static equi-join on frame_md5 — genuinely no
# stream-side state: in-video repeats are NOT deduped on the stream,
# which would be an unbounded stateful dropDuplicates; they collapse in
# the bounded batch-side distinct after the drain) and the drained hits
# are counted and Jaccard-scored batch-side against the static per-video
# frame counts — the stream_markov pattern (stateless stream stage +
# bounded batch finish). The catalog is the
# corpus the stream delivers, so the result equals the batch self-join
# and shares VIDEO_FRAMES_PAIRS_ORACLE. Catalog side is corpus-
# proportional: checkpoint-materialized, NO broadcast hint (task-1 rule).
# ---------------------------------------------------------------------------


from .llm import VIDEO_FRAMES_PAIRS_ORACLE  # noqa: E402


def _video_frame_sets(df: DataFrame, dedupe: bool = True) -> DataFrame:
    """(doc_id, fh): md5 frame fingerprints per video through the
    one-to-many sample_frames contract (every frame, 16B). ``dedupe``
    collapses repeated in-video frames to SET semantics — required for
    the static catalog (nf counts / one row per distinct hash) but
    deliberately OFF on the streaming probe side: a streaming distinct
    is an unbounded stateful dropDuplicates (corpus x frames state, the
    exact growth class task 1 banned), and duplicate hit rows collapse
    for free in the bounded batch-side distinct after the drain (r09
    review)."""
    from ..operators.multimodal import attach_blob, sample_frames

    frames = sample_frames(
        attach_blob(df), every_nth=1, frame_bytes=16, fake=True
    )
    sel = frames.select("doc_id", F.md5("frame").alias("fh"))
    return sel.distinct() if dedupe else sel


def stream_video_frames_plan(spark: SparkSession, sf_dir: str):
    """(pre-drain hit stream, static counts) — exposed for plan tests."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plants_static = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.expr("substring(text, 17)").alias("text"),
    )
    catalog = _video_frame_sets(
        docs.unionByName(plants_static)
    ).localCheckpoint()
    counts = catalog.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nf"))

    ds = documents_stream(spark, sf_dir).select("doc_id", "text")
    plants = ds.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.expr("substring(text, 17)").alias("text"),
    )
    probe = _video_frame_sets(ds.unionByName(plants), dedupe=False).alias("s")
    cat = catalog.alias("c")
    hits = probe.join(
        cat,
        (F.col("s.fh") == F.col("c.fh"))
        & (F.col("s.doc_id") < F.col("c.doc_id")),
    ).select(
        F.col("s.doc_id").alias("id_a"),
        F.col("c.doc_id").alias("id_b"),
        F.col("s.fh").alias("fh"),
    )
    return hits, counts


@register("stream_video_frames", VIDEO_FRAMES_PAIRS_ORACLE)
def stream_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits, counts = stream_video_frames_plan(spark, sf_dir)
    drained = run_to_table(spark, hits, "append")
    shared = (
        drained.distinct()  # multi-batch replays dedupe on the hash key
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ca = counts.select(F.col("doc_id").alias("id_a"), F.col("nf").alias("na"))
    cb = counts.select(F.col("doc_id").alias("id_b"), F.col("nf").alias("nb"))
    jac = F.col("n_shared") / (
        F.col("na") + F.col("nb") - F.col("n_shared")
    ).cast("double")
    return (
        shared.join(ca, "id_a")
        .join(cb, "id_b")
        .filter(jac >= 0.5)
        .select(
            "id_a",
            "id_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# K4/K6 driver-proven (r08): the file-sink rows graduate from pytest-local
# to hash-checked driver rows by ROUND-TRIPPING through the real sink
# machinery — stream events through the checkpointed parquet sink (K4,
# month-partitioned like the reference's ParquetOutput) / the
# foreachBatch idempotent writer (K6, batch_id dynamic-partition
# overwrite), read the produced files back, and aggregate; the oracle is
# the equivalent batch SQL over events, so a bug anywhere in the
# write-read path breaks the hash. Sink dirs are fresh tempdirs per call
# (exactly-once RESTART semantics stay pytest-verified —
# test_checkpoint_recovery_exactly_once needs two runs over one
# checkpoint, which a single driver call can't express).
# ---------------------------------------------------------------------------


# Sink/checkpoint tempdirs are tracked and removed at interpreter exit
# (r08 ADVICE) — shared helper in plans/__init__.py.
from . import tmp_run_dir as _tmp_sink_dir  # noqa: E402


@register(
    "k4_parquet_sink_roundtrip",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def k4_parquet_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.sinks import parquet_sink

    base = _tmp_sink_dir("k4_sink_")
    ev = events_stream(spark, sf_dir).select(
        "event_id", "ts", "event_type", "value",
        F.date_format("ts", "yyyy-MM").alias("month"),
    )
    q = parquet_sink(
        ev, os.path.join(base, "data"), os.path.join(base, "ckpt"),
        partition_by="month",
    )
    q.awaitTermination()
    back = spark.read.parquet(os.path.join(base, "data"))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "k6_foreach_batch_roundtrip",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(event_id) AS BIGINT) AS min_event_id,
           CAST(max(event_id) AS BIGINT) AS max_event_id
    FROM events GROUP BY event_type
    """,
)
def k6_foreach_batch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.sinks import foreach_batch_sink, idempotent_parquet_handler

    base = _tmp_sink_dir("k6_sink_")
    out = os.path.join(base, "data")
    ev = events_stream(spark, sf_dir).select("event_id", "event_type")
    q = foreach_batch_sink(
        ev,
        idempotent_parquet_handler(out),
        checkpoint=os.path.join(base, "ckpt"),
        mode="append",
    )
    q.awaitTermination()
    back = spark.read.parquet(out)  # batch_id partition column rides along
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


@register(
    "k8_multi_sink_fanout",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    """,
)
def k8_multi_sink_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 driver-proven (r08): TWO streaming queries off one lineage — the
    same projection drains simultaneously into the checkpointed parquet
    sink AND a memory sink (the reference's console+parquet fan-out
    shape). The returned relation aggregates the parquet read-back; a
    loud equality check pins that both sinks saw the same row count, so
    the fan-out itself (not just one arm) is inside the verified path."""
    from ..streaming.sinks import memory_sink, parquet_sink

    base = _tmp_sink_dir("k8_fanout_")
    out = os.path.join(base, "data")
    ev = events_stream(spark, sf_dir).filter(F.col("user_id").isNotNull()).select(
        "event_id", "user_id", "event_type"
    )
    mem_name = f"k8_mem_{uuid.uuid4().hex[:8]}"
    q1 = parquet_sink(ev, out, os.path.join(base, "ckpt"))
    q2 = memory_sink(ev, mem_name, mode="append")
    q1.awaitTermination()
    q2.awaitTermination()
    back = spark.read.parquet(out)
    n_parquet, n_mem = back.count(), spark.table(mem_name).count()
    if n_parquet != n_mem:
        raise AssertionError(
            f"fan-out sinks disagree: parquet={n_parquet} memory={n_mem}"
        )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "t2_checkpoint_restart_roundtrip",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def t2_checkpoint_restart_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 driver-proven (r08): per-query checkpoint EXACTLY-ONCE across a
    restart, in one call — drain the bounded source into the parquet sink,
    then start a SECOND query on the SAME checkpoint + path. The restarted
    query finds the source fully committed and must write NOTHING; any
    offset-tracking bug duplicates rows and breaks the hash against plain
    batch SQL. (The crash-mid-batch variant needs fault injection and
    stays pytest: test_checkpoint_recovery_exactly_once.)"""
    from ..streaming.sinks import parquet_sink

    base = _tmp_sink_dir("t2_restart_")
    out, ckpt = os.path.join(base, "data"), os.path.join(base, "ckpt")
    ev = events_stream(spark, sf_dir).select("event_id", "event_type")
    parquet_sink(ev, out, ckpt).awaitTermination()
    # restart on the same checkpoint: must be a no-op, not a re-ingest
    ev2 = events_stream(spark, sf_dir).select("event_id", "event_type")
    parquet_sink(ev2, out, ckpt).awaitTermination()
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "t3_default_checkpoint_roundtrip",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    """,
)
def t3_default_checkpoint_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 driver-proven (r08): the SESSION-DEFAULT checkpoint location
    (reference Basic.scala's spark.sql.streaming.checkpointLocation
    conf) — the sink declares NO checkpointLocation of its own, the query
    checkpoints under the session conf dir (loudly verified non-empty),
    and the read-back aggregates against batch SQL."""
    base = _tmp_sink_dir("t3_default_")
    out, ckpt_root = os.path.join(base, "data"), os.path.join(base, "ckpt_root")
    prev = spark.conf.get("spark.sql.streaming.checkpointLocation", None)
    spark.conf.set("spark.sql.streaming.checkpointLocation", ckpt_root)
    try:
        ev = events_stream(spark, sf_dir).filter(
            F.col("user_id").isNotNull()
        ).select("user_id", "event_type")
        q = (
            ev.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)  # no checkpointLocation: session default
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.checkpointLocation")
        else:
            spark.conf.set("spark.sql.streaming.checkpointLocation", prev)
    if not any(os.scandir(ckpt_root)):
        raise AssertionError(
            f"session-default checkpoint dir {ckpt_root} unused"
        )
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


# ---------------------------------------------------------------------------
# Streaming count-min sketch (r09): the mergeable-sketch story ON A STREAM.
# The d x w cell table is exactly the state complete-mode maintains for a
# (j, bucket) count aggregation — fixed at 1024 cells regardless of stream
# length, the textbook bounded-state summary. Heavy-hitter scoring (exact
# top-20 from the static batch relation, estimate = min over the key's d
# drained cells) finishes batch-side; on a bounded drain the cells equal
# the batch sketch, so both twins share one oracle.
# ---------------------------------------------------------------------------

from .windows_stats import cms_cells, cms_hashed, cms_score  # noqa: E402
from . import ORACLE as _ORACLE_REG  # noqa: E402


@register("stream_countmin_users", _ORACLE_REG["sketch_countmin_users"])
def stream_countmin_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_stream(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
    )
    cells = run_to_table(spark, cms_cells(cms_hashed(ev)), "complete")
    # Scoring (exact top-20 + min-cell estimates) is the SAME code path as
    # the batch twin — only the cells relation differs.
    return cms_score(spark, sf_dir, cells)


# ---------------------------------------------------------------------------
# Streaming quantile sketch (r10, r09 VERDICT task 5): the histogram-cell
# twin of stream_countmin_users. The grid bounds are the sketch's
# CONFIGURATION (a 1-row static relation — broadcast is always safe on a
# fixed-size side); each arriving value is bucketed map-side and the
# <= _QSK_W-cell count table is exactly the bounded state complete mode
# maintains. Read-off + exact-rank scoring finishes batch-side through the
# same quantile_score the batch twin uses, so a bounded drain shares its
# oracle verbatim.
# ---------------------------------------------------------------------------

from .windows_stats import (  # noqa: E402
    quantile_bounds,
    quantile_cells,
    quantile_score,
    quantile_vals,
)


@register("stream_quantile_values", _ORACLE_REG["sketch_quantile_values"])
def stream_quantile_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEPLOYMENT CONTRACT (r10 VERDICT obs. 2): the grid bounds here are
    computed batch-side BEFORE the stream runs — the bounds are the
    sketch's epoch CONFIGURATION, exactly like the Bloom filter's bits/m
    or the BPE serving row's merge table: in production they come from a
    prior epoch's materialized (mn, mx) and the stream buckets against
    that fixed grid. A truly self-contained at-ingest build that derives
    its own bounds is stream_quantile_twophase below."""
    bounds = quantile_bounds(quantile_vals(spark, sf_dir))
    ev = (
        events_stream(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(F.col("value").cast("double").alias("value"))
    )
    # quantile_cells works unchanged on a streaming DataFrame — ONE cell
    # construction shared with the batch twin (the cms_cells idiom; an
    # inline copy here could drift under the shared oracle).
    drained = run_to_table(spark, quantile_cells(ev, bounds), "complete")
    return quantile_score(spark, sf_dir, drained, bounds)


# ---------------------------------------------------------------------------
# Streaming HLL distinct sketch (r10): the third sketch twin, completing
# batch+stream symmetry for the whole sketch family (count-min, quantile
# histogram, HLL). Each arriving order is hashed map-side (stateless md5 +
# rank projection shared with the batch twin via hll_hashed) and the
# register fold — groupBy MAX — is the ONLY streaming state: complete-mode,
# capped at groups x 256 rows no matter how long the stream runs (MAX is
# idempotent and monotone, the textbook streaming-sketch combine). Grid
# fill + estimate + exact error surface run batch-side on the drained
# registers through the same hll_grid_fill/hll_score the batch twin uses,
# so the bounded drain shares HLL_SKETCH_ORACLE verbatim.
# ---------------------------------------------------------------------------

from .windows_stats import (  # noqa: E402
    hll_fold,
    hll_grid_fill,
    hll_hashed,
    hll_score,
)

_ORDERS_HLL_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def orders_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded view of orders.parquet, schema-pruned to the two columns
    the HLL twin needs (parquet matches by name, so the declared subset
    schema doubles as scan pruning)."""
    return (
        spark.readStream.schema(_ORDERS_HLL_SCHEMA)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
    )


@register("stream_hll_distinct", _ORACLE_REG["sketch_hll_distinct"])
def stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    regs = run_to_table(
        spark, hll_fold(hll_hashed(orders_stream(spark, sf_dir))), "complete"
    )
    groups = (
        load_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    )
    return hll_score(spark, sf_dir, hll_grid_fill(regs, groups))


# ---------------------------------------------------------------------------
# At-ingest pretrain gate (r10, r09 VERDICT task 6): the streaming twin of
# pipeline_pretrain_v3's front door. Every arriving doc is, in ONE
# streaming query (a union of two stateless arms over the same source —
# no stream-stream join, no stream-side aggregation state):
#   arm 1 (per-doc): text-fingerprinted and probed against the exact-dedup
#     STORE (dedup_incremental_exact's shape: left-outer stream-static
#     equi-join on the word-set md5), and quality-scored map-side
#     (text_quality_logit's threshold);
#   arm 2 (per-chunk hit): its COVER image — synthesized from the first
#     _GATE_COVER_LEN chars, the thumbnail/cover fingerprint that survives
#     tail edits — is probed against the near-dup chunk catalog
#     (_media_probe_plan's Hamming-band shape).
# Both static sides are corpus-proportional: checkpoint-materialized, NO
# broadcast hint (the r08-task-1 rule; pinned in
# test_stream_static_joins_unhinted_equi). The drained rows collapse
# per-doc batch-side into keep/drop with the FIRST matching reason
# (exact_dup > near_dup_image > low_quality > ok) — the batch decision for
# the same corpus, which is exactly what the oracle replays (store = even
# doc ids; arriving = odd ids + exact re-crawls of every 6th doc (+300000)
# + tail-edited re-uploads of every 10th doc (+500000, text || ' zz'):
# same cover image, different word set — the near-dup-not-exact path).
# ---------------------------------------------------------------------------

from .llm import _FP_SQL, _PHASH_NIBS_CTE  # noqa: E402
from .textprep import _quality_cte_sql  # noqa: E402

_GATE_QUALITY_LT = 0.5  # text_quality_logit's published keep threshold
_GATE_COVER_LEN = 32  # cover payload length; every testdata doc is longer

PRETRAIN_GATE_ORACLE = f"""
    WITH store AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    arriving AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + 300000 AS doc_id, text
        FROM documents WHERE doc_id % 6 = 0
        UNION ALL
        SELECT doc_id + 500000 AS doc_id, text || ' zz' AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    sfp AS (SELECT DISTINCT {_FP_SQL.format(t='text')} AS fp FROM store),
    afp AS (SELECT doc_id, {_FP_SQL.format(t='text')} AS fp FROM arriving),
    corpus AS (
        SELECT doc_id, substring(text, 1, {_GATE_COVER_LEN}) AS text FROM store
        UNION ALL
        SELECT doc_id, substring(text, 1, {_GATE_COVER_LEN}) AS text
        FROM arriving
    ),
    {_PHASH_NIBS_CTE.strip()},
    hits AS (
        SELECT DISTINCT a.doc_id
        FROM nibs a JOIN nibs b
          ON (a.doc_id % 2 = 1 OR a.doc_id >= 300000)
         AND b.doc_id % 2 = 0 AND b.doc_id < 300000
        WHERE CAST(list_sum(list_transform(range(1, 17),
                j -> bit_count(xor(a.nb[j], b.nb[j])))) AS INT) <= 3
    ),
    {_quality_cte_sql('arriving').strip()}
    SELECT a.doc_id,
           CASE WHEN s.fp IS NOT NULL OR h.doc_id IS NOT NULL
                     OR q.quality_p < {_GATE_QUALITY_LT}
                THEN 'drop' ELSE 'keep' END AS decision,
           CASE WHEN s.fp IS NOT NULL THEN 'exact_dup'
                WHEN h.doc_id IS NOT NULL THEN 'near_dup_image'
                WHEN q.quality_p < {_GATE_QUALITY_LT} THEN 'low_quality'
                ELSE 'ok' END AS reason
    FROM afp a
    LEFT JOIN sfp s ON a.fp = s.fp
    LEFT JOIN hits h ON a.doc_id = h.doc_id
    JOIN quality q ON a.doc_id = q.doc_id
    """


def _gate_cover(df: DataFrame) -> DataFrame:
    """(doc_id, text=cover payload): the leading _GATE_COVER_LEN chars the
    synthetic cover image derives from — stable under tail edits."""
    return df.select(
        "doc_id", F.substring("text", 1, _GATE_COVER_LEN).alias("text")
    )


def stream_pretrain_gate_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-drain streaming plan (both arms unioned), exposed for the
    hint-free plan-shape test."""
    from ..functions.text import fingerprint
    from ..operators.dedup import (
        image_phash_fingerprints,
        phash_chunks,
        phash_hamming,
    )
    from ..operators.multimodal import attach_synthetic_image
    from .textprep import quality_p_col

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = docs.filter(F.col("doc_id") % 2 == 0)
    store_fps = (
        store.select(fingerprint("text").alias("s_fp"))
        .distinct()
        .localCheckpoint()
    )
    catalog = phash_chunks(
        image_phash_fingerprints(attach_synthetic_image(_gate_cover(store)))
    ).localCheckpoint()

    ds = documents_stream(spark, sf_dir).select("doc_id", "text")
    plants_exact = ds.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text"
    )
    plants_media = ds.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    arriving = (
        ds.filter(F.col("doc_id") % 2 == 1)
        .unionByName(plants_exact)
        .unionByName(plants_media)
    )

    doc_arm = (
        arriving.select(
            "doc_id",
            fingerprint("text").alias("fp"),
            quality_p_col().alias("quality_p"),
        )
        .join(store_fps, F.col("fp") == F.col("s_fp"), "left_outer")
        .select(
            "doc_id",
            F.when(F.col("s_fp").isNotNull(), 1).otherwise(0)
                .alias("exact_hit"),
            "quality_p",
            F.lit(0).alias("img_hit"),
        )
    )
    probe = phash_chunks(
        image_phash_fingerprints(attach_synthetic_image(_gate_cover(arriving)))
    ).alias("s")
    img_arm = (
        probe.join(
            catalog.alias("c"),
            (F.col("s.chunk_id") == F.col("c.chunk_id"))
            & (F.col("s.chunk_val") == F.col("c.chunk_val")),
        )
        .filter(phash_hamming(F.col("s.phash"), F.col("c.phash")) <= 3)
        .select(
            F.col("s.doc_id").alias("doc_id"),
            F.lit(0).alias("exact_hit"),
            F.lit(None).cast("double").alias("quality_p"),
            F.lit(1).alias("img_hit"),
        )
    )
    return doc_arm.unionByName(img_arm)


@register("stream_pretrain_gate", PRETRAIN_GATE_ORACLE)
def stream_pretrain_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keep/drop + reason per arriving doc; the per-doc collapse (max of
    the flag columns; every doc has exactly one doc-arm row carrying its
    quality score) and the reason priority run batch-side on the bounded
    drain."""
    drained = run_to_table(
        spark, stream_pretrain_gate_plan(spark, sf_dir), "append"
    )
    agg = drained.groupBy("doc_id").agg(
        F.max("exact_hit").alias("exact_hit"),
        F.max("img_hit").alias("img_hit"),
        F.max("quality_p").alias("quality_p"),
    )
    reason = (
        F.when(F.col("exact_hit") == 1, "exact_dup")
        .when(F.col("img_hit") == 1, "near_dup_image")
        .when(F.col("quality_p") < _GATE_QUALITY_LT, "low_quality")
        .otherwise("ok")
    )
    return agg.select("doc_id", reason.alias("reason")).select(
        "doc_id",
        F.when(F.col("reason") == "ok", "keep").otherwise("drop")
            .alias("decision"),
        "reason",
    )


# ---------------------------------------------------------------------------
# Streaming Bloom decontamination probe (r11, r10 VERDICT task 1): the
# fourth and final sketch twin, completing batch+stream symmetry for the
# whole deterministic-sketch family (count-min = frequency, histogram =
# quantiles, HLL = distinct, Bloom = membership). stream_decontaminate
# broadcasts the RAW eval-gram array, which grows with the benchmark
# suite; the Bloom BITS relation stays <= _BLOOM_M_CAP rows forever — the
# relation a 100 TB ingest actually ships to executors. The probe is
# completely STATELESS: each arriving doc explodes to its distinct grams
# map-side, the _BLOOM_K bit positions are computed as COLUMNS
# (bloom_pos_col — the same md5 definition _bloom_positions explodes into
# rows), and membership is _BLOOM_K chained stream-static inner
# equi-joins against the broadcast bits relation: a gram survives iff
# EVERY position is set, exactly the exploded form's count(*) = k without
# the streaming aggregation it would need. Surviving (doc_id, gram) rows
# drain append-mode; the per-doc collapse + exact audit arm run
# batch-side through the same bloom_score the batch twin uses, so the
# bounded drain shares BLOOM's oracle verbatim.
# ---------------------------------------------------------------------------

from .textprep import (  # noqa: E402
    _BLOOM_K,
    _bench_grams_df,
    bloom_bits,
    bloom_m,
    bloom_pos_col,
    bloom_score,
)


def stream_bloom_probe_plan(
    spark: SparkSession, sf_dir: str, bits: DataFrame, mrel: DataFrame
) -> DataFrame:
    """Pre-drain streaming plan (gram explode -> k chained broadcast
    probes), exposed for the broadcast-pinned plan-shape test. Both static
    sides are constant-bounded (bits <= _BLOOM_M_CAP rows, mrel is the
    1-row m config), so the broadcast hints are CORRECT here — the
    opposite case from the corpus-proportional stream-static sides the
    r08 rule un-hints."""
    from ..functions.text import shingles_from_words
    from .textprep import _DECON_N

    stream = (
        documents_stream(spark, sf_dir)
        .select("doc_id", F.split("text", " ").alias("_w"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles_from_words("_w", _DECON_N))
            ).alias("gram"),
        )
    )
    probe = stream.crossJoin(F.broadcast(mrel)).select(
        "doc_id",
        "gram",
        *[
            bloom_pos_col(F.col("gram"), F.col("m"), j)
            for j in range(_BLOOM_K)
        ],
    )
    hit = probe
    for j in range(_BLOOM_K):
        bj = bits.withColumnRenamed("pos", f"bpos{j}")
        hit = hit.join(
            F.broadcast(bj), F.col(f"pos{j}") == F.col(f"bpos{j}")
        ).drop(f"bpos{j}", f"pos{j}")
    return hit.select("doc_id", "gram")


@register(
    "stream_bloom_decontaminate", _ORACLE_REG["sketch_bloom_decontaminate"]
)
def stream_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-ingest Bloom membership probe: per arriving doc, the distinct
    grams flagged by the eval-set Bloom filter vs the exact set, sharing
    the batch twin's oracle on a bounded drain. The filter (bits + 1-row m
    config) is built batch-side from the eval set — in production it is
    yesterday's materialized filter, OR-merged across builders
    (test_bloom_bits_merge) — and localCheckpoint-materialized so the
    per-micro-batch probes replay a computed relation, not the gram
    explode that derived it."""
    docs = load_table(spark, sf_dir, "documents")
    bg = _bench_grams_df(docs).select("gram").distinct().localCheckpoint()
    mrel = bloom_m(bg).localCheckpoint()
    bits = bloom_bits(bg, mrel).localCheckpoint()
    drained = run_to_table(
        spark, stream_bloom_probe_plan(spark, sf_dir, bits, mrel), "append"
    )
    return bloom_score(spark, sf_dir, drained, bg)


# ---------------------------------------------------------------------------
# At-ingest BPE tokenization (r11, r10 VERDICT task 4): closes the
# trainer->serving loop the way the sketch twins close batch->stream.
# train_bpe_merges LEARNS the merge table; this query SERVES it on a
# document stream. The table is trained batch-side (in production:
# yesterday's published tokenizer — the epoch-config contract, same class
# as the quantile sketch's grid bounds) and, being <= _BPE_ROUNDS rows by
# construction, embeds in the streaming plan as LITERAL regexp_replace
# patterns (the FIXED-K discipline: constant-bounded config may live in
# the plan; corpus-proportional relations may not). The whole streaming
# arm is ONE map-side projection — encode each doc's [a-z]+ words
# (two-space symbol encoding, '|' word separators so merges cannot cross
# words), run the merge chain, count token runs — zero joins, zero
# shuffles, zero state (plan-pinned by test_stream_bpe_tokenize_mapside).
# Surface per doc: n_words, n_chars_az (character-level token count =
# pre-merge symbols), n_tokens (post-merge), fertility = tokens/word.
# ---------------------------------------------------------------------------

from .textprep import (  # noqa: E402
    _BPE_ROUNDS,
    STREAM_BPE_TOKENIZE_ORACLE,
    bpe_word_freqs,
)

_BPE_STREAM_WORDS_SQL = "filter(split(text, ' '), w -> w rlike '^[a-z]+$')"


def stream_bpe_tokenize_plan(
    spark: SparkSession, sf_dir: str, merges: list[tuple]
) -> DataFrame:
    """Pre-drain streaming plan (encode -> literal merge chain -> counts),
    exposed for the zero-shuffle plan-shape test."""
    from ..operators.bpe import merge_pattern

    enc = F.expr(
        "concat_ws('|', transform(_ws, w -> regexp_replace(w, '(.)', ' $1 ')))"
    )
    for _rnd, a, b, _m, _pc in merges:  # training order — later merges
        pat, rep = merge_pattern(a, b)  # consume earlier merged symbols
        enc = F.regexp_replace(enc, pat, rep)
    return (
        documents_stream(spark, sf_dir)
        .select("doc_id", F.expr(_BPE_STREAM_WORDS_SQL).alias("_ws"))
        .filter(F.size("_ws") > 0)
        .select(
            "doc_id",
            F.size("_ws").cast("long").alias("n_words"),
            F.length(F.concat_ws("", F.col("_ws"))).cast("long")
            .alias("n_chars_az"),
            enc.alias("enc"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_chars_az",
            F.expr("CAST(size(regexp_extract_all(enc, '[a-z]+', 0)) AS BIGINT)")
            .alias("n_tokens"),
        )
        .withColumn(
            "fertility",
            F.round(F.col("n_tokens").cast("double") / F.col("n_words"), 4),
        )
    )


@register("stream_bpe_tokenize", STREAM_BPE_TOKENIZE_ORACLE)
def stream_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per arriving doc: word/char/BPE-token counts + fertility under the
    merge table train_bpe_merges learns on the batch corpus. The oracle
    replays the training rounds (shared _BPE_W0_CTE chain) and then the
    doc-level merge chain, so the learned literals and the replayed m1..mN
    are provably the same merges."""
    from ..operators.bpe import train_bpe

    merges, _enc = train_bpe(
        bpe_word_freqs(load_table(spark, sf_dir, "documents")), _BPE_ROUNDS
    )
    # The oracle unrolls exactly _BPE_ROUNDS doc-level CTEs; a trainer that
    # exhausted pairs early would empty the oracle's m{i} CROSS JOIN and
    # fail parity confusingly downstream — fail HERE instead (r11 ADVICE;
    # a real raise, not assert, so python -O can't strip the guard).
    if len(merges) != _BPE_ROUNDS:
        raise ValueError(
            f"train_bpe returned {len(merges)} merges, oracle unrolls "
            f"{_BPE_ROUNDS} — corpus too small for the fixed round count"
        )
    return run_to_table(
        spark, stream_bpe_tokenize_plan(spark, sf_dir, merges), "append"
    )


# ---------------------------------------------------------------------------
# Two-phase self-contained quantile sketch (r11, r10 VERDICT task 5):
# stream_quantile_values scores against batch-computed bounds (the
# epoch-config contract its docstring states); THIS twin derives its own
# bounds from the stream, making the whole sketch self-contained. Phase 1
# folds (mn, mx, n) as a complete-mode global aggregation — 1 row of
# state forever, the minimal mergeable fold. Phase 2 re-drains the
# bounded source bucketing against the PHASE-1 DRAINED bounds (a
# stream-static broadcast of one row). In production the two phases are
# consecutive epochs — today's grid uses yesterday's bounds fold; on a
# bounded drain the two passes see identical data, so the result equals
# the batch sketch and shares its oracle verbatim.
# ---------------------------------------------------------------------------


@register("stream_quantile_twophase", _ORACLE_REG["sketch_quantile_values"])
def stream_quantile_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    def vals_stream() -> DataFrame:
        return (
            events_stream(spark, sf_dir)
            .filter(F.col("value").isNotNull())
            .select(F.col("value").cast("double").alias("value"))
        )

    # Phase 1: the bounds fold — quantile_bounds works unchanged on a
    # streaming DataFrame (min/max/count are the textbook mergeable agg).
    bounds = run_to_table(spark, quantile_bounds(vals_stream()), "complete")
    # Phase 2: bucket a fresh pass of the source against the drained
    # 1-row bounds; the <= _QSK_W-cell fold is the only state.
    cells = run_to_table(
        spark, quantile_cells(vals_stream(), bounds), "complete"
    )
    return quantile_score(spark, sf_dir, cells, bounds)


# ---------------------------------------------------------------------------
# Windowed streaming HLL (r11, r10 VERDICT task 8): approximate distinct
# users OVER TIME WINDOWS — the distinct-users-per-hour dashboard every
# serving tier wants, as one streaming query. The register fold keys by
# (tumbling 1h window, event_type, bucket): complete-mode state is
# bounded at windows x groups x _HLL_M rows, and in a production
# append-mode deployment the declared watermark expires closed windows'
# registers, so the bound is ACTIVE windows x groups x 256 forever.
# Grid fill + estimate + exact-rank scoring run batch-side on the drained
# registers through the SAME generalized hll_grid_fill/hll_score the
# orders twins use (group_cols parametrized, definitions unchanged).
# Small-range honesty: an hour x type slice holds a few hundred distinct
# users (n/m ~ 1), squarely the linear-counting regime — zero_regs > 0
# and the wide err_pct ARE the surface, not hidden behind a
# cross-engine-unsafe ln() correction (the sketch_hll_distinct contract).
# ---------------------------------------------------------------------------

from .windows_stats import (  # noqa: E402
    _HLL_ALPHA,
    _HLL_M,
    _HLL_NIBS,
    _HLL_SHIFT,
    _hll_w_sql,
)

_HLL_EV_H_SQL = "md5('hll:' || CAST(user_id AS VARCHAR))"

def _hll_window_oracle(ev_cte: str, gcols: tuple) -> str:
    """ONE oracle generator for the windowed/sliding HLL twins (r11
    review: the register-sum and estimate SQL were restated per variant
    and could drift). ``ev_cte`` must end by defining ev(gcols...,
    user_id); the chain replays windows_stats.HLL_SKETCH_ORACLE's
    hashed -> regs -> grid -> full_regs -> sk -> exact -> est stages
    keyed by ``gcols`` — the register-rank derivation, fixed-point
    indicator sum, and pinned est_raw op order MUST stay textually in
    sync with that batch oracle (its text is driver-green and cannot
    change without a FORCE_RECHECK slot, so it stays the canonical
    copy)."""
    g = ", ".join(gcols)
    grid_g = ", ".join(f"grid.{c}" for c in gcols)
    sk_g = ", ".join(f"sk.{c}" for c in gcols)
    on_eq = "\n         AND ".join(f"regs.{c} = grid.{c}" for c in gcols)
    nums = ", ".join(str(i + 1) for i in range(len(gcols)))
    nums_b = ", ".join(str(i + 1) for i in range(len(gcols) + 1))
    return f"""
    WITH {ev_cte.strip()},
    hashed AS (
        SELECT {g},
               (strpos('{_HLL_NIBS}', substring({_HLL_EV_H_SQL}, 1, 1)) - 1) * 16
                 + (strpos('{_HLL_NIBS}', substring({_HLL_EV_H_SQL}, 2, 1)) - 1)
                 AS bucket,
               CAST(61 - length(trim(LEADING '0'
                                     FROM bin({_hll_w_sql(_HLL_EV_H_SQL)})))
                    AS BIGINT) AS r
        FROM ev
    ),
    regs AS (SELECT {g}, bucket, max(r) AS r
             FROM hashed GROUP BY {nums_b}),
    grid AS (SELECT {g}, b.range AS bucket
             FROM (SELECT DISTINCT {g} FROM ev)
             CROSS JOIN range({_HLL_M}) b),
    full_regs AS (
        SELECT {grid_g}, grid.bucket,
               coalesce(regs.r, 0) AS register
        FROM grid LEFT JOIN regs
          ON {on_eq}
         AND regs.bucket = grid.bucket
    ),
    sk AS (
        SELECT {g},
               sum(CASE WHEN register > {_HLL_SHIFT} THEN 0
                        ELSE (1::BIGINT << ({_HLL_SHIFT} - register)) END)
                   AS s,
               sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS zero_regs
        FROM full_regs GROUP BY {nums}
    ),
    exact AS (SELECT {g}, count(DISTINCT user_id) AS n
              FROM ev GROUP BY {nums}),
    est AS (
        SELECT {sk_g},
               CAST(exact.n AS BIGINT) AS exact_n,
               {_HLL_ALPHA}::DOUBLE * {float(_HLL_M * _HLL_M)}::DOUBLE
                 * {float(2 ** _HLL_SHIFT)}::DOUBLE / CAST(sk.s AS DOUBLE)
                 AS est_raw,
               CAST(sk.zero_regs AS BIGINT) AS zero_regs
        FROM sk JOIN exact USING ({g})
    )
    SELECT {g}, exact_n,
           round(est_raw, 4) AS est, zero_regs,
           round((est_raw - exact_n) * 100.0 / exact_n, 4) + 0 AS err_pct
    FROM est
    """


_HLL_WIN_EV_CTE = """ev AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
                   AS window_end,
               event_type, user_id
        FROM events WHERE user_id IS NOT NULL
    )"""

HLL_WINDOWED_ORACLE = _hll_window_oracle(
    _HLL_WIN_EV_CTE, ("window_start", "window_end", "event_type")
)

_HLL_WIN_GCOLS = ("window_start", "window_end", "event_type")


def hll_windowed_fold(ev: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """The windowed HLL register fold — hash each (ts, event_type, user)
    row to (bucket, rank), watermark, and max-fold registers per
    (tumbling 1h window, event_type, bucket). THE production definition
    stream_hll_windowed drains and
    tests/test_streaming.py::test_windowed_sketch_watermark_expires_state
    runs in append mode across micro-batches (r12, r11 VERDICT task 4):
    the watermark bound ("state = ACTIVE windows x groups x 256") is a
    pinned contract, not prose."""
    return (
        hll_hashed(ev, key="user_id", group_cols=("ts", "event_type"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type", "bucket")
        .agg(F.max("r").alias("r"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type", "bucket", "r",
        )
    )


@register("stream_hll_windowed", HLL_WINDOWED_ORACLE)
def stream_hll_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_stream(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("ts", "event_type", "user_id")
    )
    ev_b = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(F.window("ts", "1 hour").alias("window"), "event_type",
                "user_id")
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type", "user_id",
        )
    )
    groups = ev_b.select(*_HLL_WIN_GCOLS).distinct()
    exact = ev_b.groupBy(*_HLL_WIN_GCOLS).agg(
        F.countDistinct("user_id").alias("n")
    )
    # r20 (guide §2.6): the exact-distinct/groups batch arms are
    # independent of the drain — materialize them in parallel with it
    # (the _cms_windowed_query idiom; checkpoints double as true stats
    # for the downstream grid/score joins).
    regs_drained, groups, exact = _run_jobs(
        lambda: run_to_table(spark, hll_windowed_fold(ev), "complete"),
        lambda: groups.localCheckpoint(),
        lambda: exact.localCheckpoint(),
    )
    return hll_score(
        spark, sf_dir,
        hll_grid_fill(regs_drained, groups, group_cols=_HLL_WIN_GCOLS),
        group_cols=_HLL_WIN_GCOLS,
        exact=exact,
    )


# ---------------------------------------------------------------------------
# At-ingest MinHash near-dup probe (r11): the TEXT near-dup member of the
# at-ingest probe matrix — stream_image_phash/audio/video probe media
# fingerprints, stream_dedup_fingerprint probes EXACT text fingerprints;
# this probes NEAR-dup text the production way: MinHash + LSH bands. The
# stream arm is completely stateless because the per-doc signature is
# computed WITHIN THE ROW — sig_j = array_min over the doc's shingle-hash
# array of the affine permutation (a_j*h + b_j) % P, the same constants
# operators/dedup.minhash_signatures min-aggregates (min over a set is
# min over its array) — so no streaming groupBy is needed; the 5 band
# values are md5s of signature slices (identical to lsh_band_values') and
# stack-explode to (band_id, band_val) rows that equi-join the STORE's
# banded catalog. The catalog is corpus-proportional: checkpoint-
# materialized, UNHINTED (the r08 rule; eighth builder in
# test_stream_static_joins_unhinted_equi). Arriving = odd docs + tail-
# truncated (4/5) copies of every 10th doc under +400000 — the planted
# near-dups land at Jaccard ~0.75 where 5x3 banding recalls ~95%. Hits
# drain append-mode; the per-doc candidate count collapses batch-side.
# ---------------------------------------------------------------------------

from .llm import (  # noqa: E402
    _BANDS as _MH_BANDS,
    _BASE_H as _MH_BASE_H,
    _NUM_HASHES as _MH_NUM_HASHES,
    _SIG_MINS as _MH_SIG_MINS,
    _BAND_SELECTS as _MH_BAND_SELECTS,
    SHINGLES_CTE as _MH_SHINGLES_CTE,
)
from ..operators import dedup as _DD  # noqa: E402

# Planted near-dups land at source doc_id + this offset. Both sides use it
# symmetrically (r11 ADVICE: the Spark store side previously relied on
# max(doc_id) < offset implicitly while the oracle filtered explicitly) —
# the store is "even AND below the plant range" in BOTH texts, so a corpus
# whose ids ever crossed the offset would diverge loudly in neither.
_MH_PLANT_OFFSET = 400000

STREAM_MINHASH_PROBE_ORACLE = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_MH_PLANT_OFFSET} AS doc_id,
               substring(text, 1, CAST(floor(4*length(text)/5.0) AS INT))
                   AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    {_MH_SHINGLES_CTE.strip()},
    hashed AS (SELECT doc_id, {_MH_BASE_H} AS h FROM sh),
    sig AS (
        SELECT doc_id,
           {_MH_SIG_MINS}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
    {_MH_BAND_SELECTS}
    ),
    hits AS (
        SELECT DISTINCT a.doc_id, s.doc_id AS store_id
        FROM bands a JOIN bands s
          ON a.band_id = s.band_id AND a.band_val = s.band_val
        WHERE (a.doc_id % 2 = 1 OR a.doc_id >= {_MH_PLANT_OFFSET})
          AND s.doc_id % 2 = 0 AND s.doc_id < {_MH_PLANT_OFFSET}
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_store_candidates
    FROM hits GROUP BY doc_id
    """


def stream_minhash_probe_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-drain streaming plan (within-row signature -> band explode ->
    unhinted catalog equi-join), exposed for the hint-free plan test."""
    from ..functions.text import shingles_from_words

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store_sig = _DD.minhash_signatures(
        _DD.doc_shingles(
            docs.filter(
                (F.col("doc_id") % 2 == 0)
                & (F.col("doc_id") < _MH_PLANT_OFFSET)
            ),
            distinct=False,
        ),
        num_hashes=_MH_NUM_HASHES,
    )
    catalog = (
        _DD.lsh_band_values(
            store_sig, num_hashes=_MH_NUM_HASHES, bands=_MH_BANDS
        )
        .withColumnRenamed("doc_id", "store_id")
        .localCheckpoint()
    )

    ds = documents_stream(spark, sf_dir).select("doc_id", "text")
    plants = ds.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + _MH_PLANT_OFFSET).alias("doc_id"),
        F.expr(
            "substring(text, 1, CAST(floor(4*length(text)/5.0) AS INT))"
        ).alias("text"),
    )
    arriving = ds.filter(F.col("doc_id") % 2 == 1).unionByName(plants)
    hashed = (
        arriving.select("doc_id", F.split("text", " ").alias("_w"))
        .select("doc_id", shingles_from_words("_w", 3).alias("_sh"))
        .select(
            "doc_id",
            F.expr(_DD.MINHASH_HASH_ARRAY_SQL).alias("_hs"),
        )
    )
    # Within-row signature: array_min over the shingle-hash array of the
    # SAME affine family minhash_signatures min-aggregates — a pure
    # projection, so the arriving side never shuffles or holds state
    # (single definition shared with the parity test).
    sig_cols = _DD.minhash_sig_cols_within_row(_MH_NUM_HASHES)
    probe_bands = _DD.lsh_band_values(
        hashed.select("doc_id", *sig_cols),
        num_hashes=_MH_NUM_HASHES,
        bands=_MH_BANDS,
    )
    return probe_bands.join(catalog, ["band_id", "band_val"]).select(
        "doc_id", "store_id"
    )


@register("stream_minhash_probe", STREAM_MINHASH_PROBE_ORACLE)
def stream_minhash_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per arriving doc with >= 1 LSH band hit against the ingested-store
    catalog: the number of DISTINCT store docs it banded with — the
    candidate set a production gate would verify (or drop on, at the
    recall/precision point the band geometry sets). Collapse runs
    batch-side on the bounded drain (a doc's band hits need no order)."""
    drained = run_to_table(
        spark, stream_minhash_probe_plan(spark, sf_dir), "append"
    )
    return drained.groupBy("doc_id").agg(
        F.countDistinct("store_id").cast("long").alias("n_store_candidates")
    )


# ---------------------------------------------------------------------------
# At-ingest near-dup detection with a GROWING band catalog (r16): the
# third ingest-maintenance operator (IVF appendix = vectors, fp store =
# exact dedup, this = near-dup) and the production upgrade of
# stream_minhash_probe, whose catalog is frozen at stream start — a
# web-crawl ingest must detect near-dups against EVERYTHING ingested so
# far, including docs that arrived five minutes ago. Each micro-batch
# computes its band rows (the proven batch machinery — inside
# foreachBatch the batch is a batch DataFrame, so the groupBy signature
# form applies), probes the catalog AS OF its batch (partitions with
# batch_id < current — the read-your-predecessors bound the fp store
# established) plus same-batch smaller-id rows, then appends its OWN
# band rows as a dynamic-overwrite partition. Every ingested doc joins
# the catalog regardless of its own status (a near-dup of a near-dup
# still bands with both). First arrival wins, arrival order is id order
# by construction, so the oracle replays every count with an
# earlier-prior rule over one global bands relation — batch-split-free.
#
# Scale: per batch, |batch| x bands rows against the band-keyed catalog
# read (UNHINTED — the catalog grows with the corpus) and a
# batch-bounded within-batch self-join; the append is |batch| x bands
# rows, never a catalog rewrite. Hot band buckets at web scale get the
# max_bucket_size cap upstream (dedup_minhash_lsh_capped's trade).
# ---------------------------------------------------------------------------


def _mh_catalog_handler(
    catalog_dir: str,
    decisions_dir: str,
    retention_batches: int | None = None,
):
    """foreachBatch handler: band the batch, count DISTINCT prior docs
    (earlier partitions + same-batch smaller ids) sharing >= 1 band per
    arriving doc, append the batch's band rows. Both writes are
    (batch_id)-partitioned dynamic overwrites — exactly-once on replay,
    and the batch_id < current catalog bound keeps a REPLAYED batch from
    banding against its own rows. ``retention_batches`` windows the
    probe to the last W batches' band rows (see _catalog_prior_hits);
    appends are unchanged — an expired doc's bands simply stop being
    probed, and would age back in only by re-arriving."""

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        bands = _batch_band_rows(batch_df)
        hits = _catalog_prior_hits(
            catalog_dir, bands, batch_id, retention_batches
        )
        counts = hits.distinct().groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        # Independent writes (own dirs) — overlap them (r19, guide §2.6).
        _run_jobs(
            lambda: _overwrite_batch_partition(
                batch_df.select("doc_id")
                .join(counts, "doc_id", "left_outer")
                .select(
                    "doc_id",
                    F.coalesce(F.col("n"), F.lit(0))
                    .cast("long")
                    .alias("n_prior_candidates"),
                ),
                decisions_dir,
                batch_id,
            ),
            lambda: _overwrite_batch_partition(bands, catalog_dir, batch_id),
        )

    return handler


def _batch_band_rows(batch_df: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_val) for a micro-batch, computed WITHIN THE
    ROW (r20, guide §2.4 — the r11 stream_minhash_probe idiom applied to
    the maintenance handlers): sig_j = array_min over the doc's
    shingle-hash array of the same affine family minhash_signatures
    min-aggregates (min over a set = min over its array), band values =
    the shared lsh_band_values md5s. A pure projection — the old
    doc_shingles explode + groupBy form paid a full shuffle of the
    exploded shingle rows PER MICRO-BATCH (profiled ~0.8-1.2s/batch at
    sf0.1, the dominant handler phase). Rows identical: same shingles,
    same permutation constants, duplicate shingles irrelevant to min.
    Checkpointed: one derivation feeds the probe, the within-batch
    self-join AND the catalog append."""
    from ..functions.text import shingles_from_words

    hashed = (
        batch_df.select("doc_id", F.split("text", " ").alias("_w"))
        .select("doc_id", shingles_from_words("_w", 3).alias("_sh"))
        .select("doc_id", F.expr(_DD.MINHASH_HASH_ARRAY_SQL).alias("_hs"))
        # a <n-word doc has NO shingles: the groupBy form (and the
        # oracle's GROUP BY CTE) emits no sig row for it, so the
        # within-row form must drop it too, not band NULL sigs
        .filter(F.size("_hs") > 0)
    )
    return _DD.lsh_band_values(
        hashed.select(
            "doc_id", *_DD.minhash_sig_cols_within_row(_MH_NUM_HASHES)
        ),
        num_hashes=_MH_NUM_HASHES,
        bands=_MH_BANDS,
    ).localCheckpoint()


def _catalog_prior_hits(
    catalog_dir: str,
    bands: DataFrame,
    batch_id: int,
    retention_batches: int | None = None,
) -> DataFrame:
    """(doc_id, prior_id) band collisions against every PRIOR ingested
    doc: catalog partitions appended by earlier batches (batch_id <
    current — the read-your-predecessors bound) plus same-batch rows with
    a smaller doc_id (arrival order is id order by construction).
    ``retention_batches`` EXPIRES old band rows: only partitions with
    batch_id >= current - W stay visible (the seed ages out after W
    batches), bounding the probe scan by the window. Unlike the fp
    store, catalog visibility is NOT recursive — every ingested doc's
    bands append regardless of status, so a row is visible iff its
    batch is in the window. May contain duplicates; callers distinct()
    as needed."""
    prior = _read_state(
        bands.sparkSession, catalog_dir, _MH_CATALOG_SCHEMA
    ).filter(F.col("batch_id") < batch_id)
    if retention_batches is not None:
        prior = prior.filter(
            F.col("batch_id") >= batch_id - retention_batches
        )
    prior = prior.select(
        "band_id", "band_val", F.col("doc_id").alias("prior_id")
    )
    hits_prior = bands.join(prior, ["band_id", "band_val"]).select(
        "doc_id", "prior_id"
    )
    return hits_prior.unionByName(_within_batch_band_hits(bands))


def _within_batch_band_hits(bands: DataFrame) -> DataFrame:
    """(doc_id, prior_id) same-batch band collisions with a smaller
    doc_id — the batch-bounded self-join arm of _catalog_prior_hits,
    factored (r18) so the first micro-batch of a seedless ingest (no
    catalog directory yet) can probe within itself alone."""
    return (
        bands.join(
            bands.select(
                "band_id", "band_val", F.col("doc_id").alias("prior_id")
            ),
            ["band_id", "band_val"],
        )
        .filter(F.col("prior_id") < F.col("doc_id"))
        .select("doc_id", "prior_id")
    )


# One oracle for the growing-catalog ingest AND its mid-lifecycle
# compaction twin (the STREAM_DEDUP_STORE_ORACLE sharing pattern):
# compaction preserves the catalog's content exactly, so registering
# both against the same text makes the driver hash-prove it.
STREAM_MH_CATALOG_ORACLE = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_MH_PLANT_OFFSET} AS doc_id,
               substring(text, 1, CAST(floor(4*length(text)/5.0) AS INT))
                   AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    {_MH_SHINGLES_CTE.strip()},
    hashed AS (SELECT doc_id, {_MH_BASE_H} AS h FROM sh),
    sig AS (
        SELECT doc_id,
           {_MH_SIG_MINS}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
    {_MH_BAND_SELECTS}
    ),
    arr AS (SELECT doc_id FROM corpus
            WHERE doc_id % 2 = 1 OR doc_id >= {_MH_PLANT_OFFSET}),
    hits AS (
        SELECT DISTINCT a.doc_id, p.doc_id AS prior_id
        FROM bands a JOIN bands p
          ON a.band_id = p.band_id AND a.band_val = p.band_val
        WHERE (a.doc_id % 2 = 1 OR a.doc_id >= {_MH_PLANT_OFFSET})
          AND ((p.doc_id % 2 = 0 AND p.doc_id < {_MH_PLANT_OFFSET})
               OR ((p.doc_id % 2 = 1 OR p.doc_id >= {_MH_PLANT_OFFSET})
                   AND p.doc_id < a.doc_id))
    )
    SELECT arr.doc_id,
           CAST(count(h.prior_id) AS BIGINT) AS n_prior_candidates
    FROM arr LEFT JOIN hits h ON arr.doc_id = h.doc_id
    GROUP BY arr.doc_id
    """


@register("stream_minhash_catalog_ingest", STREAM_MH_CATALOG_ORACLE)
def stream_minhash_catalog_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_prior_candidates): per arriving doc, the number of
    DISTINCT previously-ingested docs (seed catalog, earlier batches, or
    same-batch smaller ids) it shares >= 1 LSH band with — near-dup
    candidate detection whose catalog GROWS at ingest. The planted
    tail-truncated re-uploads band with their store sources like the
    frozen-catalog probe's, and odd/odd near-dups arriving in different
    files are counted via partitions an earlier batch APPENDED (pinned by
    tests/test_streaming.py::test_minhash_catalog_cross_batch_growth)."""
    return _mh_catalog_run(spark, sf_dir, "mhcat_")


def _mh_catalog_run(
    spark: SparkSession,
    sf_dir: str,
    prefix: str,
    retention_batches: int | None = None,
) -> DataFrame:
    """Seed the band catalog, stream the id-ordered arrivals through the
    catalog handler, return the drained decisions — the one ingest body
    shared by the unbounded and TTL'd registrations."""
    from ..streaming.sinks import foreach_batch_sink

    from . import tmp_run_dir

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_dir = tmp_run_dir(prefix)
    catalog_dir = os.path.join(base_dir, "catalog")
    decisions_dir = os.path.join(base_dir, "decisions")
    src_dir = os.path.join(base_dir, "arrivals")

    # Seed and arrival writes are independent jobs — overlap (r19 §2.6).
    _run_jobs(
        lambda: _seed_state(_mh_catalog_seed(docs), catalog_dir),
        lambda: _write_id_ordered_arrivals(src_dir, _mh_arrival_parts(docs)),
    )
    q = foreach_batch_sink(
        _arrivals_stream(spark, src_dir),
        _mh_catalog_handler(catalog_dir, decisions_dir, retention_batches),
        checkpoint=os.path.join(base_dir, "ckpt"),
        mode="append",
    )
    q.awaitTermination()
    return spark.read.parquet(decisions_dir).select(
        "doc_id", "n_prior_candidates"
    )


def _mh_catalog_seed(docs: DataFrame) -> DataFrame:
    """The ingested store's band rows (even doc ids below the plant
    range) — the band-catalog seed."""
    return _DD.lsh_band_values(
        _DD.minhash_signatures(
            _DD.doc_shingles(
                docs.filter(
                    (F.col("doc_id") % 2 == 0)
                    & (F.col("doc_id") < _MH_PLANT_OFFSET)
                ),
                distinct=False,
            ),
            num_hashes=_MH_NUM_HASHES,
        ),
        num_hashes=_MH_NUM_HASHES,
        bands=_MH_BANDS,
    )


def _mh_arrival_parts(docs: DataFrame) -> list:
    """The catalog-ingest arrival files: odd ids in 3 id ranges + the
    +_MH_PLANT_OFFSET tail-truncated re-uploads of every 10th doc."""
    plants = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + _MH_PLANT_OFFSET).alias("doc_id"),
        F.expr(
            "substring(text, 1, CAST(floor(4*length(text)/5.0) AS INT))"
        ).alias("text"),
    )
    odds = docs.filter(F.col("doc_id") % 2 == 1)
    return _id_range_parts(odds, plants, plant_offset=_MH_PLANT_OFFSET)


# ---------------------------------------------------------------------------
# Mid-lifecycle state compaction (r17, r16 VERDICT stretch task 8): the
# IVF index got its housekeeping arm (sim_ivf_compacted_probe); the fp
# store and band catalog accumulate one partition per micro-batch
# FOREVER — at one batch per minute that is half a million partitions a
# year, and the per-batch "batch_id < current" scan pays for every one
# of them. Compaction collapses all partitions into a single fresh seed
# partition (one read, one write, off the ingest path — the directory-
# swap deployment sim_ivf_compacted_probe documents). The proof is
# STRONGER than compact-at-end: compaction runs MID-INGEST — the first
# half of the arrival files maintain state_a, the collapsed rewrite
# seeds state_b, and the remaining files ingest against state_b — and
# the union of both phases' decisions registers against the SAME oracle
# as the uninterrupted ingest, so the driver hash proves compaction
# loses and invents nothing while decisions are still being made
# against it. Phase B's fresh checkpoint restarts batch ids at 0 > -1,
# so the read-your-predecessors bound sees the whole compacted state.
# ---------------------------------------------------------------------------


def _compact_state(
    spark: SparkSession,
    state_dir: str,
    out_dir: str,
    schema: str | None = None,
) -> None:
    """Collapse every batch_id partition of an ingest-maintained state
    into ONE fresh batch_id=-1 seed partition. Pure rewrite: appends are
    novel-only (store) / per-doc-unique (catalog), so no dedup pass is
    needed — one scan in, one partition out.

    UNBOUNDED STATE ONLY — incompatible with the retention handlers: a
    TTL'd store re-appends re-admitted fps under new batch_ids (the
    novel-only premise breaks), and collapsing to -1 destroys per-row
    AGE — just-expired content would resurrect for W more batches, then
    the whole store would expire at once at batch W. TTL-compatible
    compaction must rewrite FILES WITHIN each batch_id partition,
    preserving the partition keys — a different operation."""
    rows = (
        _read_state(spark, state_dir, schema)
        if schema is not None
        else spark.read.parquet(state_dir)
    )
    _seed_state(rows.drop("batch_id"), out_dir)


def _compacted_two_phase_ingest(
    spark: SparkSession,
    prefix: str,
    seed_rows: DataFrame,
    parts: list,
    make_handler,
    state_schema: str | None = None,
):
    """Seed state, ingest parts[:2], COMPACT, ingest parts[2:] against
    the compacted state; return the two decisions dirs. Shared by the
    state-maintenance compaction twins (fp store / band catalog / image
    chunk catalog). ``make_handler`` is called with an EXPLICIT
    ``retention_batches=None`` — _compact_state is unbounded-state-only
    (see its docstring), so a factory curried with a TTL window fails
    here with a TypeError instead of silently corrupting the retention
    semantics (r17 ADVICE: the caveat must be checkable, not prose)."""
    from ..streaming.sinks import foreach_batch_sink

    from . import tmp_run_dir

    base_dir = tmp_run_dir(prefix)
    state_a = os.path.join(base_dir, "state_a")
    state_b = os.path.join(base_dir, "state_b")
    dec_a = os.path.join(base_dir, "dec_a")
    dec_b = os.path.join(base_dir, "dec_b")

    _seed_state(seed_rows, state_a)
    _write_id_ordered_arrivals(os.path.join(base_dir, "arr_a"), parts[:2])
    q = foreach_batch_sink(
        _arrivals_stream(spark, os.path.join(base_dir, "arr_a")),
        make_handler(state_a, dec_a, retention_batches=None),
        checkpoint=os.path.join(base_dir, "ckpt_a"),
        mode="append",
    )
    q.awaitTermination()

    _compact_state(spark, state_a, state_b, schema=state_schema)

    _write_id_ordered_arrivals(os.path.join(base_dir, "arr_b"), parts[2:])
    q = foreach_batch_sink(
        _arrivals_stream(spark, os.path.join(base_dir, "arr_b")),
        make_handler(state_b, dec_b, retention_batches=None),
        checkpoint=os.path.join(base_dir, "ckpt_b"),
        mode="append",
    )
    q.awaitTermination()
    return dec_a, dec_b


@register("stream_dedup_store_compacted", STREAM_DEDUP_STORE_ORACLE)
def stream_dedup_store_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, status): the fp-store ingest with a COMPACTION in the
    middle — phases A/B decide against pre-/post-compaction state, and
    the combined decisions share the uninterrupted ingest's oracle, so
    the driver hash proves the collapsed store preserves every
    first-arrival-wins decision."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dec_a, dec_b = _compacted_two_phase_ingest(
        spark,
        "fpcompact_",
        _fp_store_seed(docs),
        _fp_arrival_parts(docs),
        _dedup_store_handler,
        state_schema=_FP_STORE_SCHEMA,
    )
    return (
        spark.read.parquet(dec_a)
        .unionByName(spark.read.parquet(dec_b))
        .select("doc_id", "status")
    )


@register("stream_minhash_catalog_compacted", STREAM_MH_CATALOG_ORACLE)
def stream_minhash_catalog_compacted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, n_prior_candidates): the band-catalog ingest compacted
    mid-lifecycle; shares the growing-catalog oracle, so the hash proves
    the collapsed catalog still bands every later arrival against every
    prior doc."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dec_a, dec_b = _compacted_two_phase_ingest(
        spark,
        "mhcompact_",
        _mh_catalog_seed(docs),
        _mh_arrival_parts(docs),
        _mh_catalog_handler,
        state_schema=_MH_CATALOG_SCHEMA,
    )
    return (
        spark.read.parquet(dec_a)
        .unionByName(spark.read.parquet(dec_b))
        .select("doc_id", "n_prior_candidates")
    )


# ---------------------------------------------------------------------------
# Store retention / TTL (r17): the last stage of the state lifecycle —
# birth (seed), growth (per-batch appends), housekeeping (compaction),
# and now EXPIRY. A TTL'd dedup store re-admits content after
# _FP_TTL_W batches of absence (the "re-crawl after N days is fresh
# again" policy); the decision read is partition-pruned on BOTH sides
# (batch_id in [current - W, current)), so the scan cost is bounded by
# the window, not the store's lifetime — retention is also what keeps
# the store FINITE at 100 TB without compaction heroics. A re-admitted
# fp appends under its new batch_id, restarting its lifetime; duplicate
# arrivals never refresh the TTL (novel-only appends, unchanged).
# Novelty is now RECURSIVE (novel at batch b depends on which earlier
# arrivals were novel inside their own windows), so the oracle unrolls
# the recursion over the FIXED 4 arrival batches (the _BPE_ROUNDS
# unrolling convention): nv0/nv1/nv2 are the per-batch append sets, and
# each batch's visible set is exactly the W preceding ones (the seed
# ages out after W batches like any other append — batch 2 is the first
# that cannot see it). The batch id of every arrival derives from the
# _id_range_parts boundaries (max odd id thirds), so the oracle replays
# the batch split itself. W is hard-coded at 2 in the unrolled CTEs —
# changing _FP_TTL_W means re-deriving them together.
# ---------------------------------------------------------------------------

_FP_TTL_W = 2

STREAM_DEDUP_STORE_RETENTION_ORACLE = f"""
    WITH newbatch AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + {_FP_PLANT_OFFSET} AS doc_id, text
        FROM documents WHERE doc_id % 6 = 0
    ),
    mx AS (SELECT max(doc_id) AS m FROM documents WHERE doc_id % 2 = 1),
    fb AS (
        SELECT doc_id, b, fp,
               row_number() OVER (PARTITION BY fp, b ORDER BY doc_id) AS rnb
        FROM (
            SELECT doc_id,
                   CASE WHEN doc_id >= {_FP_PLANT_OFFSET} THEN 3
                        WHEN doc_id <= (SELECT m // 3 FROM mx) THEN 0
                        WHEN doc_id <= (SELECT (2 * m) // 3 FROM mx) THEN 1
                        ELSE 2 END AS b,
                   {_LLM_FP_SQL.format(t='text')} AS fp
            FROM newbatch)
    ),
    seedf AS (SELECT DISTINCT {_LLM_FP_SQL.format(t='text')} AS fp
              FROM documents WHERE doc_id % 2 = 0),
    nv0 AS (SELECT fp FROM fb WHERE b = 0 AND rnb = 1
            AND fp NOT IN (SELECT fp FROM seedf)),
    nv1 AS (SELECT fp FROM fb WHERE b = 1 AND rnb = 1
            AND fp NOT IN (SELECT fp FROM seedf
                           UNION ALL SELECT fp FROM nv0)),
    nv2 AS (SELECT fp FROM fb WHERE b = 2 AND rnb = 1
            AND fp NOT IN (SELECT fp FROM nv0
                           UNION ALL SELECT fp FROM nv1))
    SELECT doc_id,
           CASE WHEN rnb > 1 THEN 'duplicate'
                WHEN b = 0 AND fp IN (SELECT fp FROM seedf)
                    THEN 'duplicate'
                WHEN b = 1 AND fp IN (SELECT fp FROM seedf
                                      UNION ALL SELECT fp FROM nv0)
                    THEN 'duplicate'
                WHEN b = 2 AND fp IN (SELECT fp FROM nv0
                                      UNION ALL SELECT fp FROM nv1)
                    THEN 'duplicate'
                WHEN b = 3 AND fp IN (SELECT fp FROM nv1
                                      UNION ALL SELECT fp FROM nv2)
                    THEN 'duplicate'
                ELSE 'novel' END AS status
    FROM fb
    """


@register("stream_dedup_store_retention", STREAM_DEDUP_STORE_RETENTION_ORACLE)
def stream_dedup_store_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, status): the fp-store ingest under a _FP_TTL_W(=2)-batch
    retention window — identical setup and arrival order to
    stream_dedup_store_ingest, but each batch decides against only the
    last W batches' appends, so the +plant re-crawls of seeded content
    arriving after the seed aged out read 'novel' where the unbounded
    store reads 'duplicate' (expiry pinned by
    test_dedup_store_retention_expires_and_readmits)."""
    from ..streaming.sinks import foreach_batch_sink

    base_dir, store_dir, decisions_dir, arriving = _fp_store_setup(
        spark, sf_dir, "fpttl_"
    )
    q = foreach_batch_sink(
        arriving,
        _dedup_store_handler(
            store_dir, decisions_dir, retention_batches=_FP_TTL_W
        ),
        checkpoint=os.path.join(base_dir, "ckpt"),
        mode="append",
    )
    q.awaitTermination()
    return spark.read.parquet(decisions_dir).select("doc_id", "status")


# The band catalog's TTL twin. Unlike the fp store, catalog retention is
# NOT recursive — every ingested doc's band rows append regardless of
# status — so a row is visible at batch b iff its own batch is in
# [b - W, b - 1] (the seed, batch -1, ages out at b = W), and the oracle
# is a batch-windowed variant of STREAM_MH_CATALOG_ORACLE: one bmap CTE
# derives every corpus doc's batch id (seed -1, arrival thirds, plants
# 3), and the prior rule adds the window bound.
_MH_TTL_W = 2

STREAM_MH_CATALOG_RETENTION_ORACLE = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_MH_PLANT_OFFSET} AS doc_id,
               substring(text, 1, CAST(floor(4*length(text)/5.0) AS INT))
                   AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    {_MH_SHINGLES_CTE.strip()},
    hashed AS (SELECT doc_id, {_MH_BASE_H} AS h FROM sh),
    sig AS (
        SELECT doc_id,
           {_MH_SIG_MINS}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
    {_MH_BAND_SELECTS}
    ),
    mx AS (SELECT max(doc_id) AS m FROM documents WHERE doc_id % 2 = 1),
    bmap AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 AND doc_id < {_MH_PLANT_OFFSET}
                        THEN -1
                    WHEN doc_id >= {_MH_PLANT_OFFSET} THEN 3
                    WHEN doc_id <= (SELECT m // 3 FROM mx) THEN 0
                    WHEN doc_id <= (SELECT (2 * m) // 3 FROM mx) THEN 1
                    ELSE 2 END AS b
        FROM corpus
    ),
    arr AS (SELECT doc_id FROM corpus
            WHERE doc_id % 2 = 1 OR doc_id >= {_MH_PLANT_OFFSET}),
    hits AS (
        SELECT DISTINCT a.doc_id, p.doc_id AS prior_id
        FROM bands a
        JOIN bmap ba ON ba.doc_id = a.doc_id
        JOIN bands p
          ON a.band_id = p.band_id AND a.band_val = p.band_val
        JOIN bmap bp ON bp.doc_id = p.doc_id
        WHERE ba.b >= 0
          AND ((bp.b < ba.b AND bp.b >= ba.b - {_MH_TTL_W})
               OR (bp.b = ba.b AND p.doc_id < a.doc_id))
    )
    SELECT arr.doc_id,
           CAST(count(h.prior_id) AS BIGINT) AS n_prior_candidates
    FROM arr LEFT JOIN hits h ON arr.doc_id = h.doc_id
    GROUP BY arr.doc_id
    """


@register(
    "stream_minhash_catalog_retention", STREAM_MH_CATALOG_RETENTION_ORACLE
)
def stream_minhash_catalog_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, n_prior_candidates): the band-catalog ingest under a
    _MH_TTL_W(=2)-batch retention window — each batch probes only the
    last W batches' band rows (partition-pruned on both sides), so the
    seed ages out at batch W and the plants' truncated sources stop
    being counted once out of window (expiry pinned by
    test_minhash_catalog_retention_expires)."""
    return _mh_catalog_run(
        spark, sf_dir, "mhttl_", retention_batches=_MH_TTL_W
    )


# ---------------------------------------------------------------------------
# At-ingest IMAGE near-dup catalog (r17): the maintained-catalog upgrade
# of stream_image_phash, whose Hamming-band chunk catalog freezes at
# stream start — the same gap stream_minhash_catalog_ingest closed for
# text bands, now closed for the image modality, completing the
# maintenance matrix (exact fps / text bands / vectors / images). Each
# micro-batch renders its docs' synthetic covers through the REAL
# decode -> aHash stack (pandas UDFs work unchanged inside
# foreachBatch), probes catalog chunk partitions batch_id < current on
# (chunk_id, chunk_val) with the hamming <= 3 verify in codegen, counts
# same-batch smaller-id near-dups via a batch-bounded self-join, then
# appends its OWN chunk rows as a dynamic-overwrite partition. The
# pigeonhole completeness of the chunk equi-join (phash_chunks) makes
# the candidate set exact, so the oracle replays counts with the
# earlier-prior rule over one global nibs relation — batch-split-free.
# Plants: exact re-crawls of every 7th doc under +_IMG_PLANT_OFFSET —
# even sources are seed dups, ODD sources arrived in an earlier batch,
# so their copies are caught purely by appended partitions (the
# cross-batch catch; pinned by test_image_catalog_cross_batch_growth).
# Scale: per batch |batch| x 4 chunk rows against the chunk-keyed
# catalog read (UNHINTED — grows with the corpus) + the hamming verify
# on collisions only; appends never rewrite the catalog.
# ---------------------------------------------------------------------------

_IMG_PLANT_OFFSET = 200000  # the _exact_corpus re-crawl offset

STREAM_IMAGE_CATALOG_ORACLE = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_IMG_PLANT_OFFSET} AS doc_id, text
        FROM documents WHERE doc_id % 7 = 0
    ),
    {_PHASH_NIBS_CTE.strip()},
    arr AS (SELECT doc_id FROM corpus
            WHERE doc_id % 2 = 1 OR doc_id >= {_IMG_PLANT_OFFSET}),
    hits AS (
        SELECT DISTINCT a.doc_id, p.doc_id AS prior_id
        FROM nibs a JOIN nibs p
          ON (a.doc_id % 2 = 1 OR a.doc_id >= {_IMG_PLANT_OFFSET})
         AND ((p.doc_id % 2 = 0 AND p.doc_id < {_IMG_PLANT_OFFSET})
              OR ((p.doc_id % 2 = 1 OR p.doc_id >= {_IMG_PLANT_OFFSET})
                  AND p.doc_id < a.doc_id))
        WHERE CAST(list_sum(list_transform(range(1, 17),
                j -> bit_count(xor(a.nb[j], p.nb[j])))) AS INT) <= 3
    )
    SELECT arr.doc_id,
           CAST(count(h.prior_id) AS BIGINT) AS n_prior_candidates
    FROM arr LEFT JOIN hits h ON arr.doc_id = h.doc_id
    GROUP BY arr.doc_id
    """


def _image_chunk_rows(batch_df: DataFrame) -> DataFrame:
    """(doc_id, phash, chunk_id, chunk_val) for a micro-batch through the
    real synthesize -> decode -> aHash -> Hamming-band stack — the image
    twin of _batch_band_rows. Checkpointed: one derivation feeds the
    probe, the within-batch self-join AND the catalog append."""
    from ..operators.dedup import image_phash_fingerprints, phash_chunks
    from ..operators.multimodal import attach_synthetic_image

    return phash_chunks(
        image_phash_fingerprints(
            attach_synthetic_image(batch_df.select("doc_id", "text"))
        )
    ).localCheckpoint()


def _image_catalog_prior_hits(
    catalog_dir: str,
    chunks: DataFrame,
    batch_id: int,
    retention_batches: int | None = None,
) -> DataFrame:
    """(doc_id, prior_id) hamming<=3 image near-dups against every PRIOR
    ingested doc — the image twin of _catalog_prior_hits: chunk-keyed
    candidate equi-joins (pigeonhole-complete) + the hamming verify in
    codegen, over catalog partitions batch_id < current plus same-batch
    smaller ids. ``retention_batches`` EXPIRES old chunk rows exactly
    like the band catalog's window (non-recursive — every ingested doc's
    chunks append regardless of status, so a row is visible iff its
    batch is in [current - W, current)). May contain duplicates; callers
    distinct()."""
    from ..operators.dedup import phash_hamming

    prior = _read_state(
        chunks.sparkSession, catalog_dir, _IMG_CATALOG_SCHEMA
    ).filter(F.col("batch_id") < batch_id)
    if retention_batches is not None:
        prior = prior.filter(
            F.col("batch_id") >= batch_id - retention_batches
        )
    prior = (
        prior
        .select(
            "chunk_id",
            "chunk_val",
            F.col("doc_id").alias("prior_id"),
            F.col("phash").alias("p_phash"),
        )
    )
    hits_prior = (
        chunks.join(prior, ["chunk_id", "chunk_val"])
        .filter(phash_hamming(F.col("phash"), F.col("p_phash")) <= 3)
        .select("doc_id", "prior_id")
    )
    hits_within = (
        chunks.join(
            chunks.select(
                "chunk_id",
                "chunk_val",
                F.col("doc_id").alias("prior_id"),
                F.col("phash").alias("p_phash"),
            ),
            ["chunk_id", "chunk_val"],
        )
        .filter(
            (F.col("prior_id") < F.col("doc_id"))
            & (phash_hamming(F.col("phash"), F.col("p_phash")) <= 3)
        )
        .select("doc_id", "prior_id")
    )
    return hits_prior.unionByName(hits_within)


def _image_catalog_handler(
    catalog_dir: str,
    decisions_dir: str,
    retention_batches: int | None = None,
):
    """foreachBatch handler: fingerprint the batch's images, count
    DISTINCT prior near-dups (earlier partitions + same-batch smaller
    ids, hamming <= 3), append the batch's chunk rows. Both writes are
    dynamic-overwrite batch partitions — exactly-once on replay.
    ``retention_batches`` windows the probe to the last W batches'
    chunk rows (see _image_catalog_prior_hits); appends are unchanged."""

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        chunks = _image_chunk_rows(batch_df)
        hits = _image_catalog_prior_hits(
            catalog_dir, chunks, batch_id, retention_batches
        )
        counts = hits.distinct().groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        # Independent writes (own dirs) — overlap them (r19, guide §2.6).
        _run_jobs(
            lambda: _overwrite_batch_partition(
                batch_df.select("doc_id")
                .join(counts, "doc_id", "left_outer")
                .select(
                    "doc_id",
                    F.coalesce(F.col("n"), F.lit(0))
                    .cast("long")
                    .alias("n_prior_candidates"),
                ),
                decisions_dir,
                batch_id,
            ),
            lambda: _overwrite_batch_partition(chunks, catalog_dir, batch_id),
        )

    return handler


@register("stream_image_catalog_ingest", STREAM_IMAGE_CATALOG_ORACLE)
def stream_image_catalog_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_prior_candidates): per arriving doc, the number of
    DISTINCT previously-ingested docs whose cover image is a hamming<=3
    near-dup — detected against a catalog that GROWS at ingest, so a
    re-upload of an image that arrived two micro-batches ago is caught
    via the chunk rows that batch appended (stream_image_phash's frozen
    catalog cannot)."""
    from ..streaming.sinks import foreach_batch_sink

    from . import tmp_run_dir

    return _image_catalog_run(spark, sf_dir, "imgcat_")


def _image_catalog_run(
    spark: SparkSession,
    sf_dir: str,
    prefix: str,
    retention_batches: int | None = None,
) -> DataFrame:
    """Seed the chunk catalog, stream the id-ordered arrivals through the
    image-catalog handler, return the drained decisions — the one ingest
    body shared by the unbounded and TTL'd registrations (the
    _mh_catalog_run convention)."""
    from ..streaming.sinks import foreach_batch_sink

    from . import tmp_run_dir

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_dir = tmp_run_dir(prefix)
    catalog_dir = os.path.join(base_dir, "catalog")
    decisions_dir = os.path.join(base_dir, "decisions")
    src_dir = os.path.join(base_dir, "arrivals")

    # Seed and arrival writes are independent jobs — overlap (r19 §2.6).
    _run_jobs(
        lambda: _seed_state(_image_catalog_seed(docs), catalog_dir),
        lambda: _write_id_ordered_arrivals(
            src_dir, _image_arrival_parts(docs)
        ),
    )
    q = foreach_batch_sink(
        _arrivals_stream(spark, src_dir),
        _image_catalog_handler(catalog_dir, decisions_dir, retention_batches),
        checkpoint=os.path.join(base_dir, "ckpt"),
        mode="append",
    )
    q.awaitTermination()
    return spark.read.parquet(decisions_dir).select(
        "doc_id", "n_prior_candidates"
    )


def _image_catalog_seed(docs: DataFrame) -> DataFrame:
    """The seeded catalog's chunk rows: even doc ids BELOW the plant
    range (r17 ADVICE: the oracle's seed branch is doc_id % 2 = 0 AND
    doc_id < _IMG_PLANT_OFFSET, and _id_range_parts' guard only checks
    the max ODD id — mirror _mh_catalog_seed's bound so a corpus whose
    even ids reach the plant range cannot diverge from the oracle)."""
    return _image_chunk_rows(
        docs.filter(
            (F.col("doc_id") % 2 == 0)
            & (F.col("doc_id") < _IMG_PLANT_OFFSET)
        )
    )


def _image_arrival_parts(docs: DataFrame) -> list:
    """The image-catalog-ingest arrival files: odd ids in 3 id ranges +
    the +_IMG_PLANT_OFFSET exact re-crawls of every 7th doc."""
    plants = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + _IMG_PLANT_OFFSET).alias("doc_id"), "text"
    )
    odds = docs.filter(F.col("doc_id") % 2 == 1)
    return _id_range_parts(odds, plants, plant_offset=_IMG_PLANT_OFFSET)


# ---------------------------------------------------------------------------
# Image-catalog lifecycle symmetry (r18, r17 VERDICT task 5): the text
# band catalog and the fp store each have a compaction arm AND a TTL arm
# (r17); the image chunk catalog had neither. Both transfer verbatim:
# chunk-row appends are per-doc-unique, so _compact_state's novel-only
# premise holds and the compacted twin registers against
# STREAM_IMAGE_CATALOG_ORACLE unchanged (the hash IS the compaction-
# safety proof); catalog visibility is non-recursive (every ingested
# doc's chunks append regardless of status), so the TTL oracle is the
# windowed bmap variant of the ingest oracle — the exact template
# STREAM_MH_CATALOG_RETENTION_ORACLE established, with the band-equality
# join swapped for the hamming<=3 nibble verify.
# ---------------------------------------------------------------------------


@register("stream_image_catalog_compacted", STREAM_IMAGE_CATALOG_ORACLE)
def stream_image_catalog_compacted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, n_prior_candidates): the image chunk-catalog ingest
    compacted mid-lifecycle via the shared two-phase body; shares the
    growing-catalog oracle, so the driver hash proves the collapsed
    catalog still pairs every later arrival's cover against every prior
    doc's."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dec_a, dec_b = _compacted_two_phase_ingest(
        spark,
        "imgcompact_",
        _image_catalog_seed(docs),
        _image_arrival_parts(docs),
        _image_catalog_handler,
        state_schema=_IMG_CATALOG_SCHEMA,
    )
    return (
        spark.read.parquet(dec_a)
        .unionByName(spark.read.parquet(dec_b))
        .select("doc_id", "n_prior_candidates")
    )


_IMG_TTL_W = 2

STREAM_IMAGE_CATALOG_RETENTION_ORACLE = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_IMG_PLANT_OFFSET} AS doc_id, text
        FROM documents WHERE doc_id % 7 = 0
    ),
    {_PHASH_NIBS_CTE.strip()},
    mx AS (SELECT max(doc_id) AS m FROM documents WHERE doc_id % 2 = 1),
    bmap AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 AND doc_id < {_IMG_PLANT_OFFSET}
                        THEN -1
                    WHEN doc_id >= {_IMG_PLANT_OFFSET} THEN 3
                    WHEN doc_id <= (SELECT m // 3 FROM mx) THEN 0
                    WHEN doc_id <= (SELECT (2 * m) // 3 FROM mx) THEN 1
                    ELSE 2 END AS b
        FROM corpus
    ),
    arr AS (SELECT doc_id FROM corpus
            WHERE doc_id % 2 = 1 OR doc_id >= {_IMG_PLANT_OFFSET}),
    hits AS (
        SELECT DISTINCT a.doc_id, p.doc_id AS prior_id
        FROM nibs a
        JOIN bmap ba ON ba.doc_id = a.doc_id
        JOIN nibs p ON TRUE
        JOIN bmap bp ON bp.doc_id = p.doc_id
        WHERE ba.b >= 0
          AND ((bp.b < ba.b AND bp.b >= ba.b - {_IMG_TTL_W})
               OR (bp.b = ba.b AND p.doc_id < a.doc_id))
          AND CAST(list_sum(list_transform(range(1, 17),
                j -> bit_count(xor(a.nb[j], p.nb[j])))) AS INT) <= 3
    )
    SELECT arr.doc_id,
           CAST(count(h.prior_id) AS BIGINT) AS n_prior_candidates
    FROM arr LEFT JOIN hits h ON arr.doc_id = h.doc_id
    GROUP BY arr.doc_id
    """


@register(
    "stream_image_catalog_retention", STREAM_IMAGE_CATALOG_RETENTION_ORACLE
)
def stream_image_catalog_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, n_prior_candidates): the image chunk-catalog ingest under
    a _IMG_TTL_W(=2)-batch retention window — each batch probes only the
    last W batches' chunk rows (partition-pruned on both sides), so the
    seed ages out at batch W and the +plant re-crawls of seeded (even)
    covers stop being counted once the seed is out of window (expiry
    pinned by test_image_catalog_retention_expires)."""
    return _image_catalog_run(
        spark, sf_dir, "imgttl_", retention_batches=_IMG_TTL_W
    )


# ---------------------------------------------------------------------------
# At-ingest embedding near-dup catalog (r18): the EMBEDDING modality's
# dedup-maintenance arm, completing the matrix's vector row as a true
# dedup arm (the IVF appendix is the SERVING arm). Each micro-batch's
# vectors hyperplane-band-code (dedup_embedding_cosine's fixed
# bands/bits/seed constants — FIXED hyperplanes, so codes never depend
# on corpus growth), probe the code catalog's partitions batch_id <
# current on (band_id, code), cosine-verify collisions via the
# Arrow-batched numpy kernel (round-4, the embedding_near_pairs
# contract) against the vector store, then append their own code rows
# AND vectors as dynamic-overwrite batch partitions. Two state
# relations (codes + vectors, the incremental-cluster-map convention)
# so the catalog stays bands-wide while each vector is stored once.
# Candidates are band collisions; exact copies hash identically in
# every band (structurally impossible to miss) and a pair at cos=0.99
# survives >= 1 of 16 bands with prob 1-3e-9 — so the all-pairs
# earlier-prior oracle stays the checker, exactly as it does for
# dedup_embedding_cosine. Plants = exact re-crawls of every 5th vector
# (+_EMBCAT_OFF): even sources dup the SEED, odd sources arrived in an
# earlier micro-batch — the cross-batch catch
# (test_embedding_catalog_cross_batch_growth pins growth + replay).
# Scale: per batch one band-keyed catalog join + one id-keyed vector
# fetch (both UNHINTED — state grows with the corpus), verify only on
# collisions (~n/2^bits bucket occupancy), appends |batch| x bands code
# rows + |batch| vectors, never a state rewrite.
# ---------------------------------------------------------------------------

_EMBCAT_OFF = 100000

STREAM_EMB_CATALOG_ORACLE = f"""
    WITH vcorpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        UNION ALL
        SELECT vec_id + {_EMBCAT_OFF}, CAST(embedding AS DOUBLE[])
        FROM embeddings WHERE vec_id % 5 = 0
    ),
    arr AS (SELECT vec_id, v FROM vcorpus
            WHERE vec_id % 2 = 1 OR vec_id >= {_EMBCAT_OFF}),
    hits AS (
        SELECT a.vec_id, p.vec_id AS prior_id
        FROM arr a JOIN vcorpus p
          ON ((p.vec_id % 2 = 0 AND p.vec_id < {_EMBCAT_OFF})
              OR ((p.vec_id % 2 = 1 OR p.vec_id >= {_EMBCAT_OFF})
                  AND p.vec_id < a.vec_id))
        WHERE round({{dot}} / ({{na}} * {{np}}), 4) >= 0.99
    )
    SELECT arr.vec_id,
           CAST(count(h.prior_id) AS BIGINT) AS n_prior_neardups
    FROM arr LEFT JOIN hits h ON arr.vec_id = h.vec_id
    GROUP BY arr.vec_id
    """.format(
    # Rendered from llm's _DOT/_NORM templates (r18 ADVICE) so this text
    # can never silently diverge from dedup_embedding_cosine's 0.99 rule.
    dot=_DOT.format(a="a.v", b="p.v"),
    na=_NORM.format(a="a.v"),
    np=_NORM.format(a="p.v"),
)


def _emb_prior_relations(
    spark: SparkSession,
    codes_dir: str,
    vecs_dir: str,
    batch_id: int,
    retention_batches: int | None,
) -> tuple[DataFrame, DataFrame]:
    """The (prior code rows, prior vectors) visible to a batch: both
    bounded batch_id < current, both windowed to [current - W, current)
    under retention — the bounds reach BOTH scans as partition filters
    (pinned by test_ttl_embedding_catalog_read_pruned_both_sides)."""
    prior_codes = _read_state(spark, codes_dir, _EMB_CODES_SCHEMA).filter(
        F.col("batch_id") < batch_id
    )
    prior_store = _read_state(spark, vecs_dir, _EMB_VECS_SCHEMA).filter(
        F.col("batch_id") < batch_id
    )
    if retention_batches is not None:
        prior_codes = prior_codes.filter(
            F.col("batch_id") >= batch_id - retention_batches
        )
        prior_store = prior_store.filter(
            F.col("batch_id") >= batch_id - retention_batches
        )
    return prior_codes, prior_store


def _emb_code_rows(batch_df: DataFrame) -> DataFrame:
    """(doc_id, band_id, code) hyperplane-LSH band codes for a
    micro-batch's vectors — the embedding twin of _batch_band_rows,
    sharing embedding_near_pairs' fixed family constants (its
    bands/bits/seed DEFAULTS). Checkpointed: one pandas-UDF derivation
    feeds the probe, the within-batch self-join AND the catalog
    append."""
    from ..operators.dedup import hyperplane_band_codes

    return (
        batch_df.select(
            "doc_id",
            hyperplane_band_codes("embedding").alias("_codes"),
        )
        .select("doc_id", F.posexplode("_codes").alias("band_id", "code"))
        .localCheckpoint()
    )


def _embedding_catalog_handler(
    codes_dir: str,
    vecs_dir: str,
    decisions_dir: str,
    retention_batches: int | None = None,
):
    """foreachBatch handler: band-code the batch's vectors, collect
    candidate (doc_id, prior_id) band collisions (earlier partitions +
    same-batch smaller ids), cosine-verify them round-4 against the
    vector store, count DISTINCT verified priors, append the batch's
    code rows and vectors. All writes dynamic-overwrite batch
    partitions — exactly-once on replay; reads bounded batch_id <
    current. ``retention_batches`` windows BOTH state reads to the last
    W batches (non-recursive — every vector's rows always append, so a
    row is visible iff its batch is in [current - W, current))."""
    from ..functions.vectors import cosine_pandas

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.localCheckpoint()
        codes = _emb_code_rows(batch)
        cand = (
            codes.join(
                codes.select(
                    "band_id", "code", F.col("doc_id").alias("prior_id")
                ),
                ["band_id", "code"],
            )
            .filter(F.col("prior_id") < F.col("doc_id"))
            .select("doc_id", "prior_id")
        )
        prior_vecs = batch.select(
            F.col("doc_id").alias("prior_id"),
            F.col("embedding").alias("pv"),
        )
        if os.path.isdir(codes_dir) != os.path.isdir(vecs_dir):
            # fail fast on a half-seeded state pair (r18 ADVICE) instead
            # of an opaque mid-stream AnalysisException on the lone read
            raise RuntimeError(
                "_embedding_catalog_handler: state dirs out of sync — "
                f"codes={os.path.isdir(codes_dir)} "
                f"vectors={os.path.isdir(vecs_dir)}"
            )
        if os.path.isdir(codes_dir):  # absent only before batch 0
            prior_codes, prior_store = _emb_prior_relations(
                spark, codes_dir, vecs_dir, batch_id, retention_batches
            )
            cand = cand.unionByName(
                codes.join(
                    prior_codes.select(
                        "band_id", "code", F.col("doc_id").alias("prior_id")
                    ),
                    ["band_id", "code"],
                ).select("doc_id", "prior_id")
            )
            prior_vecs = prior_vecs.unionByName(
                prior_store.select(
                    F.col("doc_id").alias("prior_id"),
                    F.col("embedding").alias("pv"),
                )
            )
        hits = (
            cand.distinct()
            .join(
                batch.select("doc_id", F.col("embedding").alias("av")),
                "doc_id",
            )
            .join(prior_vecs, "prior_id")
            .filter(F.round(cosine_pandas("av", "pv"), 4) >= 0.99)
            .select("doc_id", "prior_id")
        )
        counts = hits.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        # Independent writes (own dirs) — overlap them (r19, guide §2.6).
        _run_jobs(
            lambda: _overwrite_batch_partition(
                batch.select("doc_id")
                .join(counts, "doc_id", "left_outer")
                .select(
                    "doc_id",
                    F.coalesce(F.col("n"), F.lit(0))
                    .cast("long")
                    .alias("n_prior_neardups"),
                ),
                decisions_dir,
                batch_id,
            ),
            lambda: _overwrite_batch_partition(codes, codes_dir, batch_id),
            lambda: _overwrite_batch_partition(
                batch.select("doc_id", "embedding"), vecs_dir, batch_id
            ),
        )

    return handler


_EMB_ARRIVAL_SCHEMA = "doc_id long, embedding array<float>"


@register("stream_embedding_catalog_ingest", STREAM_EMB_CATALOG_ORACLE)
def stream_embedding_catalog_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(vec_id, n_prior_neardups): each arriving vector's count of
    cosine>=0.99 near-dups among every PRIOR ingested vector — seeded
    evens (below the plant range) plus everything earlier micro-batches
    appended. The +_EMBCAT_OFF plants are exact re-crawls of every 5th
    vector: even sources dup the seed, ODD sources arrived earlier in
    the stream, so their copies are caught purely by appended
    partitions (the cross-batch catch)."""
    return _embedding_catalog_run(spark, sf_dir, "embcat_")


def _emb_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings relation with vec_id renamed to doc_id — the id
    column the shared id-ordered arrival plumbing keys on."""
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )


def _emb_catalog_seed(emb: DataFrame) -> DataFrame:
    """The seeded vectors: even ids BELOW the plant range (the
    _image_catalog_seed bound — the oracle's seed branch has it)."""
    return emb.filter(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") < _EMBCAT_OFF)
    )


def _emb_arrival_parts(emb: DataFrame) -> list:
    """The embedding-catalog arrival files: odd ids in 3 id ranges + the
    +_EMBCAT_OFF exact re-crawls of every 5th vector."""
    plants = emb.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + _EMBCAT_OFF).alias("doc_id"), "embedding"
    )
    odds = emb.filter(F.col("doc_id") % 2 == 1)
    return _id_range_parts(odds, plants, plant_offset=_EMBCAT_OFF)


def _embedding_catalog_run(
    spark: SparkSession,
    sf_dir: str,
    prefix: str,
    retention_batches: int | None = None,
) -> DataFrame:
    """Seed the code catalog + vector store, stream the id-ordered
    arrivals through the embedding-catalog handler, return the drained
    decisions — the one ingest body shared by the unbounded and TTL'd
    registrations (the _image_catalog_run convention)."""
    from ..streaming.sinks import foreach_batch_sink

    from . import tmp_run_dir

    emb = _emb_table(spark, sf_dir)
    base_dir = tmp_run_dir(prefix)
    codes_dir = os.path.join(base_dir, "codes")
    vecs_dir = os.path.join(base_dir, "vectors")
    decisions_dir = os.path.join(base_dir, "decisions")
    src_dir = os.path.join(base_dir, "arrivals")

    seed = _emb_catalog_seed(emb).localCheckpoint()
    # The two seed writes and the arrival write are independent jobs —
    # overlap (r19 §2.6). _emb_code_rows eagerly checkpoints its code
    # derivation before the pool, so the thunks only write.
    code_rows = _emb_code_rows(seed)
    _run_jobs(
        lambda: _seed_state(code_rows, codes_dir),
        lambda: _seed_state(seed.select("doc_id", "embedding"), vecs_dir),
        lambda: _write_id_ordered_arrivals(src_dir, _emb_arrival_parts(emb)),
    )
    q = foreach_batch_sink(
        _arrivals_stream(spark, src_dir, schema=_EMB_ARRIVAL_SCHEMA),
        _embedding_catalog_handler(
            codes_dir, vecs_dir, decisions_dir, retention_batches
        ),
        checkpoint=os.path.join(base_dir, "ckpt"),
        mode="append",
    )
    q.awaitTermination()
    return spark.read.parquet(decisions_dir).select(
        F.col("doc_id").alias("vec_id"), "n_prior_neardups"
    )


@register("stream_embedding_catalog_compacted", STREAM_EMB_CATALOG_ORACLE)
def stream_embedding_catalog_compacted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(vec_id, n_prior_neardups): the embedding-catalog ingest
    compacted mid-lifecycle — BOTH state relations (code rows and
    vectors; appends are per-vector-unique, so _compact_state's
    novel-only premise holds for each) collapse to one batch_id=-1
    partition between the two arrival phases. Registers against
    STREAM_EMB_CATALOG_ORACLE VERBATIM: the driver hash proves a
    phase-B copy of a phase-A vector is still counted through the
    collapse. Bespoke two-phase body (seedful but TWO-relation — the
    shared _compacted_two_phase_ingest seeds exactly one state dir),
    same phase structure as the cluster-map compaction."""
    from ..streaming.sinks import foreach_batch_sink

    from . import tmp_run_dir

    emb = _emb_table(spark, sf_dir)
    base_dir = tmp_run_dir("embcompact_")
    parts = _emb_arrival_parts(emb)
    dirs = {
        f"{kind}_{ph}": os.path.join(base_dir, f"{kind}_{ph}")
        for kind in ("codes", "vectors", "decisions")
        for ph in ("a", "b")
    }
    seed = _emb_catalog_seed(emb).localCheckpoint()
    _seed_state(_emb_code_rows(seed), dirs["codes_a"])
    _seed_state(seed.select("doc_id", "embedding"), dirs["vectors_a"])

    _write_id_ordered_arrivals(os.path.join(base_dir, "arr_a"), parts[:2])
    q = foreach_batch_sink(
        _arrivals_stream(
            spark, os.path.join(base_dir, "arr_a"), schema=_EMB_ARRIVAL_SCHEMA
        ),
        _embedding_catalog_handler(
            dirs["codes_a"], dirs["vectors_a"], dirs["decisions_a"],
            retention_batches=None,
        ),
        checkpoint=os.path.join(base_dir, "ckpt_a"),
        mode="append",
    )
    q.awaitTermination()

    # The two relations compact independently — overlap (r19 §2.6).
    _run_jobs(
        lambda: _compact_state(
            spark, dirs["codes_a"], dirs["codes_b"], schema=_EMB_CODES_SCHEMA
        ),
        lambda: _compact_state(
            spark, dirs["vectors_a"], dirs["vectors_b"],
            schema=_EMB_VECS_SCHEMA,
        ),
    )

    _write_id_ordered_arrivals(os.path.join(base_dir, "arr_b"), parts[2:])
    q = foreach_batch_sink(
        _arrivals_stream(
            spark, os.path.join(base_dir, "arr_b"), schema=_EMB_ARRIVAL_SCHEMA
        ),
        _embedding_catalog_handler(
            dirs["codes_b"], dirs["vectors_b"], dirs["decisions_b"],
            retention_batches=None,
        ),
        checkpoint=os.path.join(base_dir, "ckpt_b"),
        mode="append",
    )
    q.awaitTermination()
    return (
        spark.read.parquet(dirs["decisions_a"])
        .unionByName(spark.read.parquet(dirs["decisions_b"]))
        .select(F.col("doc_id").alias("vec_id"), "n_prior_neardups")
    )


_EMBCAT_TTL_W = 2

STREAM_EMB_CATALOG_RETENTION_ORACLE = f"""
    WITH vcorpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        UNION ALL
        SELECT vec_id + {_EMBCAT_OFF}, CAST(embedding AS DOUBLE[])
        FROM embeddings WHERE vec_id % 5 = 0
    ),
    mx AS (SELECT max(vec_id) AS m FROM embeddings WHERE vec_id % 2 = 1),
    bmap AS (
        SELECT vec_id,
               CASE WHEN vec_id % 2 = 0 AND vec_id < {_EMBCAT_OFF}
                        THEN -1
                    WHEN vec_id >= {_EMBCAT_OFF} THEN 3
                    WHEN vec_id <= (SELECT m // 3 FROM mx) THEN 0
                    WHEN vec_id <= (SELECT (2 * m) // 3 FROM mx) THEN 1
                    ELSE 2 END AS b
        FROM vcorpus
    ),
    arr AS (SELECT vec_id, v FROM vcorpus
            WHERE vec_id % 2 = 1 OR vec_id >= {_EMBCAT_OFF}),
    hits AS (
        SELECT a.vec_id, p.vec_id AS prior_id
        FROM arr a
        JOIN bmap ba ON ba.vec_id = a.vec_id
        JOIN vcorpus p ON TRUE
        JOIN bmap bp ON bp.vec_id = p.vec_id
        WHERE ((bp.b < ba.b AND bp.b >= ba.b - {_EMBCAT_TTL_W})
               OR (bp.b = ba.b AND p.vec_id < a.vec_id))
          AND round({{dot}} / ({{na}} * {{np}}), 4) >= 0.99
    )
    SELECT arr.vec_id,
           CAST(count(h.prior_id) AS BIGINT) AS n_prior_neardups
    FROM arr LEFT JOIN hits h ON arr.vec_id = h.vec_id
    GROUP BY arr.vec_id
    """.format(
    # Same _DOT/_NORM renders as STREAM_EMB_CATALOG_ORACLE (r18 ADVICE).
    dot=_DOT.format(a="a.v", b="p.v"),
    na=_NORM.format(a="a.v"),
    np=_NORM.format(a="p.v"),
)


@register(
    "stream_embedding_catalog_retention",
    STREAM_EMB_CATALOG_RETENTION_ORACLE,
)
def stream_embedding_catalog_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(vec_id, n_prior_neardups): the embedding-catalog ingest under a
    _EMBCAT_TTL_W(=2)-batch retention window — each batch probes only
    the last W batches' code rows + vectors (both reads
    partition-pruned on both sides), so the seed ages out at batch W
    and the +plant re-crawls of seeded (even) vectors stop being
    counted once the seed is out of window (expiry pinned by
    test_embedding_catalog_retention_expires)."""
    return _embedding_catalog_run(
        spark, sf_dir, "embttl_", retention_batches=_EMBCAT_TTL_W
    )


# ---------------------------------------------------------------------------
# At-ingest pretrain gate v2 (r17, r16 VERDICT task 4): the maintenance
# composition. stream_pretrain_gate (r10) probes state FROZEN at stream
# start — a duplicate of a doc that arrived two micro-batches ago sails
# through. v2 gates every arriving doc against MAINTAINED state: the
# exact-dup arm reads the fp store (per-batch novel-fp appends, the
# stream_dedup_store_ingest machinery), the near-dup arm the growing
# MinHash band catalog (per-batch band appends, the
# stream_minhash_catalog_ingest machinery), and the quality arm stays a
# stateless projection. Reason priority: exact_dup > near_dup >
# low_quality > ok. The plants exercise every path CROSS-BATCH:
#   +_GV2_SEED_OFF  exact re-crawls of seeded (even) docs  -> exact via seed
#   +_GV2_CROSS_OFF exact copies of EARLIER-ARRIVING odd docs -> exact via
#                   fps an earlier micro-batch APPENDED (the v1 gap)
#   +_GV2_NEAR_OFF  tail-truncated (4/5) re-uploads of earlier odd docs
#                   -> near-dup via band rows an earlier batch APPENDED
# Maintenance rules inherited verbatim: novel fps append per batch
# (first-arrival-wins), EVERY ingested doc's band rows join the catalog
# regardless of its own gate decision (a near-dup of a near-dup still
# bands with both), all reads bounded batch_id < current, all writes
# dynamic-overwrite partitions (replays overwrite themselves). Arrival
# order is id order by construction, so the oracle replays the whole
# lifecycle order-free: seed-store hit OR smaller-id same-fp arrival =
# exact; band share with seed OR any smaller-id arrival = near.
#
# Scale: per batch one fp-keyed store join + one band-keyed catalog join
# (both UNHINTED — state grows with the corpus) + a batch-bounded
# within-batch self-join; appends are |novel| + |batch| x bands rows,
# never a state rewrite. Cross-batch pin:
# tests/test_streaming.py::test_pretrain_gate_v2_cross_batch_state.
# ---------------------------------------------------------------------------

_GV2_SEED_OFF = 300000  # exact re-crawl of a seeded (even) doc
_GV2_CROSS_OFF = 500000  # exact copy of an earlier-arriving odd doc
_GV2_NEAR_OFF = 700000  # tail-truncated re-upload of an earlier odd doc
_GV3_IMG_OFF = 900000  # cover-stable tail-scramble of an earlier odd doc

PRETRAIN_GATE_V2_ORACLE = f"""
    WITH seed AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    arriving AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + {_GV2_SEED_OFF} AS doc_id, text
        FROM documents WHERE doc_id % 6 = 0
        UNION ALL
        SELECT doc_id + {_GV2_CROSS_OFF} AS doc_id, text
        FROM documents WHERE doc_id % 12 = 1
        UNION ALL
        SELECT doc_id + {_GV2_NEAR_OFF} AS doc_id,
               substring(text, 1, CAST(floor(4*length(text)/5.0) AS INT))
                   AS text
        FROM documents WHERE doc_id % 10 = 1
    ),
    sfp AS (SELECT DISTINCT {_LLM_FP_SQL.format(t='text')} AS fp FROM seed),
    ranked AS (
        SELECT doc_id, {_LLM_FP_SQL.format(t='text')} AS fp,
               row_number() OVER (
                   PARTITION BY {_LLM_FP_SQL.format(t='text')}
                   ORDER BY doc_id) AS rn
        FROM arriving
    ),
    corpus AS (
        SELECT doc_id, text FROM seed
        UNION ALL
        SELECT doc_id, text FROM arriving
    ),
    {_MH_SHINGLES_CTE.strip()},
    hashed AS (SELECT doc_id, {_MH_BASE_H} AS h FROM sh),
    sig AS (
        SELECT doc_id,
           {_MH_SIG_MINS}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
    {_MH_BAND_SELECTS}
    ),
    nearhits AS (
        SELECT DISTINCT a.doc_id
        FROM bands a JOIN bands p
          ON a.band_id = p.band_id AND a.band_val = p.band_val
        WHERE (a.doc_id % 2 = 1 OR a.doc_id >= {_GV2_SEED_OFF})
          AND ((p.doc_id % 2 = 0 AND p.doc_id < {_GV2_SEED_OFF})
               OR ((p.doc_id % 2 = 1 OR p.doc_id >= {_GV2_SEED_OFF})
                   AND p.doc_id < a.doc_id))
    ),
    {_quality_cte_sql('arriving').strip()}
    SELECT r.doc_id,
           CASE WHEN s.fp IS NOT NULL OR r.rn > 1 OR n.doc_id IS NOT NULL
                     OR q.quality_p < {_GATE_QUALITY_LT}
                THEN 'drop' ELSE 'keep' END AS decision,
           CASE WHEN s.fp IS NOT NULL OR r.rn > 1 THEN 'exact_dup'
                WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                WHEN q.quality_p < {_GATE_QUALITY_LT} THEN 'low_quality'
                ELSE 'ok' END AS reason
    FROM ranked r
    LEFT JOIN sfp s ON r.fp = s.fp
    LEFT JOIN nearhits n ON r.doc_id = n.doc_id
    JOIN quality q ON r.doc_id = q.doc_id
    """


def _gate_v2_handler(
    store_dir: str,
    catalog_dir: str,
    decisions_dir: str,
    image_catalog_dir: str | None = None,
):
    """foreachBatch handler composing the maintenance arms: decide
    (exact via fp store AS OF batch, near via band catalog AS OF batch,
    quality projection), then append novel fps AND the batch's band rows.
    All writes (decisions, store append, catalog appends) are
    dynamic-overwrite batch partitions. ``image_catalog_dir`` (r18, the
    r17 VERDICT task 4) composes the MAINTAINED image modality in: the
    batch's cover chunks probe the growing chunk catalog
    (_image_catalog_prior_hits, batch_id < current) and then append —
    the default None keeps the v2 twin's decisions byte-identical (the
    null img_hit column never matches a CASE arm)."""
    from ..functions.text import fingerprint
    from .textprep import quality_p_col

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        scored = batch_df.select(
            "doc_id",
            "text",
            fingerprint("text").alias("fp"),
            quality_p_col().alias("quality_p"),
        ).localCheckpoint()  # one derivation feeds all arms + all appends
        ranked = _fp_store_ranked(
            store_dir, scored.select("doc_id", "fp", "quality_p"), batch_id
        )
        # The band derivation and the cover-image chunk derivation are
        # independent eager materializations off the one checkpointed
        # scored relation — overlap them (r19, guide §2.6).
        derive = [lambda: _batch_band_rows(scored)]
        if image_catalog_dir is not None:
            derive.append(lambda: _image_chunk_rows(_gate_cover(scored)))
        derived = _run_jobs(*derive)
        bands = derived[0]
        near = (
            _catalog_prior_hits(catalog_dir, bands, batch_id)
            .select("doc_id")
            .distinct()
            .withColumn("near_hit", F.lit(True))
        )
        joined = ranked.join(near, "doc_id", "left_outer")
        if image_catalog_dir is not None:
            chunks = derived[1]
            imghit = (
                _image_catalog_prior_hits(
                    image_catalog_dir, chunks, batch_id
                )
                .select("doc_id")
                .distinct()
                .withColumn("img_hit", F.lit(True))
            )
            joined = joined.join(imghit, "doc_id", "left_outer")
        else:
            joined = joined.withColumn(
                "img_hit", F.lit(None).cast("boolean")
            )
        reason = (
            F.when(F.col("hit") | (F.col("rn") > 1), "exact_dup")
            .when(F.col("near_hit"), "near_dup")
            .when(F.col("img_hit"), "near_dup_image")
            .when(F.col("quality_p") < _GATE_QUALITY_LT, "low_quality")
            .otherwise("ok")
        )
        # All state writes are independent (own dirs, replay overwrites
        # per-partition) — overlap them (r19, guide §2.6): the decisions
        # write is the slow one (every probe arm in its lineage) and the
        # three appends backfill its tail.
        writes = [
            lambda: _overwrite_batch_partition(
                joined
                .select("doc_id", reason.alias("reason"))
                .select(
                    "doc_id",
                    F.when(F.col("reason") == "ok", "keep")
                    .otherwise("drop")
                    .alias("decision"),
                    "reason",
                ),
                decisions_dir,
                batch_id,
            ),
            lambda: _overwrite_batch_partition(
                ranked.filter(
                    F.col("hit").isNull() & (F.col("rn") == 1)
                ).select("fp"),
                store_dir,
                batch_id,
            ),
            lambda: _overwrite_batch_partition(bands, catalog_dir, batch_id),
        ]
        if image_catalog_dir is not None:
            writes.append(
                lambda: _overwrite_batch_partition(
                    chunks, image_catalog_dir, batch_id
                )
            )
        _run_jobs(*writes)

    return handler


@register("stream_pretrain_gate_v2", PRETRAIN_GATE_V2_ORACLE)
def stream_pretrain_gate_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, decision, reason) per arriving doc, gated against
    INGEST-MAINTAINED state: exact-dup via the per-batch-appended fp
    store, near-dup via the growing band catalog, low-quality via the
    stateless logistic score; first matching reason wins (exact_dup >
    near_dup > low_quality > ok). The +_GV2_CROSS_OFF / +_GV2_NEAR_OFF
    plants arrive in the LAST file and are caught purely by state earlier
    micro-batches appended — the freshness v1's frozen catalog lacks."""
    return _gate_maintained_run(spark, sf_dir, "gatev2_", image_arm=False)


def _gate_maintained_run(
    spark: SparkSession, sf_dir: str, prefix: str, image_arm: bool
) -> DataFrame:
    """Seed the maintained stores, write the plant-bearing id-ordered
    arrivals, stream them through the composed gate handler, return the
    drained decisions — the one run body shared by the v2 (text-only)
    and v3 (+maintained image catalog) gates (r18: factored so the image
    arm extends via the parameter, never a copy)."""
    from ..streaming.sinks import foreach_batch_sink

    from . import tmp_run_dir

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_dir = tmp_run_dir(prefix)
    store_dir = os.path.join(base_dir, "store")
    catalog_dir = os.path.join(base_dir, "catalog")
    decisions_dir = os.path.join(base_dir, "decisions")
    src_dir = os.path.join(base_dir, "arrivals")
    image_catalog_dir = (
        os.path.join(base_dir, "imgcatalog") if image_arm else None
    )

    # Seeds are the shared ingest-arm builders (the CLAUDE.md seed rule):
    # the fp seed is _fp_store_seed verbatim; _mh_catalog_seed's
    # < _MH_PLANT_OFFSET filter is vacuous here (the guard below bounds
    # every real id far under it), so the band seed is the plain evens
    # too; the image seed is the evens' COVER chunks (the v1 gate's
    # prefix-stable cover derivation over the maintained-catalog chunker).
    seed_writes = [
        lambda: _seed_state(_fp_store_seed(docs), store_dir),
        lambda: _seed_state(_mh_catalog_seed(docs), catalog_dir),
    ]
    if image_arm:
        seed_writes.append(
            lambda: _seed_state(
                _image_chunk_rows(
                    _gate_cover(docs.filter(F.col("doc_id") % 2 == 0))
                ),
                image_catalog_dir,
            )
        )

    # The plant families share one arrivals file, so their id ranges
    # must be DISJOINT (a collision would give two arrivals one doc_id —
    # the oracle's quality join would fan out where the handler emits
    # one row per physical arrival). Ranges stay disjoint iff every real
    # id is below the smallest inter-offset gap; _id_range_parts'
    # plant_offset guard only checks the odd max against _GV2_SEED_OFF,
    # so bound the FULL corpus here.
    offsets = [_GV2_SEED_OFF, _GV2_CROSS_OFF, _GV2_NEAR_OFF] + (
        [_GV3_IMG_OFF] if image_arm else []
    )
    m_all = docs.agg(F.max("doc_id")).first()[0]
    gap = min(
        b - a for a, b in zip([0] + offsets[:-1], offsets)
    )
    if m_all is None or m_all >= gap:
        raise ValueError(
            f"stream_pretrain_gate: max doc_id {m_all} >= plant-family "
            f"gap {gap}; the plant id ranges would overlap"
        )

    plants = (
        docs.filter(F.col("doc_id") % 6 == 0)
        .select((F.col("doc_id") + _GV2_SEED_OFF).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 12 == 1).select(
                (F.col("doc_id") + _GV2_CROSS_OFF).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 1).select(
                (F.col("doc_id") + _GV2_NEAR_OFF).alias("doc_id"),
                F.expr(
                    "substring(text, 1,"
                    " CAST(floor(4*length(text)/5.0) AS INT))"
                ).alias("text"),
            )
        )
    )
    if image_arm:
        # Cover-stable tail-scramble: same first _GATE_COVER_LEN chars
        # (identical cover image), texturally unrelated tail (reversed
        # chars -> different shingles, so the text bands miss w.h.p. and
        # the IMAGE arm is what catches it).
        plants = plants.unionByName(
            docs.filter(F.col("doc_id") % 8 == 1).select(
                (F.col("doc_id") + _GV3_IMG_OFF).alias("doc_id"),
                F.expr(
                    f"concat(substring(text, 1, {_GATE_COVER_LEN}),"
                    f" reverse(substring(text, {_GATE_COVER_LEN + 1})))"
                ).alias("text"),
            )
        )
    odds = docs.filter(F.col("doc_id") % 2 == 1)
    # Seeds and arrivals are independent jobs — overlap (r19 §2.6); the
    # guard above already raised before any of them starts.
    _run_jobs(
        *seed_writes,
        lambda: _write_id_ordered_arrivals(
            src_dir,
            _id_range_parts(odds, plants, plant_offset=_GV2_SEED_OFF),
        ),
    )

    q = foreach_batch_sink(
        _arrivals_stream(spark, src_dir),
        _gate_v2_handler(
            store_dir, catalog_dir, decisions_dir, image_catalog_dir
        ),
        checkpoint=os.path.join(base_dir, "ckpt"),
        mode="append",
    )
    q.awaitTermination()
    return spark.read.parquet(decisions_dir).select(
        "doc_id", "decision", "reason"
    )


# ---------------------------------------------------------------------------
# At-ingest pretrain gate v3 (r18, r17 VERDICT task 4): v2 + the
# MAINTAINED image modality. v1 gated near_dup_image against a chunk
# catalog FROZEN at stream start; v2 made the exact/near-text arms
# maintained but dropped the image arm entirely. v3 composes the r17
# image-catalog machinery in: every batch's cover images (the v1
# prefix-stable _gate_cover derivation — the cover renders from the
# first _GATE_COVER_LEN chars, so tail edits keep it identical) probe
# the chunk catalog AS OF the batch and then append their own chunk
# rows. Reason priority is v1's documented order with v2's arms:
# exact_dup > near_dup > near_dup_image > low_quality > ok. The fourth
# plant family (+_GV3_IMG_OFF, sources %8=1 — odd, so they ARRIVED in
# an earlier micro-batch rather than being seeded) keeps the first
# _GATE_COVER_LEN chars and REVERSES the tail: same cover image,
# texturally unrelated shingles — caught by chunk rows an earlier batch
# appended, through the image arm, not the text arms (the cross-batch
# image catch; pinned by test_pretrain_gate_v3_cross_batch_image).
# Oracle: v2's text verbatim in structure, plus the cover-corpus nibs
# chain (renamed via _rename_ctes so it coexists with the shingle
# corpus) and the earlier-prior image-hit rule.
# ---------------------------------------------------------------------------

from .llm import _rename_ctes  # noqa: E402

_GV3_NIBS_CTE = _rename_ctes(
    _PHASH_NIBS_CTE,
    {
        "corpus": "covers",
        "px": "gipx",
        "pixels": "gipixels",
        "stat": "gistat",
        "nibs": "ginibs",
    },
)

PRETRAIN_GATE_V3_ORACLE = f"""
    WITH seed AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    arriving AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + {_GV2_SEED_OFF} AS doc_id, text
        FROM documents WHERE doc_id % 6 = 0
        UNION ALL
        SELECT doc_id + {_GV2_CROSS_OFF} AS doc_id, text
        FROM documents WHERE doc_id % 12 = 1
        UNION ALL
        SELECT doc_id + {_GV2_NEAR_OFF} AS doc_id,
               substring(text, 1, CAST(floor(4*length(text)/5.0) AS INT))
                   AS text
        FROM documents WHERE doc_id % 10 = 1
        UNION ALL
        SELECT doc_id + {_GV3_IMG_OFF} AS doc_id,
               substring(text, 1, {_GATE_COVER_LEN}) ||
                   reverse(substring(text, {_GATE_COVER_LEN + 1})) AS text
        FROM documents WHERE doc_id % 8 = 1
    ),
    sfp AS (SELECT DISTINCT {_LLM_FP_SQL.format(t='text')} AS fp FROM seed),
    ranked AS (
        SELECT doc_id, {_LLM_FP_SQL.format(t='text')} AS fp,
               row_number() OVER (
                   PARTITION BY {_LLM_FP_SQL.format(t='text')}
                   ORDER BY doc_id) AS rn
        FROM arriving
    ),
    corpus AS (
        SELECT doc_id, text FROM seed
        UNION ALL
        SELECT doc_id, text FROM arriving
    ),
    {_MH_SHINGLES_CTE.strip()},
    hashed AS (SELECT doc_id, {_MH_BASE_H} AS h FROM sh),
    sig AS (
        SELECT doc_id,
           {_MH_SIG_MINS}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
    {_MH_BAND_SELECTS}
    ),
    nearhits AS (
        SELECT DISTINCT a.doc_id
        FROM bands a JOIN bands p
          ON a.band_id = p.band_id AND a.band_val = p.band_val
        WHERE (a.doc_id % 2 = 1 OR a.doc_id >= {_GV2_SEED_OFF})
          AND ((p.doc_id % 2 = 0 AND p.doc_id < {_GV2_SEED_OFF})
               OR ((p.doc_id % 2 = 1 OR p.doc_id >= {_GV2_SEED_OFF})
                   AND p.doc_id < a.doc_id))
    ),
    covers AS (
        SELECT doc_id, substring(text, 1, {_GATE_COVER_LEN}) AS text
        FROM corpus
    ),
    {_GV3_NIBS_CTE.strip()},
    imghits AS (
        SELECT DISTINCT a.doc_id
        FROM ginibs a JOIN ginibs p ON TRUE
        WHERE (a.doc_id % 2 = 1 OR a.doc_id >= {_GV2_SEED_OFF})
          AND ((p.doc_id % 2 = 0 AND p.doc_id < {_GV2_SEED_OFF})
               OR ((p.doc_id % 2 = 1 OR p.doc_id >= {_GV2_SEED_OFF})
                   AND p.doc_id < a.doc_id))
          AND CAST(list_sum(list_transform(range(1, 17),
                j -> bit_count(xor(a.nb[j], p.nb[j])))) AS INT) <= 3
    ),
    {_quality_cte_sql('arriving').strip()}
    SELECT r.doc_id,
           CASE WHEN s.fp IS NOT NULL OR r.rn > 1 OR n.doc_id IS NOT NULL
                     OR i.doc_id IS NOT NULL
                     OR q.quality_p < {_GATE_QUALITY_LT}
                THEN 'drop' ELSE 'keep' END AS decision,
           CASE WHEN s.fp IS NOT NULL OR r.rn > 1 THEN 'exact_dup'
                WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                WHEN i.doc_id IS NOT NULL THEN 'near_dup_image'
                WHEN q.quality_p < {_GATE_QUALITY_LT} THEN 'low_quality'
                ELSE 'ok' END AS reason
    FROM ranked r
    LEFT JOIN sfp s ON r.fp = s.fp
    LEFT JOIN nearhits n ON r.doc_id = n.doc_id
    LEFT JOIN imghits i ON r.doc_id = i.doc_id
    JOIN quality q ON r.doc_id = q.doc_id
    """


@register("stream_pretrain_gate_v3", PRETRAIN_GATE_V3_ORACLE)
def stream_pretrain_gate_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, decision, reason) per arriving doc, gated against
    INGEST-MAINTAINED state across ALL the arms: exact-dup via the fp
    store, near-dup via the text band catalog, near-dup-image via the
    growing cover chunk catalog, low-quality via the stateless score —
    reason priority exact_dup > near_dup > near_dup_image > low_quality
    > ok. The +_GV3_IMG_OFF cover-stable tail-scrambles of EARLIER-
    ARRIVING odd docs are caught purely by chunk rows previous
    micro-batches appended — the image freshness v1's frozen catalog and
    v2's missing image arm both lack."""
    return _gate_maintained_run(spark, sf_dir, "gatev3_", image_arm=True)


# ---------------------------------------------------------------------------
# Ingest-maintained cluster map for the near-dup split (r18, r17 VERDICT
# task 6). stream_split_by_neardup reads a rep-fp map MATERIALIZED from
# the last batch clustering run — between refreshes, a brand-new
# near-dup pair arriving at ingest still gates independently. This twin
# maintains the map AT ingest with a deterministic incremental
# clustering derived from the band catalog's earlier-prior rule: an
# arriving doc's PARENT is its earliest (min doc_id) band-sharing prior
# — seedless catalog partitions appended by earlier batches, or
# same-batch smaller ids — and the doc adopts its parent's cluster
# REPRESENTATIVE (else founds its own cluster as its own rep). Parent
# ids are strictly smaller than the doc's, so rep resolution follows a
# strictly-decreasing chain: prior-batch parents resolve through the
# maintained (doc_id, rep_id, rep_fp) map in one join; same-batch
# chains resolve in a bounded pointer-chasing loop (<= the batch's
# parent-chain depth iterations, each one equi-join round,
# localCheckpoint-truncated — the connected_components convergence
# idiom). The split gates on the representative's fingerprint, so a
# cluster formed ENTIRELY after stream start (both members arrived via
# the stream, in different micro-batches) still moves as one unit —
# the gap the batch-refresh twin has between refreshes.
#
# NOTE this is deliberately NOT connected components: parent edges form
# a forest keyed on the earliest-prior rule, and a doc with no smaller
# band-sharing neighbor founds its own cluster even if a LARGER
# neighbor later bridges it into another component (doc 3 banding with
# both 1 and 2 parents to 1; doc 2, banding with neither below it,
# stays its own rep). That is the honest at-ingest semantics — cluster
# membership is decided ONCE, at arrival, and never retroactively
# rewritten — and the oracle replays exactly it via the recursive
# parent-chain (root = min of the strictly-decreasing ancestor chain).
# Candidates are band collisions (no jaccard verify): the catalog
# stores band rows only, so the verify would need prior docs' shingle
# sets — the precision trade the n_prior_candidates arms already
# document.
#
# Scale: per batch one band-keyed catalog join + one doc-keyed map join
# (both UNHINTED — state grows with the corpus), the batch-bounded
# within-batch self-join, and |batch| + |batch| x bands appended rows;
# never a state rewrite. Arrival order is id order by construction
# (_id_range_parts), so the oracle is order-free.
# ---------------------------------------------------------------------------

from .llm import NEAR_CORPUS_CTE, near_plants  # noqa: E402
from .textprep import _splitc_case_sql  # noqa: E402

# The chain CTEs (corpus -> bands -> earliest-prior parents -> recursive
# ancestor chain -> roots -> fps) shared by the assignment oracle and the
# cluster-leakage audit oracle — one definition, so the replayed
# semantics cannot diverge between them.
_NDINC_CHAIN_CTES = f"""{NEAR_CORPUS_CTE.strip()},
    {_MH_SHINGLES_CTE.strip()},
    hashed AS (SELECT doc_id, {_MH_BASE_H} AS h FROM sh),
    sig AS (
        SELECT doc_id,
           {_MH_SIG_MINS}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
    {_MH_BAND_SELECTS}
    ),
    par AS (
        SELECT a.doc_id, min(p.doc_id) AS parent
        FROM bands a JOIN bands p
          ON a.band_id = p.band_id AND a.band_val = p.band_val
         AND p.doc_id < a.doc_id
        GROUP BY a.doc_id
    ),
    chain(doc_id, anc) AS (
        SELECT doc_id, parent FROM par
        UNION ALL
        SELECT c.doc_id, p.parent FROM chain c JOIN par p ON p.doc_id = c.anc
    ),
    root AS (SELECT doc_id, min(anc) AS rep_id FROM chain GROUP BY doc_id),
    fps AS (SELECT doc_id, {_LLM_FP_SQL.format(t='text')} AS fp FROM corpus)"""

SPLIT_BY_NEARDUP_INC_ORACLE = f"""
    WITH RECURSIVE {_NDINC_CHAIN_CTES}
    SELECT f.doc_id,
           {_splitc_case_sql('coalesce(rf.fp, f.fp)')} AS split
    FROM fps f
    LEFT JOIN root r ON f.doc_id = r.doc_id
    LEFT JOIN fps rf ON rf.doc_id = r.rep_id
    """


def _neardup_clustermap_handler(
    catalog_dir: str, map_dir: str, decisions_dir: str
):
    """foreachBatch handler maintaining the incremental cluster map:
    band the batch, pick each doc's earliest band-sharing prior as its
    parent, resolve representatives (map join for prior-batch parents;
    bounded pointer-chasing for same-batch chains), gate the split on
    the rep's fingerprint, then append the batch's map rows AND band
    rows. All three writes are dynamic-overwrite batch partitions —
    exactly-once on replay (reads bounded batch_id < current)."""
    from ..functions.text import fingerprint

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        scored = batch_df.select(
            "doc_id", "text", fingerprint("text").alias("fp")
        ).localCheckpoint()
        bands = _batch_band_rows(scored)
        if os.path.isdir(catalog_dir):  # absent only before batch 0
            hits = _catalog_prior_hits(catalog_dir, bands, batch_id)
        else:  # seedless first batch probes within itself alone
            hits = _within_batch_band_hits(bands)
        par = hits.groupBy("doc_id").agg(F.min("prior_id").alias("parent"))
        base = scored.select("doc_id", "fp").join(par, "doc_id", "left_outer")
        if os.path.isdir(map_dir):
            repmap = (
                _read_state(spark, map_dir, _CLUSTER_MAP_SCHEMA)
                .filter(F.col("batch_id") < batch_id)
                .select(
                    F.col("doc_id").alias("parent"), "rep_id", "rep_fp"
                )
            )
            base = base.join(repmap, "parent", "left_outer")
        else:
            base = base.withColumn(
                "rep_id", F.lit(None).cast("long")
            ).withColumn("rep_fp", F.lit(None).cast("string"))
        base = base.localCheckpoint()  # one derivation feeds both arms

        # Founding docs (no parent) rep themselves; prior-batch parents
        # carry their map row. Same-batch parents (rep still null) chase
        # the strictly-decreasing parent chain against the growing
        # resolved set — depth-bounded, so the loop terminates.
        # r19 loop shape: ONE eager materialization per hop — a single
        # left-outer pass splits the pending set into rows whose ancestor
        # just resolved (rep_id non-null; resolved reps are always
        # non-null by construction) and rows that advance one hop
        # (par_b's inner/outer distinction is immaterial: every same-
        # batch ancestor is in base, and an unresolved ancestor always
        # has a parent, else it would be a founder and resolved).
        # resolved stays a LAZY union over checkpointed pieces, so the
        # old shape's two extra jobs per hop (pending checkpoint +
        # eager resolved-union checkpoint) are gone; results are
        # identical — the same (doc_id, rep) pairs resolve at the same
        # hop, only the materialization boundaries moved.
        resolved = base.filter(
            F.col("parent").isNull() | F.col("rep_id").isNotNull()
        ).select(
            "doc_id",
            F.coalesce(F.col("rep_id"), F.col("doc_id")).alias("rep_id"),
            F.coalesce(F.col("rep_fp"), F.col("fp")).alias("rep_fp"),
        )
        pending = base.filter(
            F.col("parent").isNotNull() & F.col("rep_id").isNull()
        ).select("doc_id", F.col("parent").alias("anc"))
        par_b = base.select(
            F.col("doc_id").alias("anc"), F.col("parent").alias("anc2")
        )
        for _ in range(1000):  # anti-hang bound far above any real depth
            if pending.isEmpty():
                break
            res_anc = resolved.select(
                F.col("doc_id").alias("anc"), "rep_id", "rep_fp"
            )
            step = (
                pending.join(res_anc, "anc", "left_outer")
                .join(par_b, "anc", "left_outer")
                .select("doc_id", "rep_id", "rep_fp", "anc2")
                .localCheckpoint()
            )
            resolved = resolved.unionByName(
                step.filter(F.col("rep_id").isNotNull()).select(
                    "doc_id", "rep_id", "rep_fp"
                )
            )
            pending = step.filter(F.col("rep_id").isNull()).select(
                "doc_id", F.col("anc2").alias("anc")
            )
        else:
            raise RuntimeError(
                "_neardup_clustermap_handler: parent chain did not "
                "resolve — strictly-decreasing ids make this unreachable"
            )

        # Independent writes (own dirs) — overlap them (r19, guide §2.6).
        _run_jobs(
            lambda: _overwrite_batch_partition(
                resolved.select(
                    "doc_id",
                    cluster_split_column(F.col("rep_fp")).alias("split"),
                ),
                decisions_dir,
                batch_id,
            ),
            lambda: _overwrite_batch_partition(
                resolved.select("doc_id", "rep_id", "rep_fp"),
                map_dir,
                batch_id,
            ),
            lambda: _overwrite_batch_partition(bands, catalog_dir, batch_id),
        )

    return handler


@register("stream_split_by_neardup_incremental", SPLIT_BY_NEARDUP_INC_ORACLE)
def stream_split_by_neardup_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, split) per arriving doc under the INGEST-MAINTAINED
    cluster map: every doc (the whole corpus plus the near_plants
    re-crawls stream in — no frozen clustering run) adopts its earliest
    band-sharing prior's cluster representative and gates on the rep's
    fingerprint, so a near-dup pair whose members BOTH arrive after
    stream start, in different micro-batches, still lands in one split
    (pinned by test_stream_split_by_neardup_incremental_cross_batch)."""
    decisions_dir, _map_dir = _ndinc_run(spark, sf_dir, "ndinc_")
    return spark.read.parquet(decisions_dir).select("doc_id", "split")


def _ndinc_run(
    spark: SparkSession, sf_dir: str, prefix: str
) -> tuple[str, str]:
    """Stream the near corpus (id-ordered) through the cluster-map
    handler; return (decisions_dir, map_dir) — the one ingest body
    shared by the assignment registration and the leakage audit."""
    from ..streaming.sinks import foreach_batch_sink

    from . import tmp_run_dir

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_dir = tmp_run_dir(prefix)
    catalog_dir = os.path.join(base_dir, "catalog")
    map_dir = os.path.join(base_dir, "clustermap")
    decisions_dir = os.path.join(base_dir, "decisions")
    src_dir = os.path.join(base_dir, "arrivals")

    _write_id_ordered_arrivals(
        src_dir,
        _id_range_parts(docs, near_plants(docs), plant_offset=100000),
    )
    q = foreach_batch_sink(
        _arrivals_stream(spark, src_dir),
        _neardup_clustermap_handler(catalog_dir, map_dir, decisions_dir),
        checkpoint=os.path.join(base_dir, "ckpt"),
        mode="append",
    )
    q.awaitTermination()
    return decisions_dir, map_dir


@register(
    "stream_split_by_neardup_inc_audit",
    f"""
    WITH RECURSIVE {_NDINC_CHAIN_CTES},
    sp AS (
        SELECT f.doc_id,
               {_splitc_case_sql('coalesce(rf.fp, f.fp)')} AS split,
               coalesce(r.rep_id, f.doc_id) AS cluster_id
        FROM fps f
        LEFT JOIN root r ON f.doc_id = r.doc_id
        LEFT JOIN fps rf ON rf.doc_id = r.rep_id
    ),
    tc AS (SELECT DISTINCT cluster_id FROM sp WHERE split = 'train'),
    ev AS (SELECT sp.split, (t.cluster_id IS NOT NULL) AS leaked
           FROM sp LEFT JOIN tc t ON sp.cluster_id = t.cluster_id
           WHERE sp.split <> 'train')
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN leaked THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cluster_leaked,
           round(sum(CASE WHEN leaked THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS cluster_leak_rate
    FROM ev GROUP BY split
    """,
)
def stream_split_by_neardup_inc_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cluster-level leakage audit over the INGEST-MAINTAINED split
    (leaked = an eval doc sharing an incremental cluster with any train
    doc): exactly 0 on every eval split BY CONSTRUCTION — every member
    of a cluster gates on the representative's fingerprint, so a
    cluster is always wholly inside one split — and the driver hash
    proves it against the recursive-chain oracle's replay. The cluster
    key is the maintained map's rep_id (founders rep themselves), the
    split_by_neardup_cluster_audit convention over at-ingest state."""
    decisions_dir, map_dir = _ndinc_run(spark, sf_dir, "ndincaudit_")
    sp = (
        spark.read.parquet(decisions_dir)
        .select("doc_id", "split")
        .join(
            spark.read.parquet(map_dir).select(
                "doc_id", F.col("rep_id").alias("cluster_id")
            ),
            "doc_id",
        )
        .localCheckpoint(eager=False)  # feeds train-cluster set + eval side
    )
    tc = (
        sp.filter(F.col("split") == "train")
        .select("cluster_id")
        .distinct()
    )
    ev = sp.filter(F.col("split") != "train").join(
        tc.withColumn("leaked", F.lit(True)), "cluster_id", "left_outer"
    )
    return ev.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("leaked"), 1).otherwise(0)).alias(
            "n_cluster_leaked"
        ),
        F.round(
            F.sum(F.when(F.col("leaked"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("cluster_leak_rate"),
    )


@register(
    "stream_split_by_neardup_inc_compacted", SPLIT_BY_NEARDUP_INC_ORACLE
)
def stream_split_by_neardup_inc_compacted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, split): the incremental cluster-map ingest compacted
    mid-lifecycle — BOTH state relations (band catalog and rep map;
    appends are per-doc-unique, so _compact_state's novel-only premise
    holds for each) collapse to one batch_id=-1 partition between the
    two arrival phases. Registers against SPLIT_BY_NEARDUP_INC_ORACLE
    VERBATIM: the driver hash proves a phase-B arrival still adopts a
    phase-A rep through the collapse. Bespoke two-phase body rather
    than _compacted_two_phase_ingest because this state is SEEDLESS and
    two-relation (that body seeds exactly one state dir); the phase
    structure — ingest parts[:2], compact, ingest parts[2:] against the
    compacted dirs, union both decisions — is the same."""
    from ..streaming.sinks import foreach_batch_sink

    from . import tmp_run_dir

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_dir = tmp_run_dir("ndinccomp_")
    parts = _id_range_parts(docs, near_plants(docs), plant_offset=100000)

    dirs = {
        f"{kind}_{ph}": os.path.join(base_dir, f"{kind}_{ph}")
        for kind in ("catalog", "clustermap", "decisions")
        for ph in ("a", "b")
    }
    _write_id_ordered_arrivals(os.path.join(base_dir, "arr_a"), parts[:2])
    q = foreach_batch_sink(
        _arrivals_stream(spark, os.path.join(base_dir, "arr_a")),
        _neardup_clustermap_handler(
            dirs["catalog_a"], dirs["clustermap_a"], dirs["decisions_a"]
        ),
        checkpoint=os.path.join(base_dir, "ckpt_a"),
        mode="append",
    )
    q.awaitTermination()

    # The two relations compact independently — overlap (r19 §2.6).
    _run_jobs(
        lambda: _compact_state(
            spark, dirs["catalog_a"], dirs["catalog_b"],
            schema=_MH_CATALOG_SCHEMA,
        ),
        lambda: _compact_state(
            spark, dirs["clustermap_a"], dirs["clustermap_b"],
            schema=_CLUSTER_MAP_SCHEMA,
        ),
    )

    _write_id_ordered_arrivals(os.path.join(base_dir, "arr_b"), parts[2:])
    q = foreach_batch_sink(
        _arrivals_stream(spark, os.path.join(base_dir, "arr_b")),
        _neardup_clustermap_handler(
            dirs["catalog_b"], dirs["clustermap_b"], dirs["decisions_b"]
        ),
        checkpoint=os.path.join(base_dir, "ckpt_b"),
        mode="append",
    )
    q.awaitTermination()
    return (
        spark.read.parquet(dirs["decisions_a"])
        .unionByName(spark.read.parquet(dirs["decisions_b"]))
        .select("doc_id", "split")
    )


# ---------------------------------------------------------------------------
# Windowed streaming count-min (r11): heavy hitters PER TIME WINDOW — the
# frequency companion to stream_hll_windowed's windowed distinct count,
# completing the sketches-over-windows surface (count-min x windows,
# HLL x windows). ONE streaming query folds the d x w cell table keyed by
# (tumbling 1h window, j, bucket): complete-mode state is windows x 1024
# cells on the bounded drain, watermark-expired to ACTIVE windows x 1024
# in append-mode deployments. Scoring (exact per-window top-5 via a
# deterministic row_number tie-break, min-cell estimates, overcount >= 0
# one-sided error) runs batch-side on the drained cells. Unlike the
# global twin, the drained cell relation GROWS with retained windows —
# so the scoring join is UNHINTED (the FIXED-K rule: only constant-
# bounded sides get a broadcast hint; cms_score's 1024-cell broadcast is
# correct there, wrong here).
# ---------------------------------------------------------------------------

from .windows_stats import (  # noqa: E402
    _CMS_D,
    _cms_bucket_col,
    _cms_bucket_sql,
    _cms_js,
)

_CMS_WIN_TOPN = 5


def _cms_window_oracle(ev_cte: str) -> str:
    """ONE oracle generator for the windowed/sliding count-min twins (r12,
    the _hll_window_oracle convention): ``ev_cte`` must end by defining
    ev(window_start, window_end, user_id). The tumbling render is
    byte-identical to the r11 driver-green CMS_WINDOWED_ORACLE text."""
    return f"""
    WITH {ev_cte.strip()},
    js AS (SELECT unnest(range(0, {_CMS_D})) AS j),
    cells AS (
        SELECT window_start, window_end, j,
               {_cms_bucket_sql('user_id', 'j')} AS bucket,
               count(*) AS c
        FROM ev CROSS JOIN js
        GROUP BY 1, 2, 3, 4
    ),
    exact AS (SELECT window_start, window_end, user_id, count(*) AS n
              FROM ev GROUP BY 1, 2, 3),
    top AS (
        SELECT window_start, window_end, user_id, n FROM (
            SELECT *, row_number() OVER (PARTITION BY window_start
                          ORDER BY n DESC, user_id) AS rk
            FROM exact
        ) WHERE rk <= {_CMS_WIN_TOPN}
    ),
    cand AS (
        SELECT window_start, window_end, user_id, n, j,
               {_cms_bucket_sql('user_id', 'j')} AS bucket
        FROM top CROSS JOIN js
    ),
    scored AS (
        SELECT cand.window_start, cand.window_end, cand.user_id, cand.n,
               min(cells.c) AS est_n
        FROM cand JOIN cells
          ON cells.window_start = cand.window_start
         AND cells.window_end = cand.window_end
         AND cells.j = cand.j AND cells.bucket = cand.bucket
        GROUP BY 1, 2, 3, 4
    )
    SELECT window_start, window_end, user_id,
           CAST(n AS BIGINT) AS exact_n,
           CAST(est_n AS BIGINT) AS est_n,
           CAST(est_n - n AS BIGINT) AS overcount
    FROM scored
    """


_CMS_WIN_EV_CTE = """ev AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
                   AS window_end,
               user_id
        FROM events WHERE user_id IS NOT NULL
    )"""

CMS_WINDOWED_ORACLE = _cms_window_oracle(_CMS_WIN_EV_CTE)

_CMS_WIN_GCOLS = ("window_start", "window_end")


def _cms_windowed_query(
    spark: SparkSession, sf_dir: str, win: tuple, watermark: str
) -> DataFrame:
    """The windowed count-min query body, parametrized by the window spec
    (r12: factored from stream_countmin_windowed so the sliding twin
    extends via parameters — the hll fold convention). ``win`` is the
    F.window argument tail after "ts": ("1 hour",) tumbling or
    ("3 hours", "1 hour") sliding (batch F.window replicates panes the
    same way the streaming fold does, so both arms key identically)."""
    from pyspark.sql.window import Window as W

    ev = (
        events_stream(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("ts", "user_id")
    )
    folded = (
        ev.select("ts", "user_id", _cms_js())
        .select(
            "ts", "j",
            _cms_bucket_col(F.col("user_id"), F.col("j")).alias("bucket"),
        )
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", *win), "j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "j", "bucket", "c",
        )
    )
    ev_b = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(F.window("ts", *win).alias("window"), "user_id")
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "user_id",
        )
    )
    exact = ev_b.groupBy(*_CMS_WIN_GCOLS, "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    top = (
        exact.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("window_start")
                .orderBy(F.desc("n"), F.asc("user_id"))
            ),
        )
        .filter(F.col("rk") <= _CMS_WIN_TOPN)
        .drop("rk")
    )
    # r20 (guide §2.6 + §3.1): the exact/top batch arm is independent of
    # the drain — materialize it (eager localCheckpoint) IN PARALLEL with
    # the streaming drain instead of serially after it. The checkpoint
    # doubles as the r08 stats idiom: the planner now SEES top's true
    # (windows x top-N) size and picks broadcast-vs-shuffle for the cells
    # join itself (measured: the 562k-row sliding cells side stopped
    # being shuffled — SMJ -> stats-chosen BHJ — with no hint, so the
    # choice still degrades to shuffle when retained windows grow).
    cells, top = _run_jobs(
        lambda: run_to_table(spark, folded, "complete"),
        lambda: top.localCheckpoint(),
    )
    cand = top.select(*_CMS_WIN_GCOLS, "user_id", "n", _cms_js()).select(
        *_CMS_WIN_GCOLS, "user_id", "n", "j",
        _cms_bucket_col(F.col("user_id"), F.col("j")).alias("bucket"),
    )
    # UNHINTED: the drained cells grow with retained windows (never
    # constant-bounded), so the planner chooses from the memory table's
    # true stats — the stream-static-side rule applied batch-side.
    scored = cand.join(cells, [*_CMS_WIN_GCOLS, "j", "bucket"]).groupBy(
        *_CMS_WIN_GCOLS, "user_id", "n"
    ).agg(F.min("c").alias("est_n"))
    return scored.select(
        *_CMS_WIN_GCOLS, "user_id",
        F.col("n").cast("long").alias("exact_n"),
        F.col("est_n").cast("long").alias("est_n"),
        (F.col("est_n") - F.col("n")).cast("long").alias("overcount"),
    )


@register("stream_countmin_windowed", CMS_WINDOWED_ORACLE)
def stream_countmin_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cms_windowed_query(spark, sf_dir, ("1 hour",), "2 hours")


_CMS_SLIDE_EV_CTE = """ev0 AS (SELECT ts, user_id FROM events
            WHERE user_id IS NOT NULL),
    ev AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) - i.i * INTERVAL '1 hour'
                   AS window_start,
               time_bucket(INTERVAL '1 hour', ts) - i.i * INTERVAL '1 hour'
                   + INTERVAL '3 hours' AS window_end,
               user_id
        FROM ev0, range(3) i(i)
    )"""

CMS_SLIDING_ORACLE = _cms_window_oracle(_CMS_SLIDE_EV_CTE)


@register("stream_countmin_sliding", CMS_SLIDING_ORACLE)
def stream_countmin_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over a TRAILING 3-hour window sliding hourly — the
    frequency companion to stream_hll_sliding, completing tumbling +
    sliding symmetry for the count-min sketch (r12). Every event feeds 3
    hourly-spaced panes (the pinned sliding replay); state = panes x
    {_CMS_D} x {_CMS_W} cells in complete mode on the bounded drain,
    watermark-expired to ACTIVE panes in append deployments (the fold
    family's expiry contract). Scoring is the same per-window top-5 +
    min-cell estimate, over the pane-replicated exact arm."""
    return _cms_windowed_query(spark, sf_dir, ("3 hours", "1 hour"),
                               "4 hours")


# ---------------------------------------------------------------------------
# Windowed streaming quantile sketch (r12): per-hour value percentiles —
# the THIRD windowed sketch, completing the sketches-over-windows matrix
# (windowed HLL = distinct, windowed count-min = frequency, this =
# distribution; the Bloom filter has no windowed form — membership is not
# time-decomposable). The grid bounds stay the sketch's epoch
# CONFIGURATION (batch-computed 1-row relation, broadcast — the
# stream_quantile_values contract); each arriving value buckets map-side
# against that fixed GLOBAL grid and the fold keys by (tumbling 1h
# window, bucket) — complete-mode state = windows x <= _QSK_W cells on
# the bounded drain, watermark-expired to ACTIVE windows in append
# deployments (the bound test_windowed_sketch_watermark_expires_state
# pins for the fold family). A global grid is what makes per-window
# sketches MERGEABLE ACROSS WINDOWS too: any set of windows' cells sum
# into the coarser rollup with no re-bucketing. Scoring runs batch-side
# through the SAME group_cols-parametrized quantile_score (per-window
# target ranks come from n = sum(c) within the window — derivable from
# the sketch itself); per-window estimate/target relations GROW with
# retained windows, so those joins are UNHINTED (the FIXED-K rule).
# ---------------------------------------------------------------------------

from .windows_stats import _QSK_QS, _QSK_W, quantile_bucket_col  # noqa: E402


def _quantile_window_oracle(v_cte: str) -> str:
    """ONE oracle generator for the windowed/sliding quantile twins:
    ``v_cte`` must end by defining v(window_start, window_end, value).
    min/max are taken over v — pane replication leaves them unchanged, so
    both renders share the Spark side's global epoch bounds."""
    return f"""
    WITH {v_cte.strip()},
    b AS (SELECT min(value) AS mn, max(value) AS mx FROM v),
    cells AS (
        SELECT window_start, window_end,
               least(CAST(floor((value - mn) * {_QSK_W} / (mx - mn)) AS BIGINT),
                     {_QSK_W - 1}) AS bucket,
               count(*) AS c
        FROM v CROSS JOIN b GROUP BY 1, 2, 3
    ),
    wn AS (SELECT window_start, window_end, sum(c) AS n
           FROM cells GROUP BY 1, 2),
    cum AS (SELECT window_start, window_end, bucket,
                   sum(c) OVER (PARTITION BY window_start, window_end
                                ORDER BY bucket) AS cumc
            FROM cells),
    qs AS (SELECT unnest([{', '.join(str(q) for q in _QSK_QS)}]::DOUBLE[]) AS q),
    targets AS (SELECT window_start, window_end, q,
                       CAST(ceil(q * n) AS BIGINT) AS target_rank
                FROM wn CROSS JOIN qs),
    est AS (
        SELECT t.window_start, t.window_end, t.q, t.target_rank,
               mn + min(cum.bucket) * (mx - mn) / {_QSK_W} AS est_val
        FROM targets t
        JOIN cum ON cum.window_start = t.window_start
                AND cum.window_end = t.window_end
                AND cum.cumc >= t.target_rank
        CROSS JOIN b
        GROUP BY 1, 2, 3, 4, mn, mx
    ),
    ranks AS (
        SELECT e.window_start, e.window_end, e.q, e.target_rank, e.est_val,
               count(v.value) AS est_rank
        FROM est e LEFT JOIN v ON v.window_start = e.window_start
                              AND v.window_end = e.window_end
                              AND v.value <= e.est_val
        GROUP BY 1, 2, 3, 4, 5
    )
    SELECT window_start, window_end, q, target_rank,
           est_val + 0 AS est,
           CAST(est_rank AS BIGINT) AS est_rank,
           CAST(est_rank - target_rank AS BIGINT) AS rank_err
    FROM ranks
    """


_QSK_WIN_V_CTE = """v AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
                   AS window_end,
               CAST(value AS DOUBLE) AS value
        FROM events WHERE value IS NOT NULL
    )"""

QUANTILE_WINDOWED_ORACLE = _quantile_window_oracle(_QSK_WIN_V_CTE)

_QSK_WIN_GCOLS = ("window_start", "window_end")


def quantile_windowed_fold(
    ev: DataFrame,
    bounds: DataFrame,
    win: tuple = ("1 hour",),
    watermark: str = "2 hours",
) -> DataFrame:
    """The windowed histogram fold: bucket each (ts, value) row map-side
    against the broadcast 1-row epoch bounds, then count per (window
    spec ``win``, bucket) under the watermark — the quantile member of
    the windowed-fold family hll_windowed_fold anchors."""
    return (
        ev.join(F.broadcast(bounds.select("mn", "mx")))
        .select(
            "ts",
            quantile_bucket_col(F.col("value"), F.col("mn"), F.col("mx"))
            .alias("bucket"),
        )
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", *win), "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "bucket", "c",
        )
    )


def _quantile_windowed_query(
    spark: SparkSession, sf_dir: str, win: tuple, watermark: str
) -> DataFrame:
    """The windowed quantile query body, parametrized by the window spec
    (the _cms_windowed_query convention): ``win`` is the F.window argument
    tail — ("1 hour",) tumbling or ("3 hours", "1 hour") sliding."""
    bounds = quantile_bounds(quantile_vals(spark, sf_dir))
    ev = (
        events_stream(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("ts", F.col("value").cast("double").alias("value"))
    )
    folded = quantile_windowed_fold(ev, bounds, win=win, watermark=watermark)
    cells = run_to_table(spark, folded, "complete")
    vals_w = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.window("ts", *win).alias("window"),
            F.col("value").cast("double").alias("value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "value",
        )
    )
    return quantile_score(
        spark, sf_dir, cells, bounds,
        group_cols=_QSK_WIN_GCOLS, vals=vals_w,
    )


@register("stream_quantile_windowed", QUANTILE_WINDOWED_ORACLE)
def stream_quantile_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p95/p99 of events.value PER HOUR from the windowed
    histogram fold, with the per-window exact-rank error surface."""
    return _quantile_windowed_query(spark, sf_dir, ("1 hour",), "2 hours")


# Hour -> day rollup (r12): the shared-global-grid mergeability claim as
# a DRIVER-CHECKED fact, not only a pytest — the Spark side builds DAILY
# quantile sketches by SUM-merging the HOURLY fold's cells (never
# re-reading values into buckets), while the oracle builds daily cells
# DIRECTLY from the values. The oracle cannot see the merge, so the hash
# match proves sum(hourly cells) == daily cells exactly — the property
# that lets a 100 TB pipeline keep one hourly sketch table and serve
# hour/day/epoch quantiles from rollups alone.
_QSK_DAY_V_CTE = """v AS (
        SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
               time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   AS window_end,
               CAST(value AS DOUBLE) AS value
        FROM events WHERE value IS NOT NULL
    )"""

QUANTILE_ROLLUP_ORACLE = _quantile_window_oracle(_QSK_DAY_V_CTE)


@register("sketch_quantile_rollup", QUANTILE_ROLLUP_ORACLE)
def sketch_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p90/p95/p99 of events.value served from the HOURLY
    sketch table: hourly cells (the same quantile_windowed_fold the
    streaming twin drains — watermark is a no-op on a batch frame)
    SUM-merge by (day, bucket) into daily sketches, then score against
    the per-day exact ranks. The merge is one partial-aggregated groupBy
    over (days x <= _QSK_W) rows — no second pass over the values."""
    bounds = quantile_bounds(quantile_vals(spark, sf_dir))
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("ts", F.col("value").cast("double").alias("value"))
    )
    hourly = quantile_windowed_fold(ev, bounds)
    daily_cells = (
        hourly.select(
            F.date_trunc("day", "window_start").alias("window_start"),
            "bucket", "c",
        )
        .groupBy("window_start", "bucket")
        .agg(F.sum("c").alias("c"))
        .select(
            "window_start",
            F.expr("window_start + INTERVAL '1' DAY").alias("window_end"),
            "bucket", "c",
        )
    )
    vals_d = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.window("ts", "1 day").alias("window"),
            F.col("value").cast("double").alias("value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "value",
        )
    )
    return quantile_score(
        spark, sf_dir, daily_cells, bounds,
        group_cols=_QSK_WIN_GCOLS, vals=vals_d,
    )


_QSK_SLIDE_V_CTE = """v0 AS (SELECT ts, CAST(value AS DOUBLE) AS value
             FROM events WHERE value IS NOT NULL),
    v AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) - i.i * INTERVAL '1 hour'
                   AS window_start,
               time_bucket(INTERVAL '1 hour', ts) - i.i * INTERVAL '1 hour'
                   + INTERVAL '3 hours' AS window_end,
               value
        FROM v0, range(3) i(i)
    )"""

QUANTILE_SLIDING_ORACLE = _quantile_window_oracle(_QSK_SLIDE_V_CTE)


@register("stream_quantile_sliding", QUANTILE_SLIDING_ORACLE)
def stream_quantile_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-3h value percentiles refreshed hourly — the distribution
    companion to stream_hll_sliding/stream_countmin_sliding, completing
    tumbling + sliding symmetry for ALL THREE windowed sketches (r12).
    Every value feeds 3 hourly-spaced panes; state = panes x <= _QSK_W
    cells in complete mode on the bounded drain, watermark-expired to
    ACTIVE panes in append deployments. The shared global grid means a
    pane's cells are the SUM of its 3 tumbling hours' cells — the
    mergeability the epoch-bounds design buys."""
    return _quantile_windowed_query(spark, sf_dir, ("3 hours", "1 hour"),
                                    "4 hours")


# ---------------------------------------------------------------------------
# At-ingest IVF-PQ probe (r12): the serving twin of sim_ivfpq_recall and
# the compressed-tier upgrade of stream_ann_probe — arriving query vectors
# rank the CODED catalog (bucket + PQ reconstruction per corpus vector)
# instead of raw vectors. Stream arm stays the proven stream_ann_probe
# shape: coarse centroids embed as FIXED-K plan literals
# (_centroid_literal_array, guarded), probe selection is a map-side
# slice(array_sort(transform(...))) inside codegen, and per-query top-k is
# the BOUNDED O(k)-state fold (stateful_topk_fold, r14 — see the
# stream_ann_probe block). The catalog (assignment + reconstruction) is
# corpus-proportional: checkpoint-materialized, UNHINTED equi-join on
# bucket. At 100 TB the catalog column rv IS the stored 4-byte code
# decoded on read — the stream probe touches probe/k of the corpus as
# codes, never raw floats. Drained availableNow result == the IVF-PQ
# top-k, so the oracle (shared _IVFPQ_BASE_CTES) replays coarse + subspace
# trainings + encode + restricted ADC ranking exactly.
# ---------------------------------------------------------------------------

from .llm import (  # noqa: E402
    _IVFPQ_TOPK_SQL,
    _PQ_RECALL_K as _IVFPQ_K,
    _pq_reconstruction,
)


def stream_ivfpq_probe_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-drain streaming plan (literal-centroid probe -> unhinted coded
    catalog join -> bounded O(k)-state top-k fold), exposed for the
    hint-free plan test (ninth builder in
    test_stream_static_joins_unhinted_equi — the catalog grows with the
    corpus, so a hard-coded broadcast would be the r08 regression class)."""
    from ..functions.vectors import cosine, cosine_pandas
    from ..operators.similarity import assign_buckets, kmeans_centroids

    from .llm import _pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # Coarse training and the four PQ codebook trainings are independent
    # — overlap them (guide §2.6). r20 (r19 ADVICE): the thunks
    # MATERIALIZE their chains (engine.materialize — one k-row count
    # through the lazy-checkpoint cut), so the overlap is genuine; the
    # r19 lazy-construction thunks ran no jobs and the trainings still
    # serialized at the first consuming action.
    from ..engine import materialize as _mat

    cent, cbs = _run_jobs(
        lambda: _mat(kmeans_centroids(emb, k=_KMEANS_K, iterations=2)),
        lambda: _mat(_pq_codebooks(emb)),
    )
    cent_arr = _centroid_literal_array(cent.collect(), _KMEANS_K)
    # The coded catalog: one bucket id + one reconstruction per corpus
    # vector, materialized once (at scale: the written IVF-PQ index).
    # r19: both come out of ONE map-side corpus pass (zero-exchange
    # assign_buckets + _pq_reconstruction's keep) — the old shape paid a
    # corpus-sized assigned ⋈ recon vec_id join here.
    catalog = (
        _pq_reconstruction(
            assign_buckets(
                emb,
                cent.select(F.col("cent_id").alias("vec_id"),
                            F.col("cv").alias("embedding")),
            ),
            out_col="rv",
            keep=("bucket",),
            codebooks=cbs,
        )
        .withColumnRenamed("vec_id", "n_id")
        .localCheckpoint()
    )

    q = (
        embeddings_stream(spark, sf_dir)
        .filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    )
    scored_cents = F.transform(
        cent_arr,
        lambda s: F.struct(
            (-F.round(cosine(F.col("qv"), s["cv"]), 4)).alias("neg"),
            s["cent_id"].alias("cent_id"),
        ),
    )
    probed = q.select(
        "q_id", "qv",
        F.explode(
            F.transform(
                F.slice(F.array_sort(scored_cents), 1, 2),
                lambda s: s["cent_id"],
            )
        ).alias("bucket"),
    )
    cand = (
        probed.join(catalog, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id", "n_id", F.round(cosine_pandas("qv", "rv"), 4).alias("cos")
        )
    )
    return stateful_topk_fold(cand, k=_IVFPQ_K)


@register("stream_ivfpq_probe", _IVFPQ_TOPK_SQL)
def stream_ivfpq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_table(
        spark, stream_ivfpq_probe_plan(spark, sf_dir), "update"
    )


# ---------------------------------------------------------------------------
# Sliding-window streaming HLL (r11): distinct users over a TRAILING 3-hour
# window sliding hourly — the "unique visitors, last 3 hours, refreshed
# hourly" dashboard. Composes the two machineries this repo already pins:
# sliding windows (every event lands in 3 hourly-spaced panes, the a3
# replay) and the HLL register fold (MAX-merge, 256 registers). State =
# panes x 256 rows in complete mode on the bounded drain — 3x the tumbling
# twin's per-window cost, watermark-expired to ACTIVE panes in append
# deployments. Exercises the generalized helpers under a second group
# shape (gcols = window bounds only, no event_type) so the
# parametrization is proven on more than one caller.
# ---------------------------------------------------------------------------

_HLL_SLIDE_EV_CTE = """ev0 AS (SELECT ts, user_id FROM events
            WHERE user_id IS NOT NULL),
    ev AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) - i.i * INTERVAL '1 hour'
                   AS window_start,
               time_bucket(INTERVAL '1 hour', ts) - i.i * INTERVAL '1 hour'
                   + INTERVAL '3 hours' AS window_end,
               user_id
        FROM ev0, range(3) i(i)
    )"""

HLL_SLIDING_ORACLE = _hll_window_oracle(
    _HLL_SLIDE_EV_CTE, ("window_start", "window_end")
)

_HLL_SLIDE_GCOLS = ("window_start", "window_end")


@register("stream_hll_sliding", HLL_SLIDING_ORACLE)
def stream_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_stream(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("ts", "user_id")
    )
    folded = (
        hll_hashed(ev, key="user_id", group_cols=("ts",))
        .withWatermark("ts", "4 hours")
        .groupBy(F.window("ts", "3 hours", "1 hour"), "bucket")
        .agg(F.max("r").alias("r"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "bucket", "r",
        )
    )
    ev_b = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(F.window("ts", "3 hours", "1 hour").alias("window"),
                "user_id")
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "user_id",
        )
    )
    groups = ev_b.select(*_HLL_SLIDE_GCOLS).distinct()
    exact = ev_b.groupBy(*_HLL_SLIDE_GCOLS).agg(
        F.countDistinct("user_id").alias("n")
    )
    # r20 (guide §2.6): the exact-distinct/groups batch arms are
    # independent of the drain — materialize them in parallel with it
    # (the _cms_windowed_query idiom; checkpoints double as true stats
    # for the downstream grid/score joins).
    regs_drained, groups, exact = _run_jobs(
        lambda: run_to_table(spark, folded, "complete"),
        lambda: groups.localCheckpoint(),
        lambda: exact.localCheckpoint(),
    )
    return hll_score(
        spark, sf_dir,
        hll_grid_fill(regs_drained, groups, group_cols=_HLL_SLIDE_GCOLS),
        group_cols=_HLL_SLIDE_GCOLS,
        exact=exact,
    )
