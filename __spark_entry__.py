"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``spark_streaming_kafka_example_spark`` (see
SURVEY.md); this module only adapts the plan registry to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_streaming_kafka_example_spark import plans  # noqa: E402

plans.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver runs the first N registered queries (r01: flagship + the next
# 49). CORE pins the window to every SURVEY §2 row's canonical query plus one
# representative per LLM-pipeline / streaming family, so each round's
# CORRECTNESS file always covers the full operator matrix.
CORE_WINDOW = [
    "flagship_sliding_alert",
    # §2.4 projections / §2.10 UDF / §2.6 join / §2.5 filter
    "p1_cast_projection",
    "p2_from_json_flatten",
    "p5_to_json_struct",
    # p7_rename_key trimmed r04 (trivial rename, driver-proven r01-r03) to
    # give the rotation window the 17th slot the r03 VERDICT asks for.
    "p8_p9_timestamp_roundtrip",
    "p10_month_partition_key",
    "p12_a1_word_count",
    "u1_u3_udf_sql",
    "j1_enrich_left_outer",
    "f1_threshold_filter",
    # §2.7 windowed aggregation
    "a2_tumbling_window_agg",
    "a3_sliding_window_agg",
    # §2.8 sort/limit/set ops (set_union_distinct represents the set-op
    # family; intersect/except/q5/u3_pandas were trimmed from the pinned set
    # in r03 — all lifetime driver-proven — to widen the rotation window)
    "sort_limit_topk",
    "set_union_distinct",
    # TPC-H canon
    "q1_pricing_summary",
    "q3_shipping_priority",
    # LLM-pipeline families: dedup, similarity, text, multimodal, pipeline
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "sim_topk_bruteforce",
    "sim_ivf_topk",
    "sim_ivf_kmeans_topk",
    "text_analysis_profile",
    "text_quality_score",
    "multimodal_features",
    "pipeline_training_data_prep",
    # Streaming families: windowed agg, arbitrary state, session, dedup
    "stream_tumbling_complete",
    "stream_stateful_running_count",
    "stream_sessionizer_closed",
    "stream_dedup_fingerprint",
]


def _driver_checked_names() -> set[str]:
    """Names that already have a green driver row in any past round's
    CORRECTNESS_r*.json (hash match, or a rows-only row that produced rows)."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                seen.add(name)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                seen.add(name)
    return seen


# Unchecked queries enter the window in this order first (r03 VERDICT: drain
# the TPC-H q2-q22 block first, then the four driver-unchecked streaming
# queries — exactly the 17 rotation slots left by the 33-entry CORE window),
# then registration order.
ROTATION_PRIORITY = [
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier",
    "q17_small_quantity",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q20_excess_shippers",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "stream_flagship_alert",
    "stream_session_window",
    "stream_pii_scrub",
    "stream_topk_incremental",
]


def _ordered_names() -> list[str]:
    """CORE window first, then queries the driver has never green-checked
    (rotating them into the window over rounds), then the already-green rest."""
    all_names = list(plans.QUERIES)
    core = [n for n in CORE_WINDOW if n in plans.QUERIES]
    core_set = set(core)
    checked = _driver_checked_names()
    unchecked = [n for n in all_names if n not in core_set and n not in checked]
    prio = {n: i for i, n in enumerate(ROTATION_PRIORITY)}
    unchecked.sort(key=lambda n: (prio.get(n, len(prio)), all_names.index(n)))
    rest = [n for n in all_names if n not in core_set and n in checked]
    return core + unchecked + rest


def _apply_session_conf(spark: SparkSession) -> None:
    """The driver owns the SparkSession; re-apply the runtime-settable confs
    our plans rely on (engine.get_session sets the same ones)."""
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.timeParserPolicy": "CORRECTED",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # The driver's plain session defaults to 200 shuffle partitions —
        # at sf0.01 that is 6x more tasks than data; 32 matches engine.py
        # (results are partition-count independent by oracle convention).
        "spark.sql.shuffle.partitions": "32",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a started session — engine default applies


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _apply_session_conf(spark)
    return plans.QUERIES["flagship_sliding_alert"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""

    def wrap(fn: plans.QueryFn) -> plans.QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _apply_session_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(plans.QUERIES[name]) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted => driver runs
    the weaker rows-only check; used only for non-SQL-expressible ops)."""
    return dict(plans.ORACLE)
