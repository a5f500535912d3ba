#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (every column
materialized, nothing collected): count() would let Catalyst prune the
projected expressions of projection-only queries and understate their work
(VERDICT r1 item #5). Timings include plan + execution, excluding session
startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_streaming_kafka_example_spark import plans
from spark_streaming_kafka_example_spark.engine import get_session

plans.load_all()

# Headline queries: the flagship pipeline plus the heaviest representatives
# of each operator family that exists in the registry at bench time.
HEADLINE = [
    "flagship_sliding_alert",
    "stream_flagship_alert",
    "a3_sliding_window_agg",
    "a2_tumbling_window_agg",
    "j1_enrich_left_outer",
    "p12_a1_word_count",
    "p2_from_json_flatten",
    # Added as phases land (missing names are skipped):
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume_customer",
    "window_topk_per_group",
    "sessionize_gap_30m",
    "dedup_minhash_lsh",
    "dedup_minhash_estimate",
    "dedup_exact",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "sim_topk_bruteforce",
    "sim_ivf_topk",
    "text_quality_score",
    "text_levenshtein_lsh",
    "stream_vector_bucketize",
    # r05 additions (r04 VERDICT task 5): round-over-round history for the
    # r04-new operators, plus the capped-LSH production twin.
    "dedup_containment",
    "dedup_clusters_star",
    "dedup_minhash_lsh_capped",
    "text_hashing_features",
    "dq_profile_embeddings",
    # r05-new operator families
    "dedup_semdedup",
    "text_decontaminate",
    "sim_bm25_topk",
    "pack_sequences_greedy",
    "pipeline_pretrain_v2",
    # r06-new: materialized IVF (build + partition-pruned probe), recall
    # gate, packed-payload materialization
    "sim_ivf_indexed_topk",
    # r07 (r06 VERDICT task 3): the amortized serving cost — probes the
    # index sim_ivf_indexed_topk just built, so this times the
    # partition-pruned probe alone while indexed_topk keeps charging
    # build+probe (its samples force a rebuild; see _PRE_SAMPLE).
    "sim_ivf_probe_only",
    "sim_ivf_recall",
    "pack_sequences_payload",
    "pipeline_export_shards",
    "dedup_repeated_spans",
    "sim_quantize_int8",
    "cohort_daily_retention",
    "pipeline_rag_prep",
    # r07-new heavy representatives: bigram-LM perplexity bucketing,
    # iterative PageRank, path mining, the 7-day stickiness expansion
    "text_perplexity_buckets",
    "graph_pagerank_2iter",
    "paths_event_trigrams",
    "dau_stickiness_7d",
    # r08 (r07 VERDICT task 6): the window-function analytics families get
    # bench history; plus the new perceptual-hash image dedup pipeline
    # (synthesize -> real decode -> aHash -> Hamming-band LSH).
    "latency_percentile_bands",
    "timeseries_rolling_corr_intraday",
    "dedup_image_phash",
    # r08 new-family representatives: audio-modality dedup, O(1)-state
    # streaming sequence mining, vocabulary building, quantile binning.
    "dedup_audio_envelope",
    "stream_markov_transitions",
    "text_vocab_coverage",
    "train_feature_binning",
    # r09 (r08 VERDICT task 8): the r08 round-trip rows get bench history —
    # file-sink machinery, the at-ingest image probe, funnel latency; plus
    # the r09-new families (audio at-ingest probe, spectral fingerprint,
    # multimodal pretrain capstone, z-order read-back).
    "k4_parquet_sink_roundtrip",
    "stream_image_phash",
    "funnel_time_to_convert",
    "stream_audio_envelope",
    "dedup_audio_spectral",
    "pipeline_pretrain_v3",
    "layout_zorder_readback",
    "dedup_video_frames",
    "sketch_countmin_users",
    "layout_bucketed_join",
    # r10 (r09 VERDICT task 8): the remaining r09 rows that ran in the
    # driver but had no bench history — the streaming media/sketch twins,
    # A/B lift, and the window-distribution family.
    "stream_audio_spectral",
    "stream_video_frames",
    "stream_countmin_users",
    "experiment_ab_lift",
    "window_distribution_tour",
    # r10-new families: iterative BPE tokenizer training, the mergeable
    # quantile sketch (batch + stream), the at-ingest pretrain gate.
    "train_bpe_merges",
    "sketch_quantile_values",
    "stream_quantile_values",
    "stream_pretrain_gate",
    "sketch_hll_distinct",
    "stream_hll_distinct",
    "sketch_bloom_decontaminate",
    # r11-new rows: the four streaming twins closing sketch/tokenizer
    # batch+stream symmetry, plus the at-ingest MinHash probe and the
    # windowed count-min dashboard.
    "stream_bloom_decontaminate",
    "stream_bpe_tokenize",
    "stream_quantile_twophase",
    "stream_hll_windowed",
    "stream_minhash_probe",
    "stream_countmin_windowed",
    "stream_hll_sliding",
    "layout_bloom_prefilter",
    "sim_pq_adc_recall",
    # r12-new: the IVF-PQ composition tier (coarse probe + ADC over PQ
    # reconstructions), its at-ingest serving probe, and the windowed +
    # sliding quantile / sliding count-min sketches.
    "sim_ivfpq_recall",
    "stream_quantile_windowed",
    "stream_ivfpq_probe",
    "stream_quantile_sliding",
    "stream_countmin_sliding",
    "sim_ivfpq_residual_recall",
    "sim_sq8_recall",
    "sketch_quantile_rollup",
    # r15 (r14 VERDICT task 6): the raw-vector at-ingest ANN probe's
    # implementation changed in r14 (the O(k)-state top-k fold) with no
    # recorded timing — only the coded-catalog twin was measured; plus the
    # r15-new clustered-corpus recall surface.
    "stream_ann_probe",
    "sim_ivfpq_clustered_recall",
    # r16 (r15 VERDICT task 2): the content-keyed split pair — map-side
    # assignment + the audit re-run that reads exactly 0 contamination.
    "split_by_cluster",
    "split_by_cluster_audit",
    # r16 (r15 VERDICT task 7): incremental IVF maintenance end-to-end —
    # base build + streamed appendix (foreachBatch dynamic-overwrite
    # appends) + the union probe; times the full freshness path.
    "stream_ivf_appendix_probe",
    # r16: the near-dup-robust split (representative-fp gate over the
    # LSH->jaccard->components clusters) and its cluster-level audit,
    # plus the at-ingest stateless split-assignment twin.
    "split_by_neardup_cluster",
    "split_by_neardup_cluster_audit",
    "stream_split_by_cluster",
    # r16: the compaction arm of the index lifecycle (build -> append ->
    # compact -> probe, one shared oracle across all of it), and the
    # at-ingest dedup against a foreachBatch-maintained fingerprint store.
    "sim_ivf_compacted_probe",
    "stream_dedup_store_ingest",
    # r16: near-dup detection against a GROWING band catalog — the third
    # ingest-maintenance arm (vectors, exact fps, near-dup bands), and
    # the Bloom-prefiltered store variant (same oracle, pruned store
    # traffic).
    "stream_minhash_catalog_ingest",
    "stream_dedup_store_bloom_ingest",
    # r17: the maintenance composition — the at-ingest pretrain gate
    # reading the MAINTAINED fp store + band catalog (cross-batch dups) —
    # and the at-ingest rep-fp split (re-crawls land in their source's
    # split via the materialized cluster map).
    "stream_pretrain_gate_v2",
    "stream_split_by_neardup",
    # r17: mid-lifecycle compaction of the fp store and band catalog
    # (decisions hash-unchanged across the collapse — the housekeeping
    # arm the IVF index already has).
    "stream_dedup_store_compacted",
    "stream_minhash_catalog_compacted",
    # r17: the TTL'd store + catalog — the expiry stage of the lifecycle —
    # and the maintained IMAGE chunk catalog (the frozen-probe upgrade,
    # completing the maintenance matrix across modalities).
    "stream_dedup_store_retention",
    "stream_minhash_catalog_retention",
    "stream_image_catalog_ingest",
    # r18: the image catalog's lifecycle symmetry (compaction + TTL),
    # the v3 gate composing the maintained image arm, and the
    # ingest-maintained cluster map for the near-dup split (a cluster
    # formed entirely after stream start still moves as one unit).
    "stream_image_catalog_compacted",
    "stream_image_catalog_retention",
    "stream_pretrain_gate_v3",
    "stream_split_by_neardup_incremental",
    "stream_split_by_neardup_inc_compacted",
    "stream_split_by_neardup_inc_audit",
    # r18: the embedding modality's dedup-maintenance arm (the matrix's
    # vector row as a true dedup arm, not just IVF serving) + its
    # lifecycle twins.
    "stream_embedding_catalog_ingest",
    "stream_embedding_catalog_compacted",
    "stream_embedding_catalog_retention",
]
_HEADLINE_SET = frozenset(HEADLINE)


def _force_ivf_rebuild() -> None:
    """sim_ivf_indexed_topk documents CREATE-INDEX (build+probe) timing;
    the build memoizes per session (r06 ADVICE), so each bench sample must
    drop the memo to keep measuring the end-to-end cost. sim_ivf_probe_only
    then reuses the last built index — the amortized number."""
    from spark_streaming_kafka_example_spark.plans import llm

    llm._IVF_INDEX_BUILT.clear()


_PRE_SAMPLE = {"sim_ivf_indexed_topk": _force_ivf_rebuild}


def _calibration(spark) -> dict[str, float]:
    """Fixed-size, data-independent load probes (r06 VERDICT task 4): two
    consecutive driver rounds drifted ~+20% uniformly from host load, which
    took manual same-code reruns to prove. These two constants let a future
    reader normalize totals without re-running:
    - jvm_agg_sec: a constant 20M-row in-JVM hash+sum aggregation
      (whole-stage codegen, no IO) — tracks JVM/CPU contention;
    - python_hash_sec: 2M iterations of hashlib in the driver process —
      tracks raw host CPU availability outside the JVM;
    - jvm_agg32_sec (r09 VERDICT task 3): the SAME aggregation over 640M
      rows forced onto 32 partitions, so every local[32] slot runs — the
      single-threaded probes provably under-report 32-way contention
      (BASELINE.md r09 caveat: a 1.5x single-probe ratio coincided with a
      ~1.4x spread on multi-core queries), and this probe saturates the
      host the way the headline queries do.
    All are min-of-3 like every headline query. BASELINE.md documents the
    reference values and how to use the ratio."""
    import hashlib

    from pyspark.sql import functions as F

    jvm = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(20_000_000).select(
            F.sum(F.hash("id")).alias("h")
        ).write.format("noop").mode("overwrite").save()
        jvm.append(time.perf_counter() - t0)
    jvm32 = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 640_000_000, 1, 32).select(
            F.sum(F.hash("id")).alias("h")
        ).write.format("noop").mode("overwrite").save()
        jvm32.append(time.perf_counter() - t0)
    py = []
    for _ in range(3):
        t0 = time.perf_counter()
        h = b"calib"
        for _i in range(2_000_000):
            h = hashlib.md5(h).digest()
        py.append(time.perf_counter() - t0)
    return {
        "jvm_agg_sec": round(min(jvm), 3),
        "jvm_agg32_sec": round(min(jvm32), 3),
        "python_hash_sec": round(min(py), 3),
    }


# The driver's capture keeps only the trailing 2000 BYTES of stdout —
# measured exactly on both BENCH_r10 and BENCH_r11 (the earlier "~3.5 KB
# observed" premise was wrong; r11 VERDICT task 1). The emitted line
# self-sizes to this budget so the WHOLE line (JSON head included)
# survives and the driver's parse finally succeeds. 1900 leaves margin
# for a stray trailing newline / shell prompt byte. The env override is a
# DEV escape hatch for recording full per-query maps in BENCH_NOISE files
# — the driver never sets it, so its line keeps the pinned budget.
_EMIT_BUDGET = int(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "1900"))


def _capture_rounds() -> dict[str, int]:
    """name -> latest driver round whose recorded BENCH_r{N}.json capture
    window actually holds a per-query time for name (a quote-delimited
    `"name":` match inside the stored tail — works on the head-truncated
    r01-r11 lines too; a name whose leading quote was cut off was not
    legibly captured). Names absent from every capture have NO bench
    history. BENCH_NOISE_* dev recordings are deliberately excluded: they
    carry full per-query maps at a raised dev budget, which would mark
    every name "just captured" and freeze the rotation.

    This keying is STABLE across the round lifecycle (r12 VERDICT task 1 /
    ADVICE): the driver writes BENCH_r{N} and CORRECTNESS_r{N} only AFTER
    this round's bench run, and neither artifact can reorder a
    *past* capture — unlike the r12 `_ordered_names()` keying, which
    flipped the moment CORRECTNESS_r12.json landed and turned the pytest
    gate red mid-round."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                tail = json.load(f).get("tail", "")
        except Exception:
            continue
        for name in re.findall(r'"([A-Za-z0-9_]+)":[0-9]', tail):
            # Envelope keys (sf, value, n_queries, n_emitted, jvm_agg_sec,
            # ...) match the pattern too; only HEADLINE names are capture
            # history — without this filter a future query named like an
            # envelope key would be wrongly marked just-captured and
            # starved of emission (r13 ADVICE).
            if name not in _HEADLINE_SET:
                continue
            seen[name] = max(seen.get(name, 0), rnd)
    return seen


def _drop_order(names) -> list[str]:
    """Emission-eviction order (r13, r12 VERDICT task 5): drop the MOST-
    recently-captured names first, so every HEADLINE query lands a
    captured per-query time within ~2 rounds — the names the 61-slot r12
    line starved rotate in automatically because last round's survivors
    now sort to the drop-first end. Ties (same latest capture round, and
    the whole never-captured class at round 0) break by HEADLINE index
    ascending — registration order, a stable notion of age — so the
    newest registrations always sit at the kept tail regardless of their
    driver-green status."""
    cap = _capture_rounds()
    idx = {n: i for i, n in enumerate(HEADLINE)}
    return sorted(names, key=lambda n: (-cap.get(n, 0), idx.get(n, -1)))


def emit_line(timings: dict[str, float], sf, calibration: dict) -> str:
    """The ONE output line, guaranteed <= _EMIT_BUDGET bytes (r11 VERDICT
    task 1): per-query entries are dropped in `_drop_order` (most-recently-
    captured first; never-captured and newest registrations survive
    longest) until the serialized line fits, so the head of the JSON is
    never truncated and per-query coverage ROTATES across rounds. `value`
    stays the total over ALL sampled queries (not just the emitted map);
    `n_queries` / `n_emitted` record the coverage so a reader knows when
    entries were dropped.
    tests/test_operators.py::test_bench_line_fits_driver_capture pins the
    worst-case emitted length against the measured capture — with
    structural assertions only, so the gate stays green after the
    driver's round artifacts land (r12 VERDICT task 1)."""
    names = _drop_order(timings)
    total = round(sum(timings.values()), 3)

    def render(keep: list[str]) -> str:
        return json.dumps(
            {
                "metric": "headline_queries_total",
                "queries": {n: timings[n] for n in keep},
                "sf": sf,
                "unit": "sec",
                "value": total,
                "n_queries": len(timings),
                "n_emitted": len(keep),
                "calibration": calibration,
            },
            separators=(",", ":"),
        )

    keep = list(names)
    line = render(keep)
    while len(line) > _EMIT_BUDGET and keep:
        keep.pop(0)
        line = render(keep)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_session(app_name="bench")

    # Warm the JVM/IO/broadcast machinery once so per-query numbers measure
    # the queries, not codegen compilation and executor spin-up.
    from pyspark.sql import functions as F

    from spark_streaming_kafka_example_spark.sources import load_table

    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left_outer").count()
    load_table(spark, sf_dir, "documents").count()

    # Min of three runs per query: single samples on a shared host swing up
    # to 2x on unchanged queries (observed on idle-vs-busy reruns), and even
    # min-of-two left a phantom +15% on q9 in r03 that r04 had to chase; the
    # min is the standard noise-resistant point estimate and still includes
    # plan + execution end-to-end.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = plans.QUERIES.get(name)
        if fn is None:
            continue
        samples = []
        for _ in range(3):
            pre = _PRE_SAMPLE.get(name)
            if pre is not None:
                pre()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 2)

    # Field order matters (r09 VERDICT task 3): the driver's capture keeps
    # the TAIL of the line, so totals and calibration go AFTER the
    # per-query map. Still exactly ONE JSON line; emit_line documents the
    # r11 shrink/ordering moves.
    print(
        emit_line(
            timings,
            float(sf) if sf.replace(".", "").isdigit() else sf,
            _calibration(spark),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
