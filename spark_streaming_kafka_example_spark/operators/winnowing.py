"""Winnowing document fingerprints (rolling-hash selection, MOSS-style).

The classic local document-fingerprinting scheme (Schleimer, Wilkerson,
Aiken, SIGMOD'03 "Winnowing: Local Algorithms for Document Fingerprinting"):
hash every character k-gram of a document, slide a window of ``w``
consecutive k-gram hashes, and keep the minimum hash of each window. Any
shared substring of length >= k + w - 1 between two documents is guaranteed
to contribute at least one identical fingerprint to both — so fingerprint
overlap detects copied passages, not just whole-document similarity (what
MinHash measures).

Spark-first shape (no Python in the hot path):
- k-grams come from one ``transform(sequence(...))`` + ``posexplode`` —
  whole-stage codegen, one row per k-gram, no UDF.
- the per-window minimum is ``min() OVER (PARTITION BY doc ORDER BY pos
  ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING)`` — a bounded sliding frame;
  the sort is per-document (documents are bounded-length), so the only
  shuffle is the hash partition on doc_id, and state never exceeds one
  document per task at a time.
- fingerprint overlap joins are equi-joins on the fingerprint value —
  bucket-bounded like every other dedup family here (operators/dedup.py),
  never all-pairs.

Hash note: the k-gram hash is the first 8 md5 hex digits as a uint32
(``conv`` nibble arithmetic on the DuckDB side) — same convention as the
MinHash base hash, so every fingerprint is bit-for-bit reproducible by the
SQL oracle. Swap md5 for xxhash64 on a real cluster; structure unchanged.

Reference scope note: the reference repo has no fingerprinting (492-LoC
Scala streaming demo, SURVEY §2); this is a north-star LLM-pipeline
extension (BASELINE.json / builder brief: "document fingerprinting
(rolling hash)").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["char_kgram_hashes", "winnow_fingerprints", "winnow_overlap_pairs"]


def char_kgram_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """(id, pos, h): 32-bit hash of every character k-gram, 0-based pos.

    Documents shorter than ``k`` characters produce no rows (an empty
    window list, not a malformed gram).
    """
    # substring(col, pos_col, len) needs a SQL expr (the column-API
    # substring wants a literal pos), so the gram list is one expr.
    grams = F.expr(
        f"CASE WHEN length({text_col}) >= {k} THEN "
        f"transform(sequence(1, length({text_col}) - {k - 1}), "
        f"i -> substring({text_col}, i, {k})) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gram")
    )
    h = F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
    return exploded.select(id_col, "pos", h.alias("h"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Distinct winnowing fingerprints per document: (id, fp).

    fp = min k-gram hash of each complete window of ``w`` consecutive
    k-grams, deduplicated (the same minimum is selected by overlapping
    windows; the *set* of selected hashes is the fingerprint, per the
    winnowing paper's guarantee).
    """
    hashes = char_kgram_hashes(df, id_col, text_col, k)
    # n_grams per doc = max pos + 1; a window starting at pos is complete
    # iff pos + w - 1 <= max pos.
    doc_win = Window.partitionBy(id_col)
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    return (
        hashes.withColumn("_max_pos", F.max("pos").over(doc_win))
        .withColumn("fp", F.min("h").over(frame))
        .filter(F.col("pos") + (w - 1) <= F.col("_max_pos"))
        .select(id_col, "fp")
        .distinct()
    )


def winnow_overlap_pairs(
    fps: DataFrame, id_col: str = "doc_id", min_overlap: float = 0.5
) -> DataFrame:
    """Document pairs whose winnowing-fingerprint OVERLAP COEFFICIENT
    (shared / min(|fps_a|, |fps_b|)) is >= ``min_overlap``:
    (id_a, id_b, shared, ov_coef). A document copied-with-truncation (or a
    passage lifted into a larger document) scores ~1.0 — containment is the
    right measure for passage reuse, where Jaccard is diluted by the
    non-copied remainder. Raw shared counts are NOT comparable across
    corpora (hot fingerprints from boilerplate inflate them); the
    coefficient normalizes that away.

    Equi-join on fp: work scales with fingerprint collision counts (drop
    ultra-hot fingerprints — boilerplate — the same way hot shingles are
    handled in jaccard_pairs) — never an all-pairs product.
    """
    # fps feeds sizes + both join sides: materialize the fingerprint set
    # once instead of recomputing the k-gram explode + sliding-min three
    # times (at cluster scale: write the fingerprint table, then join).
    fps = fps.localCheckpoint()
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    a, b = fps.alias("a"), fps.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_fp").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_fp").alias("nb"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared",
            F.round(F.col("shared") / F.least("na", "nb"), 4).alias("ov_coef"),
        )
        .filter(F.col("ov_coef") >= min_overlap)
    )
