"""Deduplication operators for LLM training-data pipelines (SURVEY §7
Phase 3): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Scale design (the 100 TB story):
- Exact dedup is one hash-shuffle on the fingerprint (map-side combine).
- MinHash/LSH never compares all pairs: band buckets bound candidate
  generation; the shuffle key is (band_id, band_hash), so work scales with
  collisions, not n^2.
- SimHash blocking splits the fingerprint into chunks; hamming<=k pairs must
  collide on >=1 chunk (pigeonhole), same bounded-candidates property.
- Embedding near-dup at scale goes through the IVF/LSH bucketing in
  similarity.py; the brute-force variant here is the correctness baseline.

Hash-function note: signatures use md5 (hex-string min) so the DuckDB oracle
can reproduce them bit-for-bit. On a real cluster swap ``hash_fn`` for
xxhash64 — same algorithm, cheaper hash; the structure (explode -> min-agg ->
band -> self-join) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import fingerprint, shingles

__all__ = [
    "exact_dedup",
    "doc_shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "embedding_near_pairs",
]


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact (content-set) dedup: group by the sorted-token md5 fingerprint,
    keep the smallest id. Output: (keep_id, n_copies, fp)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def doc_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle) pairs — the input relation for minhash and jaccard.

    ``distinct=True`` (a shuffle) is required for Jaccard set arithmetic;
    minhash min-aggregation is duplicate-insensitive, so pass False there
    and skip the shuffle entirely (the min-agg's map-side combine absorbs
    duplicates for free)."""
    from ..functions.text import shingles_from_words

    exploded = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_w")
    ).select(F.col(id_col), F.explode(shingles_from_words("_w", n)).alias("shingle"))
    return exploded.distinct() if distinct else exploded


# MinHash permutation family: one md5-derived 32-bit base hash per shingle,
# then affine permutations h_j = (a_j*h + b_j) mod P over a prime > 2^32.
# One digest per shingle instead of num_hashes digests — the hash count no
# longer multiplies the expensive part. Constants are fixed so the DuckDB
# oracle reproduces signatures exactly.
MINHASH_PRIME = 4294967311


def _minhash_a(j: int) -> int:
    # Knuth-multiplicative mixing, capped < 2^30 so a*h (h < 2^32) stays
    # within int64; forced odd. Small a_j (e.g. 2j+1) would make the
    # permutations order-preserving => correlated minima => broken LSH.
    return (2654435761 * (j + 1)) % (2**30) | 1


def _minhash_b(j: int) -> int:
    return (2654435789 * (j + 1) * (j + 13)) % MINHASH_PRIME


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 16) -> DataFrame:
    """MinHash signature per doc: sig_j = min over shingles of
    (a_j * h + b_j) mod P, h = first 8 md5 hex digits as uint32. One groupBy
    with num_hashes min-aggregates — a single shuffle, map-side partial
    mins; duplicates in the input are absorbed by the min."""
    base = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
    with_h = sh.withColumn("_h", base)
    aggs = [
        F.min(
            (F.lit(_minhash_a(j)) * F.col("_h") + F.lit(_minhash_b(j)))
            % F.lit(MINHASH_PRIME)
        ).alias(f"sig_{j}")
        for j in range(num_hashes)
    ]
    return with_h.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: hash each band of rows, bucket-join docs sharing any
    band value. Output distinct candidate pairs (id_a < id_b)."""
    rows_per_band = num_hashes // bands
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    # melt to (id, band_id, band_val): stack stays in codegen
    stack_expr = ", ".join(f"{b}, band_{b}" for b in range(bands))
    melted = banded.selectExpr(
        id_col, f"stack({bands}, {stack_expr}) AS (band_id, band_val)"
    )
    a = melted.alias("a")
    b = melted.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.4,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle
    (optionally restricted to LSH candidates). Output
    (id_a, id_b, jaccard) with round(4) >= threshold.

    Scale: the shingle self-join generates work proportional to shingle
    collision counts; pair it with LSH candidates (or drop ultra-frequent
    shingles) when the corpus has hot shingles.
    """
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- SimHash ---------------------------------------------------------------
# 32-bit simhash from the md5 of each distinct token: nibble c of the hex
# digest contributes 4 bits; bit i of the fingerprint is the sign of the
# sum over tokens of (2*bit_i(token) - 1). Pure integer arithmetic on hex
# characters (position in '0123456789abcdef') so DuckDB reproduces it
# exactly; swap md5 for xxhash64+bit ops at scale.

SIMHASH_BITS = 32


def _nibble(h, c: int):
    # value of hex char c (0-based) of digest h
    return F.instr(F.lit("0123456789abcdef"), F.substring(h, c + 1, 1)) - 1


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) with a 32-bit fingerprint as BIGINT."""
    tokens = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok")
    ).distinct()
    h = F.md5(F.col("tok"))
    bit_sums = []
    for i in range(SIMHASH_BITS):
        c, off = divmod(i, 4)
        bit = F.floor(_nibble(h, c) / (2 ** (3 - off))) % 2
        bit_sums.append(F.sum(bit * 2 - 1).alias(f"s_{i}"))
    sums = tokens.groupBy(id_col).agg(*bit_sums)
    acc = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        acc = acc + F.when(F.col(f"s_{i}") > 0, F.lit(2**i).cast("long")).otherwise(0)
    return sums.select(F.col(id_col), acc.alias("simhash"))


def simhash_near_pairs(
    fp: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, blocked on
    8-bit chunks: hamming<=3 over 4 chunks forces >=1 identical chunk
    (pigeonhole), so the join is bucket-bounded, never all-pairs."""
    chunks = fp.select(
        F.col(id_col),
        "simhash",
        *[
            (F.shiftright("simhash", 8 * c) % 256).alias(f"chunk_{c}")
            for c in range(4)
        ],
    )
    melted = chunks.selectExpr(
        id_col,
        "simhash",
        "stack(4, 0, chunk_0, 1, chunk_1, 2, chunk_2, 3, chunk_3) AS (chunk_id, chunk_val)",
    )
    a, b = melted.alias("a"), melted.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def embedding_near_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
) -> DataFrame:
    """Brute-force cosine near-dup pairs (correctness baseline; use the
    IVF/LSH path in similarity.py at scale)."""
    from ..functions.vectors import cosine

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine("va", "vb"), 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
