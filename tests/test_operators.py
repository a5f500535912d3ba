"""Semantic checks for the Phase-3 operators: do they find what they must
find (planted duplicates, true neighbors), not just match the oracle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka_example_spark import plans
from spark_streaming_kafka_example_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_META_SCHEMA,
    attach_blob,
    decode_features,
)
from spark_streaming_kafka_example_spark.operators.similarity import brute_force_topk
from spark_streaming_kafka_example_spark.sources import load_table

plans.load_all()


def test_exact_dedup_finds_planted_copies(spark, sf_dir):
    out = plans.QUERIES["dedup_exact"](spark, sf_dir).toPandas()
    planted = out[out.n_copies >= 2]
    # every 7th doc was copied; each copy must collapse onto its original
    assert len(planted) >= 50
    assert (out.n_copies >= 1).all()


def test_normalized_dedup_collapses_reformatted_copies(spark):
    """Case/punctuation/whitespace variants of the same text must collapse
    onto one fingerprint; genuinely different texts must not."""
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "the QUICK  brown fox, jumps over the lazy dog!!"),
            (3, "  The quick... brown? fox; jumps (over) the lazy dog  "),
            (4, "an entirely different document about something else"),
        ],
        "doc_id long, text string",
    )
    from spark_streaming_kafka_example_spark.operators.dedup import exact_dedup
    from pyspark.sql import functions as SF

    ntext = SF.trim(
        SF.regexp_replace(
            SF.regexp_replace(SF.lower(SF.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    out = exact_dedup(docs.select("doc_id", ntext.alias("text"))).toPandas()
    assert len(out) == 2
    collapsed = out[out.n_copies == 3]
    assert len(collapsed) == 1 and collapsed.keep_id.iloc[0] == 1


def test_minhash_lsh_recalls_planted_near_dups(spark, sf_dir):
    pairs = plans.QUERIES["dedup_minhash_lsh"](spark, sf_dir).toPandas()
    hits = set(zip(pairs.id_a, pairs.id_b))
    planted = [(d, d + 100000) for d in range(0, 500, 5)]
    recall = sum((a, b) in hits for a, b in planted) / len(planted)
    # 15 hashes / 5 bands of 3 on ~0.75-jaccard pairs: expected recall ~0.95
    assert recall >= 0.8, f"LSH recall {recall}"


def test_lsh_bucket_cap_drops_hot_buckets_keeps_pairs(spark):
    """max_bucket_size is the quadratic-term guard: a mass-duplicate
    cluster sharing every band must stop generating O(n^2) candidate
    pairs once its buckets exceed the cap, while ordinary near-dup pairs
    (bucket size 2) keep pairing."""
    from spark_streaming_kafka_example_spark.operators import dedup as DD

    boiler = "the same boilerplate page text repeated verbatim everywhere"
    uniq = [
        f"document number {i} speaks about topic {i * 37} in detail plus "
        f"unique trailing words alpha{i} beta{i} gamma{i} delta{i}"
        for i in range(5)
    ]
    rows = [(i, boiler) for i in range(50)]
    rows += [(100 + i, t) for i, t in enumerate(uniq)]
    rows += [(200 + i, t) for i, t in enumerate(uniq)]  # near-dup partners
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = DD.doc_shingles(docs, distinct=False)
    sig = DD.minhash_signatures(sh).localCheckpoint()
    capped = DD.lsh_candidate_pairs(sig, max_bucket_size=10).toPandas()
    uncapped = DD.lsh_candidate_pairs(sig).toPandas()
    hot = lambda df: df[(df.id_a < 50) & (df.id_b < 50)]
    planted = {(100 + i, 200 + i) for i in range(5)}
    assert len(hot(uncapped)) == 50 * 49 / 2  # the quadratic blowup, live
    assert len(hot(capped)) == 0  # suppressed by the cap
    assert planted <= set(zip(capped.id_a, capped.id_b))  # real pairs survive


def test_containment_catches_truncation_plants(spark, sf_dir):
    """Every recalled planted truncation must score as a near-perfect
    containment of the copy (id+100000, the first 4/5 of the text) in its
    original, regardless of what its symmetric jaccard is."""
    out = plans.QUERIES["dedup_containment"](spark, sf_dir).toPandas()
    planted = out[(out.id_b - out.id_a) == 100000]
    assert len(planted) >= 80  # bounded by LSH recall ~0.95 of ~100 plants
    assert (planted.cont_b_in_a >= 0.9).all()


def test_minhash_estimate_tracks_true_jaccard(spark, sf_dir):
    """The signature estimator must land near the exact jaccard on the
    planted ~0.75 truncation pairs: with 15 hashes the estimator's sd is
    sqrt(j(1-j)/15) ~ 0.11, so individual estimates stay in a wide band and
    the planted-pair mean stays in a tight one."""
    est = plans.QUERIES["dedup_minhash_estimate"](spark, sf_dir).toPandas()
    planted = est[(est.id_b - est.id_a) == 100000]
    assert len(planted) >= 80  # LSH recall ~0.95 on ~100 planted pairs
    assert (planted.est_jaccard >= 0.4).all()
    assert 0.6 <= planted.est_jaccard.mean() <= 0.9


def test_jaccard_scores_planted_pairs_high(spark, sf_dir):
    pairs = plans.QUERIES["dedup_ngram_jaccard"](spark, sf_dir).toPandas()
    planted = pairs[(pairs.id_b - pairs.id_a) == 100000]
    assert len(planted) >= 80  # ~100 planted truncations
    assert (planted.jaccard >= 0.4).all()


def test_levenshtein_pairs_with_candidates(spark, sf_dir):
    """The candidates= path must score exactly the supplied pairs (the LSH
    blocking contract) and agree with the all-pairs path on them."""
    from spark_streaming_kafka_example_spark.operators import dedup as DD

    heads = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", F.element_at(F.split("text", " "), 1).alias("head"))
    )
    sh = DD.doc_shingles(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60),
        distinct=False,
    )
    cands = DD.lsh_candidate_pairs(DD.minhash_signatures(sh))
    restricted = DD.levenshtein_pairs(
        heads, key_col="head", max_dist=2, candidates=cands
    ).toPandas()
    full = DD.levenshtein_pairs(heads, key_col="head", max_dist=2).toPandas()
    cand_set = set(map(tuple, cands.toPandas().to_numpy()))
    full_map = {(r.id_a, r.id_b): r.dist for r in full.itertuples()}
    got = {(r.id_a, r.id_b): r.dist for r in restricted.itertuples()}
    assert set(got) == {p for p in full_map if p in cand_set}
    assert all(full_map[p] == d for p, d in got.items())


def test_star_components_match_propagation_on_dup_graph(spark, sf_dir):
    """large-star/small-star must produce exactly the propagation loop's
    clustering on the real jaccard pair graph (both label every node with
    its component minimum)."""
    from spark_streaming_kafka_example_spark.operators.components import (
        connected_components,
        connected_components_star,
    )
    from spark_streaming_kafka_example_spark.plans.llm import jaccard_pair_graph

    pairs = jaccard_pair_graph(spark, sf_dir).localCheckpoint()
    prop = connected_components(pairs).toPandas()
    star = connected_components_star(pairs).toPandas()
    assert len(prop) > 0
    assert (
        dict(zip(prop.node, prop.cluster_id))
        == dict(zip(star.node, star.cluster_id))
    )


def test_star_components_converge_on_long_chain(spark):
    """The point of the star algorithm: a 300-node path has diameter 300,
    far beyond the round budget min-label propagation gets here — the
    star alternation must still converge (O(log^2 n) rounds) and label the
    whole chain with node 0."""
    from spark_streaming_kafka_example_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "id_a long, id_b long"
    )
    out = connected_components_star(chain, max_iterations=15).toPandas()
    assert len(out) == 301
    assert (out.cluster_id == 0).all()
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=5)


def test_simhash_exact_copies_have_zero_hamming(spark, sf_dir):
    fp = plans.QUERIES["dedup_simhash_fingerprints"](spark, sf_dir).toPandas()
    by_id = dict(zip(fp.doc_id, fp.simhash))
    for d in range(0, 500, 7):
        assert by_id[d] == by_id[d + 200000]


def test_embedding_cosine_finds_planted_vectors(spark, sf_dir):
    pairs = plans.QUERIES["dedup_embedding_cosine"](spark, sf_dir).toPandas()
    hits = set(zip(pairs.id_a, pairs.id_b))
    for v in range(0, 500, 10):
        assert (v, v + 100000) in hits


def test_cosine_pandas_bit_identical_to_expression(spark, sf_dir):
    """cosine_pandas accumulates sequentially over dims, so it must equal
    the F.aggregate fold expression to the LAST ULP (no rounding): that
    exact-fold property is what lets oracle-parity queries use the fast
    numpy path without data-dependent round(4) boundary flips (r03
    ADVICE)."""
    from spark_streaming_kafka_example_spark.functions.vectors import (
        cosine,
        cosine_pandas,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select((F.col("vec_id")).alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).limit(5000)
    diff = (
        pairs.select(
            cosine("va", "vb").alias("expr_cos"),
            cosine_pandas("va", "vb").alias("np_cos"),
        )
        .filter(F.col("expr_cos") != F.col("np_cos"))
        .count()
    )
    assert diff == 0


def test_ivf_recall_on_clustered_vectors(spark):
    """On clusterable data (IVF's actual use case) probing the nearest
    bucket must recover the exact top-1. The sf embeddings are uniform
    random — adversarial for any ANN — so clusters are synthesized here;
    the sim_ivf_topk oracle query still pins the exact approximate result
    on the random data."""
    import random

    from spark_streaming_kafka_example_spark.operators.similarity import ivf_topk

    rng = random.Random(7)
    protos = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(3)]
    rows = []
    for i in range(90):
        p = protos[i % 3]
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in p]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = emb.filter(F.col("vec_id") < 3)  # one per cluster
    queries = emb.filter(F.col("vec_id").isin(10, 11, 12))
    exact = brute_force_topk(emb, queries, k=1).toPandas()
    approx = ivf_topk(emb, queries, centroids, k=1, n_probe=1).toPandas()
    exact_top1 = exact.set_index("q_id").n_id.to_dict()
    approx_top1 = approx.set_index("q_id").n_id.to_dict()
    assert exact_top1 == approx_top1


def test_kmeans_ivf_recall_vs_bruteforce(spark):
    """Learned (k-means) centroids must give the trained-IVF path real
    recall: on clustered data, k-means from arbitrary init + n_probe=1
    recovers the exact top-1 for every query (VERDICT r1 'missing' #3)."""
    import random

    from spark_streaming_kafka_example_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    rng = random.Random(11)
    protos = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(3)]
    rows = []
    for i in range(90):
        p = protos[i % 3]
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in p]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # init = 3 lowest ids (one per cluster by construction i%3); 2 Lloyd
    # rounds pull them to the cluster means
    cent = kmeans_centroids(emb, k=3, iterations=2).select(
        F.col("cent_id").alias("vec_id"), F.col("cv").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id").isin(10, 11, 12, 40, 41, 42))
    exact = brute_force_topk(emb, queries, k=1).toPandas()
    approx = ivf_topk(emb, queries, cent, k=1, n_probe=1).toPandas()
    assert (
        exact.set_index("q_id").n_id.to_dict()
        == approx.set_index("q_id").n_id.to_dict()
    )
    # and the learned centroids sit near the true prototypes
    got = {r.cent_id: list(r.cv) for r in cent.withColumnRenamed(
        "vec_id", "cent_id").withColumnRenamed("embedding", "cv").collect()}
    for cv in got.values():
        best = min(
            sum((a - b) ** 2 for a, b in zip(cv, p)) for p in protos
        )
        assert best < 0.01


def test_multimodal_stub_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    blobs = attach_blob(docs)
    assert dict(blobs.dtypes)["content"] == "binary"
    feats = decode_features(blobs, fake=True).toPandas()
    assert len(feats) == 20
    assert all(len(f) == FEATURE_DIM for f in feats.features)
    assert (feats.n_bytes > 0).all()


def test_multimodal_real_decode_rejects_non_images(spark, sf_dir):
    """The real (non-fake) path decodes actual image bytes; text payloads
    must fail loudly, not produce garbage features."""
    docs = load_table(spark, sf_dir, "documents").limit(1)
    blobs = attach_blob(docs)
    with pytest.raises(Exception) as exc:
        decode_features(blobs, fake=False).collect()
    assert "unrecognized image payload" in str(exc.value)


def _gradient_image(h, w, c, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, num=h * w * c).reshape(h, w, c)
    return ((base + rng.integers(0, 16, size=(h, w, c))) % 256).astype(np.uint8)


def test_imaging_codec_roundtrip_and_filters():
    """PNG round-trip plus decode of hand-filtered scanlines (Sub/Up/
    Average/Paeth), and PPM round-trip — the codec the real path rides."""
    import struct
    import zlib

    import numpy as np

    from spark_streaming_kafka_example_spark.functions import imaging as I

    for c in (1, 3, 4):
        arr = _gradient_image(7, 11, c)
        assert (I.decode_image(I.encode_png(arr)) == arr).all()
    rgb = _gradient_image(6, 9, 3)
    assert (I.decode_image(I.encode_ppm(rgb)) == rgb).all()
    gray = _gradient_image(6, 9, 1)[:, :, 0]
    assert (I.decode_image(I.encode_ppm(gray))[:, :, 0] == gray).all()

    # Re-filter each scanline with filter type y%5 (the encoder's inverse),
    # rebuild the PNG by hand, and require bit-exact reconstruction.
    arr = _gradient_image(10, 8, 3, seed=9)
    h, w, c = arr.shape
    flat = arr.reshape(h, w * c).astype(np.int16)
    raw = bytearray()
    for y in range(h):
        ftype = y % 5
        line = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(w * c, dtype=np.int16)
        left = np.concatenate([np.zeros(c, dtype=np.int16), line[:-c]])
        upleft = np.concatenate([np.zeros(c, dtype=np.int16), prev[:-c]])
        if ftype == 0:
            out = line
        elif ftype == 1:
            out = line - left
        elif ftype == 2:
            out = line - prev
        elif ftype == 3:
            out = line - ((left + prev) >> 1)
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = line - pred
        raw.append(ftype)
        raw.extend((out & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + I._png_chunk(b"IHDR", ihdr)
        + I._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + I._png_chunk(b"IEND", b"")
    )
    assert (I.decode_image(png) == arr).all()


def test_audio_codec_roundtrip_and_features():
    """WAV 16-bit round-trip (mono + stereo), 8-bit decode, compressed
    rejection, and the spectral feature: a pure tone must put its energy in
    the band containing the tone frequency."""
    import struct

    import numpy as np

    from spark_streaming_kafka_example_spark.functions import audio as A

    t = np.arange(8000) / 8000.0
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    back, rate = A.decode_wav(A.encode_wav(mono, 8000))
    assert rate == 8000 and back.shape == (8000, 1)
    assert np.abs(back[:, 0] - mono).max() < 1e-4  # 16-bit quantization
    stereo = np.stack([mono, -mono], axis=1)
    back2, _ = A.decode_wav(A.encode_wav(stereo, 8000))
    assert back2.shape == (8000, 2)
    assert np.abs(back2 - stereo).max() < 1e-4
    # 8-bit path: header says bits=8, unsigned bytes around 128
    pcm8 = (np.clip(mono, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav8 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm8)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm8)) + pcm8
    )
    back8, _ = A.decode_wav(wav8)
    assert np.abs(back8[:, 0] - mono).max() < 2e-2  # 8-bit quantization
    with pytest.raises(ValueError, match="compressed"):
        bad = wav8.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 85, 1), 1)
        A.decode_wav(bad)
    # tone at 440 Hz of 4000 Hz nyquist -> band 0 of 8 holds ~all power
    feats = A.band_energies(back, bins=8)
    assert feats[0] > 0.95 and abs(sum(feats) - 1.0) < 1e-9
    # higher tone lands in a higher band: 3,500 Hz -> band 7
    hi = 0.5 * np.sin(2 * np.pi * 3500 * t)
    assert A.band_energies(hi[:, None], bins=8)[7] > 0.95


def test_multimodal_audio_decode_end_to_end(spark):
    """In-test-generated WAV tones through the REAL audio decode path on
    mapInPandas: per-row features must equal the locally computed band
    energies, and the tone's band must dominate."""
    import numpy as np
    from pyspark.sql import types as T

    from spark_streaming_kafka_example_spark.functions import audio as A
    from spark_streaming_kafka_example_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_features,
    )

    t = np.arange(4000) / 8000.0
    tones = {1: 440.0, 2: 1900.0, 3: 3600.0}
    wavs = {
        k: A.encode_wav(0.4 * np.sin(2 * np.pi * hz * t), 8000)
        for k, hz in tones.items()
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in wavs.items()],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    out = decode_features(df, media="audio").toPandas().set_index("doc_id")
    for k, hz in tones.items():
        local = A.band_energies(A.decode_wav(wavs[k])[0], FEATURE_DIM)
        got = list(out.loc[k, "features"])
        assert got == pytest.approx(local, abs=1e-12)
        expected_band = min(int(hz / (4000.0 / FEATURE_DIM)), FEATURE_DIM - 1)
        assert got[expected_band] == max(got)
        assert out.loc[k, "n_bytes"] == len(wavs[k])


def test_multimodal_permissive_decode_modes(spark):
    """A corrupt blob among good ones: on_error='fail' fails the job,
    'null' keeps the row with NULL features, 'skip' drops it — good rows
    decode identically in every mode (from_json-mode analog for media)."""
    import numpy as np
    from pyspark.sql import types as T
    from pyspark.sql.utils import PythonException

    from spark_streaming_kafka_example_spark.functions import imaging as I
    from spark_streaming_kafka_example_spark.operators.multimodal import (
        decode_features,
    )

    rows = [
        (1, bytearray(I.encode_png(_gradient_image(6, 6, 3)))),
        (2, bytearray(b"NOT AN IMAGE AT ALL")),
        (3, bytearray(I.encode_png(_gradient_image(4, 4, 1)))),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    with pytest.raises(PythonException, match="unrecognized image payload"):
        decode_features(df).count()
    nulled = decode_features(df, on_error="null").toPandas().set_index("doc_id")
    assert nulled.loc[2, "features"] is None
    assert len(nulled) == 3 and nulled.loc[1, "features"] is not None
    skipped = decode_features(df, on_error="skip").toPandas()
    assert sorted(skipped.doc_id) == [1, 3]
    good = nulled.drop(2)
    assert all(
        list(good.loc[k, "features"])
        == list(skipped.set_index("doc_id").loc[k, "features"])
        for k in (1, 3)
    )
    # resize shares the contract
    from pyspark.sql import functions as SF

    from spark_streaming_kafka_example_spark.operators.multimodal import (
        MEDIA_META_SCHEMA,
        resize_media,
    )

    with_meta = df.withColumn(
        "meta",
        SF.from_json(
            SF.lit('{"mime":"image/png","width":6,"height":6,"duration_ms":0}'),
            MEDIA_META_SCHEMA,
        ),
    )
    rz = resize_media(with_meta, width=3, height=3, on_error="skip").toPandas()
    assert sorted(rz.doc_id) == [1, 3]
    rz_null = resize_media(with_meta, width=3, height=3, on_error="null").toPandas()
    assert len(rz_null) == 3
    assert rz_null.set_index("doc_id").loc[2, "content"] is None


def test_multimodal_real_decode_end_to_end(spark):
    """In-test-generated PNG/PPM images through the REAL decode path on
    both mapInPandas and mapInArrow: features must equal the locally
    computed luminance histogram (VERDICT r1 'what's missing' #2)."""
    import numpy as np
    from pyspark.sql import types as T

    from spark_streaming_kafka_example_spark.functions import imaging as I
    from spark_streaming_kafka_example_spark.operators.multimodal import (
        decode_features_arrow,
        resize_media,
    )

    imgs = {
        1: I.encode_png(_gradient_image(16, 12, 3)),
        2: I.encode_png(_gradient_image(5, 5, 1)),
        3: I.encode_ppm(_gradient_image(8, 8, 3)),
    }
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    rows = [
        (i, blob, {"mime": "image/png", "width": 0, "height": 0, "duration_ms": 0})
        for i, blob in imgs.items()
    ]
    blobs = spark.createDataFrame(rows, schema)

    for decoder in (decode_features, decode_features_arrow):
        feats = decoder(blobs, fake=False).toPandas().set_index("doc_id")
        for i, blob in imgs.items():
            expected = I.intensity_histogram(I.decode_image(blob), FEATURE_DIM)
            assert np.allclose(list(feats.loc[i, "features"]), expected), decoder
            assert feats.loc[i, "n_bytes"] == len(blob)

    resized = resize_media(blobs, width=6, height=4, fake=False).toPandas()
    for _, row in resized.iterrows():
        out = I.decode_image(bytes(row.content))
        assert out.shape[:2] == (4, 6)
        assert row.meta["width"] == 6 and row.meta["height"] == 4
        expected = I.resize_nearest(I.decode_image(imgs[row.doc_id]), 6, 4)
        assert (out == expected).all()


def test_asof_join_matches_pandas_merge_asof(spark, sf_dir):
    """Cross-check the windowed-union as-of composition against pandas."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").toPandas()
    purchases = ev[ev.event_type == "purchase"].sort_values("ts")
    clicks = ev[ev.event_type == "click"].sort_values("ts")
    expected = pd.merge_asof(
        purchases[["event_id", "user_id", "ts"]],
        clicks[["user_id", "ts"]].rename(columns={"ts": "ts_click"}),
        left_on="ts",
        right_on="ts_click",
        by="user_id",
    )
    actual = (
        plans.QUERIES["asof_purchase_last_click"](spark, sf_dir)
        .select("event_id", "ts_click")
        .toPandas()
    )
    merged = expected.merge(actual, on="event_id", suffixes=("_exp", "_act"))
    same = (
        merged.ts_click_exp.isna() & merged.ts_click_act.isna()
    ) | (merged.ts_click_exp == merged.ts_click_act)
    assert same.all()


def test_asof_tolerance_exact_microsecond_boundary(spark):
    """Tolerance freshness must compare EXACT timestamps (r06 ADVICE): an
    age of 1800.5s (whole-second difference 1800 but true age > 1800)
    nulls out, an age of exactly 1800.0s matches, and 1799.5s matches —
    identical to DuckDB's ``c.ts >= p.ts - INTERVAL 30 MINUTE`` and
    pd.merge_asof(tolerance=...). The pre-fix cast('long') truncation kept
    the 1800.5s pair."""
    import datetime as dt

    from spark_streaming_kafka_example_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1, 12, 0, 0, 500_000)  # left carries .5s frac
    left = spark.createDataFrame(
        [(k, base, k) for k in (1, 2, 3)], "user_id int, ts timestamp, event_id int"
    )
    right = spark.createDataFrame(
        [
            (1, base - dt.timedelta(seconds=1800.5), 10.0),  # too old by .5s
            (2, base - dt.timedelta(seconds=1800.0), 20.0),  # boundary: keeps
            (3, base - dt.timedelta(seconds=1799.5), 30.0),  # fresh: keeps
        ],
        "user_id int, ts timestamp, value double",
    )
    out = {
        r["user_id"]: r["value_right"]
        for r in asof_join(
            left, right, key="user_id", right_cols=("value",),
            tolerance_seconds=1800,
        ).collect()
    }
    assert out == {1: None, 2: 20.0, 3: 30.0}


def test_multimodal_frame_sampling(spark, sf_dir):
    """One-to-many frame extraction keeps ids/order deterministic and
    frames slice the source bytes."""
    from spark_streaming_kafka_example_spark.operators.multimodal import (
        attach_blob,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents").limit(5)
    blobs = attach_blob(docs)
    frames = sample_frames(blobs, every_nth=4, frame_bytes=16, fake=True).toPandas()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(frames.doc_id) <= set(texts)
    for _, row in frames.iterrows():
        raw = texts[row.doc_id].encode("utf-8")
        assert row.frame_no % 4 == 0
        start = row.frame_no * 16
        assert bytes(row.frame) == raw[start : start + 16]


def test_multimodal_resize_contract(spark, sf_dir):
    """Fake resize rewrites content to width*height bytes and the metadata
    to the target dims; the real path refuses non-image payloads."""
    from spark_streaming_kafka_example_spark.operators.multimodal import (
        attach_blob,
        resize_media,
    )

    docs = load_table(spark, sf_dir, "documents").limit(8)
    blobs = attach_blob(docs)
    out = resize_media(blobs, width=8, height=2, fake=True).toPandas()
    texts = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    assert len(out) == 8
    for _, row in out.iterrows():
        assert bytes(row.content) == texts[row.doc_id][:16]
        assert row.meta["width"] == 8 and row.meta["height"] == 2
    with pytest.raises(Exception) as exc:
        resize_media(blobs, fake=False).collect()
    assert "unrecognized image payload" in str(exc.value)


def test_salted_join_matches_plain_join(spark, sf_dir):
    """salted_join == plain join for inner and left (including unmatched
    fact keys surviving the left join with nulls)."""
    from pyspark.sql import functions as F

    from spark_streaming_kafka_example_spark.operators.salting import salted_join

    ev = load_table(spark, sf_dir, "events")
    # restrict dim so some fact keys miss (exercises null-preserving left)
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    for how in ("inner", "left"):
        plain = ev.join(dim, "user_id", how).select(
            "event_id", "user_id", "c_mktsegment"
        )
        salted = salted_join(ev, dim, key="user_id", salt_buckets=4, how=how).select(
            "event_id", "user_id", "c_mktsegment"
        )
        assert plain.exceptAll(salted).count() == 0
        assert salted.exceptAll(plain).count() == 0

    with pytest.raises(ValueError):
        salted_join(ev, dim, key="user_id", how="full_outer")


def test_connected_components_transitive_chains(spark):
    """Chains merge transitively ((1-2),(2-3),(3-4) -> one cluster labeled
    1), disjoint edges stay separate, and convergence handles a long path
    (diameter > 2)."""
    from spark_streaming_kafka_example_spark.operators.components import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)],
        "id_a long, id_b long",
    )
    got = {
        r.node: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20, 24: 20,
    }


def test_mapinarrow_decode_matches_mapinpandas(spark, sf_dir):
    """The Arrow-native decode path produces byte-identical features to the
    mapInPandas path (same Arrow batches, no pandas hop)."""
    from spark_streaming_kafka_example_spark.operators.multimodal import (
        attach_blob,
        decode_features,
        decode_features_arrow,
    )

    blobs = attach_blob(load_table(spark, sf_dir, "documents").limit(50))
    a = decode_features(blobs, fake=True).toPandas().set_index("doc_id")
    b = decode_features_arrow(blobs, fake=True).toPandas().set_index("doc_id")
    assert sorted(a.index) == sorted(b.index)
    for doc_id in a.index:
        assert a.loc[doc_id, "n_bytes"] == b.loc[doc_id, "n_bytes"]
        assert list(a.loc[doc_id, "features"]) == list(b.loc[doc_id, "features"])


def test_ivf_materialized_index_matches_inline(spark, sf_dir, tmp_path):
    """The materialized IVF index (bucket-partitioned parquet) returns the
    inline ivf_topk results exactly, and the probe scan is partition-pruned
    to the probed buckets."""
    from pyspark.sql import functions as F

    from spark_streaming_kafka_example_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0)
    queries = emb.filter(F.col("vec_id") < 5)

    idx = str(tmp_path / "ivf_index")
    build_ivf_index(emb, centroids, idx)

    inline = ivf_topk(emb, queries, centroids, k=5, n_probe=2)
    indexed = ivf_topk_indexed(spark, idx, queries, centroids, k=5, n_probe=2)
    cols = ["q_id", "n_id", "cos", "rnk"]
    assert inline.select(*cols).exceptAll(indexed.select(*cols)).count() == 0
    assert indexed.select(*cols).exceptAll(inline.select(*cols)).count() == 0

    plan = indexed._jdf.queryExecution().executedPlan().toString()
    pruned = [l for l in plan.splitlines()
              if "PartitionFilters:" in l and "dynamicpruning" in l.lower()
              or "PartitionFilters: [isnotnull(bucket" in l]
    assert pruned or "bucket" in plan.split("PartitionFilters:")[-1].splitlines()[0]


def test_pii_scrub_redacts_and_counts(spark):
    """scrub_pii must replace every email/ssn/ip occurrence with its
    placeholder and pii_counts must count matches on the original text."""
    from spark_streaming_kafka_example_spark.functions.text import (
        pii_counts,
        scrub_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "write to a.user+x@mail.example.org or 10.1.2.3 today"),
            (2, "ssn 123-45-6789 and again 987-65-4321."),
            (3, "nothing sensitive here"),
        ],
        "id long, text string",
    )
    counts = pii_counts("text")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            counts["email"].alias("n_email"),
            counts["ssn"].alias("n_ssn"),
            counts["ip"].alias("n_ip"),
            scrub_pii("text").alias("clean"),
        ).collect()
    }
    assert (out[1]["n_email"], out[1]["n_ip"]) == (1, 1)
    assert out[1]["clean"] == "write to <EMAIL> or <IP> today"
    assert out[2]["n_ssn"] == 2
    assert out[2]["clean"] == "ssn <SSN> and again <SSN>."
    assert out[3]["clean"] == "nothing sensitive here"


def test_connected_components_raises_when_diameter_exceeds_budget(spark):
    """A path graph of diameter 5 cannot converge in 3 total rounds (1
    fused + 2 looped): the operator must raise, never return wrong labels."""
    import pytest as _pytest

    from spark_streaming_kafka_example_spark.operators.components import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=3)
    with _pytest.raises(ValueError, match="max_iterations"):
        connected_components(chain, max_iterations=1)


def test_minhash_lsh_xxhash64_recalls_planted(spark, sf_dir):
    """The production hash path (xxhash64, no md5 string materialization)
    must keep the same LSH recall on the planted near-dups — signatures
    differ, blocking behavior doesn't."""
    from spark_streaming_kafka_example_spark.operators import dedup as DD
    from spark_streaming_kafka_example_spark.plans.llm import _near_corpus

    sh = DD.doc_shingles(_near_corpus(spark, sf_dir), distinct=False)
    sig = DD.minhash_signatures(sh, num_hashes=15, hash_fn="xxhash64")
    pairs = DD.lsh_candidate_pairs(sig, num_hashes=15, bands=5).toPandas()
    hits = set(zip(pairs.id_a, pairs.id_b))
    planted = [(d, d + 100000) for d in range(0, 500, 5)]
    recall = sum((a, b) in hits for a, b in planted) / len(planted)
    assert recall >= 0.8, f"xxhash64 LSH recall {recall}"


def test_simhash_xxhash64_zero_hamming_on_copies(spark, sf_dir):
    """The production simhash hash path must still give identical
    fingerprints (hamming 0) for exact-copy documents."""
    from spark_streaming_kafka_example_spark.operators import dedup as DD
    from spark_streaming_kafka_example_spark.plans.llm import _exact_corpus

    fp = DD.simhash_fingerprints(_exact_corpus(spark, sf_dir), hash_fn="xxhash64")
    pairs = DD.simhash_near_pairs(fp, max_hamming=0).toPandas()
    hits = set(zip(pairs.id_a, pairs.id_b))
    planted = [(d, d + 200000) for d in range(0, 500, 7)]
    assert all((a, b) in hits for a, b in planted)


def test_pii_regex_equivalence_spark_vs_duckdb(spark):
    """The PII patterns live in the Java-regex/RE2 common subset by
    contract; property-check it: on adversarial strings (pattern
    fragments, separators, unicode-free noise) both engines must agree on
    match counts AND the scrubbed output bytes."""
    import random

    import duckdb

    from spark_streaming_kafka_example_spark.functions.text import (
        PII_PATTERNS,
        pii_counts,
        scrub_pii,
    )

    rng = random.Random(20260813)
    frags = [
        "a@b.co", "x.y+z@mail.example.org", "@@", "a@b", "1.2.3.4",
        "999.999.999.999", "12.34.56", "123-45-6789", "123-456-789",
        "12-34-5678", "user%x@ex.io", "a-b@c-d.net", ".@.", "a@.com",
        "0.0.0.0x", "...", "-", " ", "word", "a_b@c.de9",
    ]
    texts = [
        " ".join(rng.choices(frags, k=rng.randint(1, 12))) for _ in range(200)
    ]
    counts = pii_counts("text")
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = (
        sdf.select(
            "id",
            counts["email"].alias("ne"),
            counts["ssn"].alias("ns"),
            counts["ip"].alias("ni"),
            scrub_pii("text").alias("clean"),
        )
        .orderBy("id")
        .collect()
    )
    con = duckdb.connect()
    pats = {kind: pat for kind, pat, _ in PII_PATTERNS}
    for row, text in zip(got, texts):
        exp = con.execute(
            """
            SELECT len(regexp_extract_all(?, ?)),
                   len(regexp_extract_all(?, ?)),
                   len(regexp_extract_all(?, ?)),
                   regexp_replace(regexp_replace(regexp_replace(
                       ?, ?, '<EMAIL>', 'g'), ?, '<SSN>', 'g'), ?, '<IP>', 'g')
            """,
            [text, pats["email"], text, pats["ssn"], text, pats["ip"],
             text, pats["email"], pats["ssn"], pats["ip"]],
        ).fetchone()
        assert (row.ne, row.ns, row.ni, row.clean) == exp, (
            f"divergence on {text!r}: spark={(row.ne, row.ns, row.ni, row.clean)} "
            f"duckdb={exp}"
        )


def test_zorder_guards(spark):
    """z_value must refuse bit widths that would wrap JVM shiftleft mod 64
    (silent Morton corruption), and zorder_layout must short-circuit on
    empty / all-NULL inputs instead of crashing on float(None)."""
    from pyspark.sql import functions as F

    from spark_streaming_kafka_example_spark.operators.zorder import (
        z_value,
        zorder_layout,
    )

    with pytest.raises(ValueError, match="<= 63"):
        z_value(["a", "b", "c", "d", "e", "f"], bits=12)  # 72 bits > 63

    df = spark.createDataFrame([], "a long, b long")
    assert zorder_layout(df, ["a", "b"]).count() == 0  # empty: unchanged

    nulls = spark.createDataFrame([(1, None), (2, None)], "a long, b long")
    assert zorder_layout(nulls, ["a", "b"]).count() == 2  # all-NULL col

    # NULL keys in a non-empty column bucket at the curve's low end
    # (deterministic layout) rather than producing NULL z-values.
    mixed = spark.createDataFrame(
        [(i, i if i % 3 else None) for i in range(1, 31)], "a long, b long"
    )
    assert zorder_layout(mixed, ["a", "b"], n_files=2).count() == 30


def test_pack_greedy_invariants(spark):
    """Greedy packing invariants on random shard/size data: per-sequence
    fill never exceeds cap (except a single oversized doc alone in its
    sequence), seq_ids are consecutive from 0 per shard, docs in a
    sequence are contiguous in order, and packing is greedy (a doc never
    starts a new sequence when it would have fit in the previous one)."""
    import random

    from spark_streaming_kafka_example_spark.operators.packing import pack_greedy

    rng = random.Random(7)
    cap = 100
    rows = []
    for shard in ["s0", "s1", "s2"]:
        for i in range(rng.randrange(30, 60)):
            rows.append((shard, i, rng.choice([3, 17, 40, 75, 99, 150])))
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    got = pack_greedy(df, cap=cap).collect()
    assert len(got) == len(rows)
    by_shard: dict = {}
    for r in got:
        by_shard.setdefault(r.source, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        fills: dict = {}
        for r in rs:
            fills[r.seq_id] = fills.get(r.seq_id, 0) + r.n_tok
        for seq, fill in fills.items():
            n_docs = sum(1 for r in rs if r.seq_id == seq)
            assert fill <= cap or n_docs == 1, (shard, seq, fill)
        seqs = [r.seq_id for r in rs]
        assert seqs == sorted(seqs), "docs in a sequence must be contiguous"
        assert sorted(set(seqs)) == list(range(max(seqs) + 1))
        # greedy: each new sequence starts only because of overflow
        for a, b in zip(rs, rs[1:]):
            if b.seq_id == a.seq_id + 1:
                prev_fill = fills[a.seq_id]
                assert prev_fill + b.n_tok > cap, (shard, b.doc_id)

    with pytest.raises(ValueError, match="cap"):
        pack_greedy(df, cap=0)


def test_semdedup_recovers_planted_copies(spark, sf_dir):
    """Every planted exact copy (vec_id + 100000) must be pruned by
    SemDeDup: identical vectors always share a cluster (deterministic
    argmax tie-break), so each plant forms a cos=1.0 intra-cluster pair
    with its original."""
    from spark_streaming_kafka_example_spark.plans import llm

    pairs = llm.dedup_semdedup(spark, sf_dir).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    emb_ids = {
        r.vec_id
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id").collect()
    }
    planted = {(v, v + 100000) for v in emb_ids if v % 10 == 0}
    missing = planted - got
    assert not missing, f"plants not pruned: {sorted(missing)[:5]}"
    for r in pairs:
        if (r.id_a, r.id_b) in planted:
            assert r.cos == 1.0


def test_chunk_windows_cover_all_tokens(spark, sf_dir):
    """Chunk-window invariants on the fixture corpus: chunk_ids are
    0..n_chunks-1 per doc, every chunk except possibly the last has
    exactly CHUNK_SIZE tokens, consecutive chunks overlap by
    SIZE - STRIDE tokens, and the union of chunks covers the doc."""
    from spark_streaming_kafka_example_spark.plans.textprep import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
        text_chunk_windows,
    )

    rows = text_chunk_windows(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        w = docs[doc_id]
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            start = c.chunk_id * _CHUNK_STRIDE
            expect = w[start : start + _CHUNK_SIZE]
            assert c.chunk.split(" ") == expect
            assert c.n_chunk_tok == len(expect)
        # coverage: last chunk reaches the end of the doc
        last = chunks[-1]
        assert last.chunk_id * _CHUNK_STRIDE + last.n_chunk_tok == len(w)


@pytest.mark.parametrize("seed", [3, 4])
def test_pack_greedy_matches_python_reference(spark, seed):
    """Distributed greedy packing == the sequential reference fold, for
    random sizes/caps/shards (beyond the invariants test: exact seq_id
    equality against an independent implementation)."""
    import random

    from spark_streaming_kafka_example_spark.operators.packing import pack_greedy

    rng = random.Random(seed)
    cap = rng.choice([50, 128, 300])
    rows = []
    for shard in range(4):
        for i in range(rng.randrange(10, 50)):
            rows.append((f"s{shard}", i, rng.randrange(1, cap + 40)))
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    got = {
        (r.source, r.doc_id): r.seq_id
        for r in pack_greedy(df, cap=cap).collect()
    }
    expect = {}
    by_shard: dict = {}
    for s, d, n in rows:
        by_shard.setdefault(s, []).append((d, n))
    for s, docs in by_shard.items():
        seq, fill = 0, 0
        for d, n in sorted(docs):
            if fill > 0 and fill + n > cap:
                seq, fill = seq + 1, 0
            expect[(s, d)] = seq
            fill += n
    assert got == expect


def test_ivf_recall_bound(spark, sf_dir):
    """sim_ivf_recall's documented quality bound: with k-means-trained
    centroids and n_probe=2 the mean recall@5 over the fixture queries
    stays >= 0.8 (measured 0.88 sf0.001 / 0.92 sf0.01; stride centroids
    manage only ~0.5). Keeps the approximation claim a measured number,
    not prose."""
    from spark_streaming_kafka_example_spark import plans

    plans.load_all()
    rows = plans.QUERIES["sim_ivf_recall"](spark, sf_dir).collect()
    assert rows, "recall query returned no queries"
    recalls = [r.recall for r in rows]
    assert all(0.0 <= r <= 1.0 for r in recalls)
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_clustered_recall_bound_and_tier_order(spark, sf_dir):
    """r15 (r12 VERDICT task 4): on the deterministic CLUSTERED corpus —
    where quantization error sits far below the 64-combo cluster structure
    — the quantized tiers genuinely recover true neighbors: IVF-PQ mean
    recall@5 >= 0.8 (measured 1.0 at sf0.001/sf0.01, vs 0.2-0.4 on the
    uniform fixtures where a broken ranker scores the same), and the tier
    ordering sq8 >= ivfpq >= raw-pq holds. Both inequalities are
    structural here, not sampled: every query's true top-5 are same-combo
    members of its own (probed) coarse bucket, so restricting candidates
    to probed buckets can only REMOVE false competitors (ivfpq >= pq),
    and 4x scalar quantization perturbs a duplicate's cosine only
    quadratically, below the round(4) grid (sq8 ~ exact)."""
    from pyspark.sql import functions as F

    from spark_streaming_kafka_example_spark import plans
    from spark_streaming_kafka_example_spark.operators.similarity import (
        brute_force_topk,
    )
    from spark_streaming_kafka_example_spark.plans import llm

    plans.load_all()
    corpus = llm._clustered_corpus(spark, sf_dir).localCheckpoint()
    queries = corpus.filter(F.col("vec_id") < 5)
    k = llm._PQ_RECALL_K

    def topk_sets(ranked_corpus):
        out: dict = {}
        for r in brute_force_topk(ranked_corpus, queries, k=k).collect():
            out.setdefault(r.q_id, set()).add(r.n_id)
        return out

    brute = topk_sets(corpus)
    pq = topk_sets(llm._pq_reconstruction(corpus))
    v = F.col("embedding")
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-12)
    )
    sq8 = topk_sets(
        corpus.select(
            "vec_id",
            F.transform(
                v,
                lambda x: F.round(F.lit(llm._QUANT_LEVELS) * x / scale)
                * scale / llm._QUANT_LEVELS,
            ).alias("embedding"),
        )
    )

    def mean_recall(approx: dict) -> float:
        return sum(
            len(brute[q] & approx.get(q, set())) / k for q in brute
        ) / len(brute)

    ivfpq_rows = plans.QUERIES["sim_ivfpq_clustered_recall"](
        spark, sf_dir
    ).collect()
    assert len(ivfpq_rows) == 5
    ivfpq_mean = sum(r.recall for r in ivfpq_rows) / len(ivfpq_rows)
    pq_mean, sq8_mean = mean_recall(pq), mean_recall(sq8)
    assert ivfpq_mean >= 0.8, (ivfpq_mean, ivfpq_rows)
    assert sq8_mean >= ivfpq_mean >= pq_mean, (sq8_mean, ivfpq_mean, pq_mean)

    # The discrimination claim as a measured number: a broken ranker
    # (ignore the query, return the lowest vec_ids) scores ~0 on the SAME
    # corpus where the real tiers score ~1 — on the uniform fixtures both
    # land at ~0.2, indistinguishable. Query q's true neighbors are its
    # combo-cluster duplicates (vec_id = q + 64t), disjoint from the
    # naive prefix for every fixture query.
    naive = {
        q: {i for i in range(6) if i != q}  # exactly k non-self low ids
        for q in brute
    }
    naive_mean = mean_recall(naive)
    assert naive_mean <= 0.1 < ivfpq_mean, (naive_mean, ivfpq_mean)


def test_clustered_corpus_structure(spark, sf_dir):
    """The synthesis invariants the recall surface leans on: 64 distinct
    combo clusters of EXACT duplicates keyed by (v % 8, (v div 8) % 8),
    each with >= 5 non-self members at n=500, and vec_ids 0..7 covering
    all 8 prototypes in every subspace (the k-means seed-coverage
    property)."""
    from pyspark.sql import functions as F

    from spark_streaming_kafka_example_spark.plans import llm

    corpus = llm._clustered_corpus(spark, sf_dir)
    P = llm._CLUSTER_PROTOS
    combos = (
        corpus.groupBy(F.md5(F.col("embedding").cast("string")).alias("fp"))
        .agg(
            F.count("*").alias("n"),
            F.count_distinct(
                (F.col("vec_id") % P) * P
                + F.expr(f"vec_id div {P}") % P
            ).alias("n_keys"),
        )
        .collect()
    )
    assert len(combos) == P * P
    assert all(c.n_keys == 1 for c in combos)  # cluster == combo key
    assert all(c.n >= 6 for c in combos)  # >= 5 non-self duplicates
    for m in range(llm._PQ_M):
        digits = {((2 * m + 1) * v + m * (v // P)) % P for v in range(P)}
        assert digits == set(range(P))  # seed coverage per subspace


def test_pack_payload_never_exceeds_cap(spark, sf_dir):
    """Greedy no-straddle invariant on the materialized payload: a packed
    sequence never exceeds the cap unless a single oversized doc owns it,
    and the payload's whitespace token count equals tok_total."""
    from spark_streaming_kafka_example_spark import plans
    from spark_streaming_kafka_example_spark.plans.textprep import _PACK_CAP

    plans.load_all()
    rows = plans.QUERIES["pack_sequences_payload"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.tok_total <= _PACK_CAP or r.n_docs == 1, (
            r.source, r.seq_id, r.tok_total, r.n_docs)
        assert len(r.payload.split(" ")) == r.tok_total, (r.source, r.seq_id)


def test_split_assignment_properties(spark, sf_dir):
    """split_train_valid_test: every doc gets exactly one split, the split
    is a pure function of doc_id (stable across runs), and the held-out
    fractions land near their 3/256 targets."""
    from spark_streaming_kafka_example_spark import plans

    plans.load_all()
    a = plans.QUERIES["split_train_valid_test"](spark, sf_dir).toPandas()
    b = plans.QUERIES["split_train_valid_test"](spark, sf_dir).toPandas()
    assert a.doc_id.is_unique
    am = dict(zip(a.doc_id, a.split))
    assert am == dict(zip(b.doc_id, b.split))  # deterministic
    n = len(a)
    frac = a.split.value_counts() / n
    assert set(frac.index) <= {"train", "valid", "test"}
    assert frac.get("train", 0) > 0.9
    for held in ("valid", "test"):
        assert 0 < frac.get(held, 0) < 0.05, frac.to_dict()


def test_shuffle_training_order_properties(spark, sf_dir):
    """shuffle_training_order: ranks are contiguous 1..n within each shard,
    the permutation is deterministic, and it is not the identity order
    (i.e. it actually shuffles doc_id order)."""
    from spark_streaming_kafka_example_spark import plans

    plans.load_all()
    df = plans.QUERIES["shuffle_training_order"](spark, sf_dir).toPandas()
    assert df.doc_id.is_unique
    for shard, grp in df.groupby("shard"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1)), shard
        if len(grp) > 2:  # 1-2 docs can be coincidentally ordered
            ordered = grp.sort_values("rank").doc_id.tolist()
            assert ordered != sorted(ordered), f"shard {shard} not shuffled"


def test_export_shards_invariants(spark, sf_dir):
    """pipeline_export_shards: ranks contiguous 1..n per shard; every
    sequence respects the cap unless a single oversized doc owns it; the
    payload token count equals tok_total; and no valid/test doc leaks into
    the export (spot-check via the split query)."""
    from spark_streaming_kafka_example_spark import plans
    from spark_streaming_kafka_example_spark.plans.textprep import _PACK_CAP

    plans.load_all()
    df = plans.QUERIES["pipeline_export_shards"](spark, sf_dir).toPandas()
    assert len(df) > 0
    for shard, grp in df.groupby("shard"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1)), shard
    for r in df.itertuples():
        assert r.tok_total <= _PACK_CAP or r.n_docs == 1
        assert len(r.payload.split(" ")) == r.tok_total
    # leakage check: total exported tokens == train-split token count
    split = plans.QUERIES["split_train_valid_test"](spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").toPandas()
    train_ids = set(split[split.split == "train"].doc_id)
    expect_toks = sum(
        len(t.split(" ")) for d, t in zip(docs.doc_id, docs.text) if d in train_ids
    )
    assert df.tok_total.sum() == expect_toks


def test_quantize_int8_error_bound(spark, sf_dir):
    """sim_quantize_int8: codes stay in [-127, 127] and the realized max
    dequantization error respects the scale/254 symmetric-quantizer bound
    (half a quantization step) with float slack."""
    from spark_streaming_kafka_example_spark import plans

    plans.load_all()
    df = plans.QUERIES["sim_quantize_int8"](spark, sf_dir).toPandas()
    assert len(df) > 0
    for r in df.itertuples():
        codes = [int(c) for c in r.q.split(",")]
        assert all(-127 <= c <= 127 for c in codes), r.vec_id
        # + 5e-7: max_err is rounded to 6 decimals, which can round UP past
        # the exact bound by half an ulp of the rounding grid
        assert r.max_err <= r.scale / 254 * 1.0001 + 5e-7, r.vec_id


def test_repeated_spans_finds_planted_copies(spark, sf_dir):
    """Every reported span must repeat across >= 2 docs, and the planted
    exact copies guarantee spans with n_occ >= 2 exist; span occurrence
    counts must be >= doc counts."""
    from spark_streaming_kafka_example_spark import plans

    plans.load_all()
    df = plans.QUERIES["dedup_repeated_spans"](spark, sf_dir).toPandas()
    assert len(df) > 0
    assert (df.n_docs >= 2).all()
    assert (df.n_occ >= df.n_docs).all()


def test_langid_accuracy_structure(spark, sf_dir):
    """text_langid_accuracy: every fixture language appears, counts are
    consistent, and genuinely-English text is never misclassified
    (en acc == 1.0). Non-en rows carry English-vocabulary synthetic text,
    so their acc is expected to be 0 — the gate surfaces exactly that
    label/text disagreement (see the query docstring)."""
    from spark_streaming_kafka_example_spark import plans

    plans.load_all()
    df = plans.QUERIES["text_langid_accuracy"](spark, sf_dir).toPandas()
    assert set(df.lang) == {"en", "de", "es", "fr", "zh"}
    assert (df.n_correct <= df.n_docs).all()
    en = df[df.lang == "en"].iloc[0]
    assert en.acc == 1.0 and en.n_correct == en.n_docs


def test_islands_partition_user_days(spark, sf_dir):
    """islands_user_daily_tier: per user, the intervals are disjoint,
    ordered, cover exactly the user's active days (sum of n_days == number
    of distinct active days), and adjacent intervals never share a tier
    (same-tier consecutive days must have merged)."""
    from spark_streaming_kafka_example_spark import plans

    plans.load_all()
    df = plans.QUERIES["islands_user_daily_tier"](spark, sf_dir).toPandas()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .toPandas()
    )
    active = ev.groupby("user_id").d.nunique()
    for uid, grp in df.groupby("user_id"):
        ivs = grp.sort_values("start_day")
        assert (ivs.start_day <= ivs.end_day).all()
        assert ivs.n_days.sum() == active[uid]
        prev_end, prev_tier = None, None
        for r in ivs.itertuples():
            if prev_end is not None:
                assert r.start_day > prev_end, uid  # disjoint, ordered
                # adjacent (no gap of missing days between them) same-tier
                # runs must have merged; runs separated by inactive days
                # may legitimately repeat a tier
                gap_days = (r.start_day - prev_end).days
                if gap_days == 1:
                    assert r.tier != prev_tier, uid
            prev_end, prev_tier = r.end_day, r.tier


def test_zvalue_bits_roundtrip(spark):
    """z_value must be a true Morton interleave: de-interleaving the bits
    in Python recovers both inputs exactly for a seeded sweep of values
    across the full bit range."""
    import random

    from spark_streaming_kafka_example_spark.operators.zorder import z_value

    rng = random.Random(7)
    bits = 12
    rows = [(i, rng.randrange(0, 1 << bits), rng.randrange(0, 1 << bits))
            for i in range(200)]
    df = spark.createDataFrame(rows, "i long, a long, b long")
    got = {r["i"]: r["z"] for r in
           df.select("i", z_value(["a", "b"], bits=bits).alias("z")).collect()}
    for i, a, b in rows:
        z = got[i]
        da = sum(((z >> (k * 2)) & 1) << k for k in range(bits))
        db = sum(((z >> (k * 2 + 1)) & 1) << k for k in range(bits))
        assert (da, db) == (a, b), (i, a, b, z)


def test_bench_headline_names_registered():
    """bench.py silently skips HEADLINE names missing from the registry;
    this makes a typo or a renamed query loud instead."""
    import bench

    from spark_streaming_kafka_example_spark import plans

    plans.load_all()
    missing = [n for n in bench.HEADLINE if n not in plans.QUERIES]
    assert not missing, missing


def test_pagerank_hand_computed_triangle(spark):
    """pagerank on A->B, A->C, B->C must reproduce the hand-derived damped
    ranks (2 iterations, round-8 at each step, dangling C leaks mass)."""
    from spark_streaming_kafka_example_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    out = {r["node"]: r["pr"] for r in pagerank(edges, iterations=2).collect()}

    pr = dict.fromkeys("abc", round(1 / 3, 8))
    for _ in range(2):
        contrib = {
            "b": round(pr["a"] / 2, 8),
            "c": round(pr["a"] / 2 + pr["b"] / 1, 8),
        }
        pr = {
            n: round(0.15 / 3 + 0.85 * contrib.get(n, 0.0), 8) for n in "abc"
        }
    # 1e-7 tolerance: Python round() (banker's on binary doubles) and
    # Spark's HALF_UP BigDecimal round may differ in the 8th decimal; the
    # bit-exact replay contract is driver-checked by the SQL oracle.
    assert set(out) == set(pr)
    for n in pr:
        assert abs(out[n] - pr[n]) < 1e-7, (n, out[n], pr[n])
    assert sum(out.values()) < 1.0  # dangling-mass leak: sum < 1


def test_phash_real_images_behavior(spark):
    """Perceptual hashing on REAL decoded images (r08): identical content
    collides at hamming 0 across codecs, a lightly-perturbed copy stays
    within the near-dup threshold, an unrelated image does not, and dHash
    is exactly invariant to a global brightness shift."""
    import numpy as np

    from spark_streaming_kafka_example_spark.functions.imaging import (
        average_hash,
        decode_image,
        difference_hash,
        encode_png,
        encode_ppm,
    )
    from spark_streaming_kafka_example_spark.operators.dedup import (
        image_phash_fingerprints,
        phash_near_pairs,
    )

    def hamming(a: str, b: str) -> int:
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    rng = np.random.default_rng(5)
    base = rng.integers(30, 200, size=(32, 32, 3), dtype=np.int64).astype(np.uint8)
    near = base.copy()
    near[:2, :2] = 255  # a small corner stamp: same image to a human
    far = rng.integers(0, 256, size=(32, 32, 3), dtype=np.int64).astype(np.uint8)

    a_base = average_hash(base)
    assert len(a_base) == 16  # 64 bits as 16 hex chars
    # codec-independence: PNG and PPM round-trips hash identically
    assert average_hash(decode_image(encode_png(base))) == a_base
    assert average_hash(decode_image(encode_ppm(base))) == a_base
    assert hamming(a_base, average_hash(near)) <= 3
    assert hamming(a_base, average_hash(far)) > 10
    # dHash: gradient signs ignore a global brightness shift entirely
    shifted = (base.astype(np.int16) + 10).clip(0, 255).astype(np.uint8)
    assert difference_hash(shifted) == difference_hash(base)

    df = spark.createDataFrame(
        [
            (1, bytearray(encode_png(base))),
            (2, bytearray(encode_ppm(base))),   # exact dup, other codec
            (3, bytearray(encode_png(near))),   # near dup
            (4, bytearray(encode_png(far))),    # unrelated
        ],
        "doc_id long, content binary",
    )
    fp = image_phash_fingerprints(df)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_pairs(fp, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0          # cross-codec exact duplicate
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3
    assert not any(4 in p for p in pairs)  # the unrelated image pairs with nothing


def test_audio_envelope_hash_behavior(spark):
    """Envelope hashing on REAL decoded WAV (r08): identical clips collide
    at hamming 0, the hash is volume-invariant (envelope and threshold
    scale together), a lightly-edited clip stays near, and unrelated audio
    does not; the Spark pipeline finds exactly the planted pairs."""
    import numpy as np

    from spark_streaming_kafka_example_spark.functions.audio import (
        decode_wav,
        encode_wav,
        envelope_hash,
    )
    from spark_streaming_kafka_example_spark.operators.dedup import (
        audio_envelope_fingerprints,
        phash_near_pairs,
    )

    def hamming(a: str, b: str) -> int:
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    rng = np.random.default_rng(9)
    base = rng.uniform(-0.9, 0.9, size=1024)
    near = base.copy()
    near[:16] = 0.0  # clip the first window's content: tiny edit
    far = rng.uniform(-0.9, 0.9, size=1024)

    h_base = envelope_hash(decode_wav(encode_wav(base, 8000))[0])
    assert len(h_base) == 16
    # volume invariance: a quiet re-encode (x0.3) hashes identically
    h_quiet = envelope_hash(decode_wav(encode_wav(base * 0.3, 8000))[0])
    assert h_quiet == h_base
    assert hamming(h_base, envelope_hash(decode_wav(encode_wav(near, 8000))[0])) <= 3
    assert hamming(h_base, envelope_hash(decode_wav(encode_wav(far, 8000))[0])) > 10

    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(base, 8000))),
            (2, bytearray(encode_wav(base, 8000))),      # exact dup
            (3, bytearray(encode_wav(near, 8000))),      # near dup
            (4, bytearray(encode_wav(far, 8000))),       # unrelated
        ],
        "doc_id long, content binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_pairs(audio_envelope_fingerprints(df)).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3
    assert not any(4 in p for p in pairs)


@pytest.mark.parametrize("seed,hex_len,max_hamming", [(17, 16, 3), (18, 13, 2)])
def test_phash_banding_is_pigeonhole_complete(spark, seed, hex_len, max_hamming):
    """The Hamming-band candidate join must be COMPLETE: for random hex
    fingerprints (including planted near pairs), phash_near_pairs equals
    the brute-force all-pairs hamming filter exactly — no pair within the
    threshold may be lost to banding, including when hex_len doesn't
    divide evenly into max_hamming+1 chunks (uneven widths still
    partition the bits, so <= k differing bits leave >= 1 chunk clean)."""
    import random

    rng = random.Random(seed)
    fps = [(i, "".join(rng.choice("0123456789abcdef") for _ in range(hex_len)))
           for i in range(60)]
    # plant near-duplicates: flip <= max_hamming bits of some fingerprints
    for j in range(8):
        base_id, base = fps[j]
        bits = list(bin(int(base, 16))[2:].zfill(hex_len * 4))
        for pos in rng.sample(range(hex_len * 4), rng.randint(0, max_hamming)):
            bits[pos] = "1" if bits[pos] == "0" else "0"
        mutated = format(int("".join(bits), 2), f"0{hex_len}x")
        fps.append((100 + j, mutated))

    from spark_streaming_kafka_example_spark.operators.dedup import (
        phash_near_pairs,
    )

    df = spark.createDataFrame(fps, "doc_id long, phash string")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_pairs(
            df, hex_len=hex_len, max_hamming=max_hamming
        ).collect()
    }

    def hamming(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    exp = {
        (ia, ib): hamming(ha, hb)
        for ia, ha in fps
        for ib, hb in fps
        if ia < ib and hamming(ha, hb) <= max_hamming
    }
    assert got == exp, f"seed {seed}: banding lost/invented pairs"


def test_audio_scalogram_spectral_sensitivity_and_robustness(spark):
    """Haar-scalogram fingerprint (r09, the r08 VERDICT task-5 robust
    twin): (a) two clips with IDENTICAL loudness contours but different
    frequency content — a high-freq burst vs a period-4 wave, both
    |0.5| then silence — hash identically under the envelope (blind) but
    far apart under the scalogram; (b) exact volume scaling of decoded
    samples changes nothing (per-level relative threshold); (c) a 0.3x
    re-encode and a seeded white-noise perturbation stay within the
    pairing threshold; (d) unrelated audio stays far; (e) the Spark
    pipeline finds exactly the planted pairs."""
    import numpy as np

    from spark_streaming_kafka_example_spark.functions.audio import (
        decode_wav,
        encode_wav,
        envelope_hash,
        scalogram_hash,
    )
    from spark_streaming_kafka_example_spark.operators.dedup import (
        audio_spectral_fingerprints,
        phash_near_pairs,
    )

    def hamming(a: str, b: str) -> int:
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    n = 1024
    burst = np.zeros(n)
    burst[: n // 2] = 0.5 * np.where(np.arange(n // 2) % 2 == 0, 1, -1)
    wave4 = np.zeros(n)
    wave4[: n // 2] = 0.5 * np.where(np.arange(n // 2) % 4 < 2, 1, -1)
    d_burst = decode_wav(encode_wav(burst, 8000))[0]
    d_wave4 = decode_wav(encode_wav(wave4, 8000))[0]
    # the envelope cannot tell them apart; the scalogram must
    assert envelope_hash(d_burst) == envelope_hash(d_wave4)
    s_burst = scalogram_hash(d_burst)
    assert len(s_burst) == 16
    assert hamming(s_burst, scalogram_hash(d_wave4)) > 10

    # exact volume invariance on decoded samples (no re-quantization)
    assert scalogram_hash(d_burst * 0.5) == s_burst
    # re-encode at 0.3x volume: quantization noise only, stays pairable
    d_quiet = decode_wav(encode_wav(burst * 0.3, 8000))[0]
    assert hamming(scalogram_hash(d_quiet), s_burst) <= 3

    rng = np.random.default_rng(11)
    base = rng.uniform(-0.8, 0.8, size=n)
    noise = rng.uniform(-1 / 256, 1 / 256, size=n)
    far = rng.uniform(-0.8, 0.8, size=n)
    h_base = scalogram_hash(decode_wav(encode_wav(base, 8000))[0])
    h_noised = scalogram_hash(decode_wav(encode_wav(base + noise, 8000))[0])
    assert hamming(h_base, h_noised) <= 3  # white-noise-perturbed still pairs
    h_far = scalogram_hash(decode_wav(encode_wav(far, 8000))[0])
    assert hamming(h_base, h_far) > 10

    # stereo folds by channel mean; too-short clips fail loudly
    stereo = np.stack([base, far], axis=1)
    d_stereo = decode_wav(encode_wav(stereo, 8000))[0]
    assert scalogram_hash(d_stereo) == scalogram_hash(d_stereo.mean(axis=1))
    with pytest.raises(ValueError, match="too short"):
        scalogram_hash(np.zeros(255))

    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(base, 8000))),
            (2, bytearray(encode_wav(base, 8000))),          # exact dup
            (3, bytearray(encode_wav(base + noise, 8000))),  # noise-perturbed
            (4, bytearray(encode_wav(far, 8000))),           # unrelated
        ],
        "doc_id long, content binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_pairs(audio_spectral_fingerprints(df)).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3
    assert not any(4 in p for p in pairs)


def test_audio_envelope_stereo_and_short_clip(spark):
    """Channel handling + the too-short guard: a stereo clip hashes by its
    channel-mean signal (decode keeps (frames, 2), envelope_hash folds
    channels), a mono mixdown of the same content hashes IDENTICALLY, and
    a clip shorter than 64 windows raises instead of degrading."""
    import numpy as np
    import pytest as _pytest

    from spark_streaming_kafka_example_spark.functions.audio import (
        decode_wav,
        encode_wav,
        envelope_hash,
    )

    rng = np.random.default_rng(23)
    left = rng.uniform(-0.8, 0.8, size=512)
    right = rng.uniform(-0.8, 0.8, size=512)
    stereo = np.stack([left, right], axis=1)
    dec_stereo, rate = decode_wav(encode_wav(stereo, 8000))
    assert dec_stereo.shape == (512, 2) and rate == 8000
    # mixdown computed from the DECODED (quantized) samples, so the
    # channel-mean fold is the only difference under test
    mono = dec_stereo.mean(axis=1)
    assert envelope_hash(dec_stereo) == envelope_hash(mono)
    with _pytest.raises(ValueError, match="too short"):
        envelope_hash(np.zeros(63))


def test_video_frame_set_dedup_alignment_boundary(spark):
    """Frame-set video dedup (r09): a frame-ALIGNED head trim keeps
    (F-1)/F Jaccard overlap (pairs), while the same edit shifted by one
    byte re-cuts every frame boundary and zeroes the overlap (no pair) —
    the documented sensitivity boundary of content-ID-style frame
    hashing. Also pins set semantics: a video with internally repeated
    frames still counts each distinct fingerprint once."""
    from spark_streaming_kafka_example_spark.operators.multimodal import (
        attach_blob,
        sample_frames,
    )

    base = "".join(f"frame{i:03d}-pad-{i:02d}x" for i in range(16))  # 16x16B
    rows = [
        (1, base),
        (2, base[16:]),          # aligned one-frame head trim -> near dup
        (3, base[1:]),           # 1-byte shift -> every frame re-cut
        (4, base[:16] * 16),     # same first frame repeated 16x
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    frames = sample_frames(attach_blob(df), every_nth=1, frame_bytes=16, fake=True)
    fsets = frames.select("doc_id", F.md5("frame").alias("fh")).distinct()
    got = {
        (r.doc_id, r.n): None
        for r in fsets.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert (1, 16) in got and (2, 15) in got and (4, 1) in got  # set semantics
    a, b = fsets.alias("a"), fsets.alias("b")
    shared = (
        a.join(b, (F.col("a.fh") == F.col("b.fh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib"))
        .count()
        .collect()
    )
    pairs = {(r.ia, r.ib): r["count"] for r in shared}
    assert pairs.get((1, 2)) == 15          # aligned trim: 15/16 frames survive
    assert (1, 3) not in pairs              # byte shift: zero shared frames
    assert pairs.get((1, 4)) == 1           # repeated frame counts once


def test_countmin_never_underestimates(spark):
    """CMS guarantee on a collision-heavy input: with 5000 distinct keys
    in 4x256 cells every key's estimate must be >= its exact count, and
    collisions must actually occur (some overcount > 0) — otherwise the
    test would pass vacuously on a sketch wider than the key space."""
    from spark_streaming_kafka_example_spark.plans.windows_stats import (
        _CMS_D,
        _cms_bucket_col,
    )

    ev = spark.range(0, 15000).select(
        (F.col("id") % 5000).alias("user_id")  # 5000 keys x 3 events
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(_CMS_D)])).alias("j")
    hashed = ev.select("user_id", js).select(
        "user_id", "j",
        _cms_bucket_col(F.col("user_id"), F.col("j")).alias("bucket"),
    )
    cells = hashed.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    cand = exact.select("user_id", "n", js).select(
        "user_id", "n", "j",
        _cms_bucket_col(F.col("user_id"), F.col("j")).alias("bucket"),
    )
    scored = (
        cand.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("user_id", "n")
        .agg(F.min("c").alias("est_n"))
        .select("n", "est_n")
        .collect()
    )
    assert len(scored) == 5000
    assert all(r.est_n >= r.n for r in scored)          # never under
    assert any(r.est_n > r.n for r in scored)           # collisions real


def test_scalogram_dyadic_exactness_vs_integer_reference():
    """The oracle-exactness claim, pinned directly (r09): scalogram_hash on
    float64 samples (byte-128)/128 must equal a pure-INTEGER Haar
    reference on q = byte-128 for random clips — the unnormalized
    transform keeps every coefficient a dyadic rational that float64
    represents exactly, and the per-level threshold comparisons are
    invariant to the 1/128 scale. Any drift here (e.g. a 'cleanup' to
    normalized Haar or FFT) silently breaks every scalogram oracle."""
    import random

    import numpy as np

    from spark_streaming_kafka_example_spark.functions.audio import (
        scalogram_hash,
    )

    def reference(byte_vals, levels=4, segments=16):
        a = [b - 128 for b in byte_vals]  # exact integers end-to-end
        bits = []
        for _ in range(levels):
            d = [a[2 * i] - a[2 * i + 1] for i in range(len(a) // 2)]
            a = [a[2 * i] + a[2 * i + 1] for i in range(len(a) // 2)]
            w = len(d) // segments
            cells = [
                sum(x * x for x in d[s * w:(s + 1) * w])
                for s in range(segments)
            ]
            total = sum(cells)
            bits += [1 if c * segments > total else 0 for c in cells]
        nib = [
            8 * bits[4 * j] + 4 * bits[4 * j + 1]
            + 2 * bits[4 * j + 2] + bits[4 * j + 3]
            for j in range(len(bits) // 4)
        ]
        return "".join("0123456789abcdef"[v] for v in nib)

    rng = random.Random(42)
    for _ in range(50):
        byte_vals = [rng.randrange(256) for _ in range(256)]
        samples = (np.array(byte_vals, dtype=np.float64) - 128.0) / 128.0
        assert scalogram_hash(samples) == reference(byte_vals)


def test_bpe_fertility_improves(spark, sf_dir):
    """After the learned merges, the weighted average tokens-per-word is
    strictly below the character baseline, and every merge strictly
    reduced total token count (pair_count > 0 per round)."""
    from spark_streaming_kafka_example_spark.operators.bpe import (
        apply_merges,
        symbols_array,
        train_bpe,
    )
    from spark_streaming_kafka_example_spark.plans.textprep import bpe_word_freqs

    words = bpe_word_freqs(load_table(spark, sf_dir, "documents"))
    merges, _ = train_bpe(words, 8)
    assert len(merges) == 8
    assert all(m[4] > 0 for m in merges)
    toks = apply_merges(words, merges).select(
        "cnt",
        F.size(symbols_array("enc")).alias("n_tok"),
        F.length("word").alias("n_chr"),
    )
    agg = toks.agg(
        F.sum(F.col("n_tok") * F.col("cnt")).alias("tok"),
        F.sum(F.col("n_chr") * F.col("cnt")).alias("chr"),
    ).collect()[0]
    assert agg["tok"] < agg["chr"]
    # total token reduction equals the sum of merged pair occurrences
    # only if later merges never undo earlier ones; at minimum the
    # reduction is bounded by it.
    assert agg["chr"] - agg["tok"] >= merges[-1][4]


def test_bpe_apply_matches_trainer_final_state(spark, sf_dir):
    """apply_merges (the serving path) reproduces the trainer's final
    encoded relation exactly — replay in training order is sufficient."""
    from spark_streaming_kafka_example_spark.operators.bpe import (
        apply_merges,
        train_bpe,
    )
    from spark_streaming_kafka_example_spark.plans.textprep import bpe_word_freqs

    words = bpe_word_freqs(load_table(spark, sf_dir, "documents"))
    merges, enc = train_bpe(words, 5)
    replayed = apply_merges(words, merges).select("word", "enc")
    diff = (
        enc.select("word", "enc")
        .exceptAll(replayed)
        .unionAll(replayed.exceptAll(enc.select("word", "enc")))
    )
    assert diff.count() == 0


def test_quantile_sketch_rank_bound(spark, sf_dir):
    """The histogram guarantee: |rank_err| of every estimated quantile is
    bounded by the largest single cell count (the estimate's crossing
    cell can misplace at most its own occupants), and the error surface
    is non-vacuous (N large enough that cells hold many rows)."""
    from spark_streaming_kafka_example_spark.plans.windows_stats import (
        quantile_bounds,
        quantile_cells,
        quantile_vals,
        sketch_quantile_values,
    )

    vals = quantile_vals(spark, sf_dir)
    cells = quantile_cells(vals, quantile_bounds(vals))
    max_cell = cells.agg(F.max("c")).collect()[0][0]
    rows = sketch_quantile_values(spark, sf_dir).collect()
    assert len(rows) == 4
    assert all(abs(r.rank_err) <= max_cell for r in rows)
    # target ranks are monotone in q and estimates are within bounds
    by_q = sorted(rows, key=lambda r: r.q)
    assert [r.target_rank for r in by_q] == sorted(r.target_rank for r in by_q)


def test_quantile_windowed_monotone_and_bounded(spark, sf_dir):
    """The windowed quantile sketch's read-off semantics per window:
    estimates are MONOTONE in q within every window (the cumulative
    read-off can only move right), every window's |rank_err| obeys the
    histogram guarantee against that window's own largest cell, and the
    window set matches the hours that actually carry values."""
    from spark_streaming_kafka_example_spark.plans import stream as S
    from spark_streaming_kafka_example_spark.plans.windows_stats import (
        _QSK_QS,
    )

    rows = S.stream_quantile_windowed(spark, sf_dir).collect()
    assert rows
    by_win: dict = {}
    for r in rows:
        by_win.setdefault((r.window_start, r.window_end), []).append(r)
    hours = (
        S.load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(F.date_trunc("hour", "ts").alias("h"))
        .distinct()
        .count()
    )
    assert len(by_win) == hours
    for win_rows in by_win.values():
        assert len(win_rows) == len(_QSK_QS)
        by_q = sorted(win_rows, key=lambda r: r.q)
        ests = [r.est for r in by_q]
        assert ests == sorted(ests), by_q
        # per-window histogram guarantee: the crossing cell can misplace
        # at most the window's row count (trivial but non-vacuous at the
        # sparse per-hour occupancy); est_rank 0 is the sparse-window
        # lower-edge case the left-join keeps visible
        n_win = max(r.target_rank for r in by_q)
        assert all(0 <= r.est_rank and abs(r.rank_err) <= n_win
                   for r in by_q)


def _clustered_embeddings(spark):
    """8 tight clusters in 64 dims, one member of each among vec_id 0..7
    (the deterministic k-means init), per-coordinate noise << cluster
    separation — the structured regime PQ/IVF exist for."""
    import math

    rows = []
    for i in range(160):
        cl = i % 8
        vec = [
            (1.0 if (d % 8) == cl else 0.0)
            + 0.05 * math.sin(1.0 + 0.7 * i + 0.31 * d)
            for d in range(64)
        ]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_reconstruction_recovers_clustered_structure(spark):
    """_pq_reconstruction's semantic contract beyond oracle parity: on
    data WITH cluster structure (the regime PQ exists for — the honest
    docstrings call uniform-random testdata the worst case), the decoded
    reconstruction must stay close to the original vector:
    cos(v, recon(v)) >= 0.95 for every vector."""
    from spark_streaming_kafka_example_spark.functions.vectors import (
        cosine_pandas,
    )
    from spark_streaming_kafka_example_spark.plans.llm import (
        _pq_reconstruction,
    )

    emb = _clustered_embeddings(spark)
    recon = _pq_reconstruction(emb, out_col="rv")
    scored = (
        emb.join(recon, "vec_id")
        .select(F.round(cosine_pandas("embedding", "rv"), 4).alias("cos"))
        .collect()
    )
    assert len(scored) == 160
    assert all(r.cos >= 0.95 for r in scored), sorted(
        r.cos for r in scored
    )[:5]


def test_residual_pq_roundtrip_on_clustered_data(spark):
    """The residual IVFADC round-trip (subtract coarse centroid ->
    quantize residual -> add back) must be a NEAR-EXACT reconstruction on
    clustered data: once the coarse quantizer absorbs the cluster
    position, residuals are just the small noise, so coarse_cv + decoded
    residual recovers the vector even more tightly than raw-subvector PQ
    — cos(v, coarse_cv + rres(v)) >= 0.995 for every vector. Pins the
    residual plumbing sim_ivfpq_residual_recall builds on."""
    from spark_streaming_kafka_example_spark.functions.vectors import (
        cosine_pandas,
    )
    from spark_streaming_kafka_example_spark.operators.similarity import (
        assign_buckets,
        kmeans_centroids,
    )
    from spark_streaming_kafka_example_spark.plans.llm import (
        _KMEANS_K,
        _pq_reconstruction,
    )

    emb = _clustered_embeddings(spark)
    coarse = kmeans_centroids(emb, k=_KMEANS_K, iterations=2)
    assigned_v = assign_buckets(
        emb,
        coarse.select(F.col("cent_id").alias("vec_id"),
                      F.col("cv").alias("embedding")),
    )
    res = assigned_v.join(
        F.broadcast(coarse), assigned_v["bucket"] == coarse["cent_id"]
    ).select(
        "vec_id",
        F.zip_with("embedding", "cv", lambda x, y: x - y).alias("embedding"),
        "bucket",
    )
    rres = _pq_reconstruction(res.select("vec_id", "embedding"),
                              out_col="rres")
    recon = (
        rres.join(res.select("vec_id", "bucket"), "vec_id")
        .join(F.broadcast(coarse), F.col("bucket") == coarse["cent_id"])
        .select("vec_id",
                F.zip_with("cv", "rres", lambda x, y: x + y).alias("rv"))
    )
    scored = (
        emb.join(recon, "vec_id")
        .select(F.round(cosine_pandas("embedding", "rv"), 4).alias("cos"))
        .collect()
    )
    assert len(scored) == 160
    assert all(r.cos >= 0.995 for r in scored), sorted(
        r.cos for r in scored
    )[:5]


def test_sliding_quantile_panes_sum_tumbling_cells(spark, sf_dir):
    """The mergeability claim behind the shared global grid, pinned
    exactly (r12): a sliding 3h/1h pane's cells must equal the SUM of its
    three tumbling hours' cells — window rollups need no re-bucketing.
    Both sides run the SAME quantile_windowed_fold (watermark is a no-op
    on a batch DataFrame), so this also proves Spark's sliding F.window
    pane assignment equals the explicit shift-replicate construction the
    DuckDB oracles use."""
    from spark_streaming_kafka_example_spark.plans.stream import (
        quantile_windowed_fold,
    )
    from spark_streaming_kafka_example_spark.plans.windows_stats import (
        quantile_bounds,
        quantile_vals,
    )
    from spark_streaming_kafka_example_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("ts", F.col("value").cast("double").alias("value"))
    )
    bounds = quantile_bounds(quantile_vals(spark, sf_dir))
    tumb = quantile_windowed_fold(ev, bounds)
    slide = quantile_windowed_fold(ev, bounds, win=("3 hours", "1 hour"))
    expected = (
        tumb.select(
            F.explode(F.array(*[F.lit(i) for i in range(3)])).alias("i"),
            "window_start", "bucket", "c",
        )
        .select(
            F.expr("window_start - INTERVAL '1' HOUR * i").alias("window_start"),
            F.expr(
                "window_start - INTERVAL '1' HOUR * i + INTERVAL '3' HOUR"
            ).alias("window_end"),
            "bucket", "c",
        )
        .groupBy("window_start", "window_end", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    diff = slide.exceptAll(expected).unionAll(expected.exceptAll(slide))
    assert diff.count() == 0


def test_quantile_sketch_merges(spark, sf_dir):
    """Executor-mergeability, the property that makes the sketch a sketch:
    cells built on two disjoint halves of the data, merged by summing per
    bucket, equal the cells built on the whole (same fixed grid)."""
    from spark_streaming_kafka_example_spark.plans.windows_stats import (
        quantile_bounds,
        quantile_cells,
        quantile_vals,
    )
    from spark_streaming_kafka_example_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vals = ev.select(F.col("value").cast("double").alias("value"))
    bounds = quantile_bounds(vals)  # one shared grid configuration
    half_a = ev.filter(F.col("event_id") % 2 == 0).select(
        F.col("value").cast("double").alias("value")
    )
    half_b = ev.filter(F.col("event_id") % 2 == 1).select(
        F.col("value").cast("double").alias("value")
    )
    merged = (
        quantile_cells(half_a, bounds)
        .unionByName(quantile_cells(half_b, bounds))
        .groupBy("bucket")
        .agg(F.sum("c").alias("c"))
    )
    full = quantile_cells(vals, bounds)
    diff = merged.exceptAll(full).unionAll(full.exceptAll(merged))
    assert diff.count() == 0


def test_hll_sketch_merges(spark, sf_dir):
    """HLL's combine is register-wise MAX: registers built on two disjoint
    halves of orders, merged by max per (group, bucket), equal the
    registers built on the whole — the property that makes the sketch
    executor-mergeable (and stream-maintainable) at any partitioning."""
    from spark_streaming_kafka_example_spark.plans.windows_stats import (
        _hll_orders,
        hll_hashed,
        hll_registers,
    )

    ords = _hll_orders(spark, sf_dir)
    groups = ords.select("o_orderpriority").distinct()
    half_a = ords.filter(F.col("o_orderkey") % 2 == 0)
    half_b = ords.filter(F.col("o_orderkey") % 2 == 1)
    merged = (
        hll_registers(hll_hashed(half_a), groups)
        .unionByName(hll_registers(hll_hashed(half_b), groups))
        .groupBy("o_orderpriority", "bucket")
        .agg(F.max("register").alias("register"))
    )
    full = hll_registers(hll_hashed(ords), groups)
    diff = merged.exceptAll(full).unionAll(full.exceptAll(merged))
    assert diff.count() == 0


def test_bpe_matches_textbook_python_reference(spark):
    """The two-space-encoding trainer against a direct pure-Python
    implementation of Sennrich-style BPE (explicit symbol lists, manual
    left-to-right non-overlapping merge, same (count DESC, a, b)
    tie-break): merge tables and final encodings must be IDENTICAL. This
    pins the regexp_replace trick to textbook semantics independently of
    the oracle (which replays the same regex)."""
    from spark_streaming_kafka_example_spark.operators.bpe import (
        symbols_array,
        train_bpe,
    )

    fixture = [
        ("aaaa", 3), ("aabab", 2), ("banana", 5), ("bandana", 1),
        ("aaa", 4), ("abba", 2), ("nanan", 3),
    ]
    words = spark.createDataFrame(fixture, "word string, cnt long")
    merges, enc = train_bpe(words, 6)

    # -- textbook reference --------------------------------------------
    vocab = {w: (list(w), c) for w, c in fixture}
    ref_merges = []
    for rnd in range(1, 7):
        counts = {}
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        ref_merges.append((rnd, best[0], best[1], best[0] + best[1],
                           counts[best]))
        for w, (syms, c) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, c)

    assert merges == ref_merges
    got = {
        r.word: list(r.s)
        for r in enc.select("word", symbols_array("enc").alias("s")).collect()
    }
    assert got == {w: syms for w, (syms, _c) in vocab.items()}


def test_cms_bucket_matches_python_reference(spark):
    """The count-min bucket derivation against hashlib ground truth:
    bucket(key, j) must equal the first md5 byte of 'cms<j>:<key>'."""
    import hashlib

    from spark_streaming_kafka_example_spark.plans.windows_stats import (
        _CMS_D,
        _cms_bucket_col,
    )

    keys = [0, 7, 123456789]
    rows = [(k, j) for k in keys for j in range(_CMS_D)]
    df = spark.createDataFrame(rows, "user_id long, j int").select(
        "user_id", "j",
        _cms_bucket_col(F.col("user_id"), F.col("j")).alias("bucket"),
    )
    got = {(r.user_id, r.j): r.bucket for r in df.collect()}
    want = {
        (k, j): int(hashlib.md5(f"cms{j}:{k}".encode()).hexdigest()[:2], 16)
        for k, j in rows
    }
    assert got == want


def test_quantile_bucket_matches_numpy_reference(spark):
    """The histogram cell assignment against a numpy float64 replay of
    the EXACT op order (v - mn) * W / (mx - mn): boundary values (cell
    edges, mn, mx, epsilon neighbors) must land in identical cells."""
    import numpy as np

    from spark_streaming_kafka_example_spark.plans.windows_stats import (
        _QSK_W,
        quantile_bucket_col,
    )

    mn, mx = -3.7, 152.9
    edge = mn + 17 * (mx - mn) / _QSK_W
    vals = [mn, mx, 0.0, edge, np.nextafter(edge, mn), np.nextafter(edge, mx),
            12.3456789, mx - 1e-9]
    df = spark.createDataFrame(
        [(float(v), mn, mx) for v in vals], "value double, mn double, mx double"
    ).select(
        "value",
        quantile_bucket_col(F.col("value"), F.col("mn"), F.col("mx"))
        .alias("bucket"),
    )
    got = {r.value: r.bucket for r in df.collect()}
    for v in vals:
        ref = min(
            int(np.floor((np.float64(v) - np.float64(mn)) * np.float64(_QSK_W)
                         / (np.float64(mx) - np.float64(mn)))),
            _QSK_W - 1,
        )
        assert got[float(v)] == ref, (v, got[float(v)], ref)


def test_hll_rank_matches_python_reference(spark):
    """The bin()-length rank trick against an independent ground truth:
    for any 60-bit w, rho = 61 - length(leading-zero-trimmed bin(w)) must
    equal 61 - w.bit_length() (Python's int.bit_length, bit_length(0)=0
    -> rho 61 — the w=0 path needs no special case on either engine)."""
    samples = [0, 1, 2, 3, 2**19 - 1, 2**19, 2**19 + 1, 2**59, 2**60 - 1]
    df = spark.createDataFrame([(w,) for w in samples], "w long").select(
        "w",
        (F.lit(61) - F.length(F.expr("trim(LEADING '0' FROM bin(w))")))
        .cast("long")
        .alias("rho"),
    )
    got = {r.w: r.rho for r in df.collect()}
    assert got == {w: 61 - w.bit_length() for w in samples}


def test_bloom_positions_match_python_reference(spark):
    """The md5/conv 24-bit position derivation against hashlib ground
    truth: for sample grams and each j, Spark's pos must equal
    int(md5('bloom<j>:<gram>').hexdigest()[:6], 16) % m."""
    import hashlib

    from spark_streaming_kafka_example_spark.plans.textprep import (
        _BLOOM_K,
        _bloom_positions,
    )

    grams = ["the quick brown fox jumps", "a b c d e", "x" * 40]
    m = 8192
    df = spark.createDataFrame([(g, m) for g in grams], "gram string, m long")
    got = sorted(
        (r.gram, r.pos) for r in _bloom_positions(df, "gram").collect()
    )
    want = sorted(
        (g, int(hashlib.md5(f"bloom{j}:{g}".encode()).hexdigest()[:6], 16) % m)
        for g in grams
        for j in range(_BLOOM_K)
    )
    assert got == want


def test_bloom_never_misses(spark, sf_dir):
    """The Bloom filter's one-sided-error contract: every doc flagged by
    the exact eval-gram set appears in the sketch's output with
    n_bloom_hits >= n_exact_hits (a miss would need an inserted gram's bit
    to be unset — impossible), and the false-positive surface is
    non-vacuous (the self-sizing m targets ~2-3% FP, so some clean grams
    must collide)."""
    bloom = {
        r.doc_id: r
        for r in plans.QUERIES["sketch_bloom_decontaminate"](
            spark, sf_dir
        ).collect()
    }
    exact = plans.QUERIES["text_decontaminate"](spark, sf_dir).collect()
    assert exact, "exact decontamination found nothing — vacuous fixture"
    for e in exact:
        b = bloom.get(e.doc_id)
        assert b is not None, f"bloom missed contaminated doc {e.doc_id}"
        assert b.n_exact_hits == e.n_hit_ngrams
        assert b.n_bloom_hits >= b.n_exact_hits
    assert all(r.n_false_pos >= 0 for r in bloom.values())
    assert sum(r.n_false_pos for r in bloom.values()) > 0


def test_bloom_bits_merge(spark, sf_dir):
    """OR-mergeability: bit sets built on two disjoint halves of the eval
    grams, unioned, equal the bit set built on the whole (same m config —
    the filter size is part of the sketch, exactly like the quantile
    grid's bounds)."""
    from spark_streaming_kafka_example_spark.plans.textprep import (
        _bench_grams_df,
        bloom_bits,
        bloom_m,
    )

    docs = load_table(spark, sf_dir, "documents")
    bg = _bench_grams_df(docs).select("gram").distinct()
    mrel = bloom_m(bg)  # one shared size config
    half_a = bg.filter(F.crc32("gram") % 2 == 0)
    half_b = bg.filter(F.crc32("gram") % 2 == 1)
    merged = (
        bloom_bits(half_a, mrel)
        .unionByName(bloom_bits(half_b, mrel))
        .distinct()
    )
    full = bloom_bits(bg, mrel)
    diff = merged.exceptAll(full).unionAll(full.exceptAll(merged))
    assert diff.count() == 0


def test_hll_sketch_accuracy(spark, sf_dir):
    """At sf0.01 every group holds ~3000 distinct keys — n/m ~ 12, firmly
    in the raw-HLL regime (zero_regs = 0), where the 256-register standard
    error is 1.04/sqrt(256) = 6.5%; assert |err_pct| <= 15 (2.3 sigma) and
    that the small-range indicator is honest. The thresholds are
    sf0.01-specific, so the test resolves that scale as a SIBLING of the
    suite's sf_dir and skips loudly when it isn't there (r10 ADVICE: the
    bare absolute path silently assumed the default testdata layout)."""
    sf001 = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if not os.path.isdir(sf001):
        pytest.skip(
            f"sf0.01 testdata not found beside sf_dir ({sf001}); the"
            " exact_n>2500 / zero_regs==0 thresholds only hold at sf0.01"
        )
    out = plans.QUERIES["sketch_hll_distinct"](spark, sf001).collect()
    assert len(out) == 5
    for row in out:
        assert row.exact_n > 2500
        assert row.zero_regs == 0
        assert abs(row.err_pct) <= 15.0, row


def test_bloom_pos_col_matches_row_form(spark):
    """bloom_pos_col (the streaming probe's column form) must agree with
    _bloom_positions (the exploded row form the filter build uses) for
    every j — one definition, two projections."""
    from spark_streaming_kafka_example_spark.plans.textprep import (
        _BLOOM_K,
        _bloom_positions,
        bloom_pos_col,
    )

    grams = ["the quick brown fox jumps", "a b c d e", "zz " * 10]
    m = 4096
    df = spark.createDataFrame([(g, m) for g in grams], "gram string, m long")
    cols = {
        (r["gram"], j): r[f"pos{j}"]
        for r in df.select(
            "gram",
            *[bloom_pos_col(F.col("gram"), F.col("m"), j)
              for j in range(_BLOOM_K)],
        ).collect()
        for j in range(_BLOOM_K)
    }
    # Row form carries no j column outward; recover j by matching each
    # gram's row multiset against the column form.
    rows = _bloom_positions(df, "gram").collect()
    got = {}
    for r in rows:
        got.setdefault(r["gram"], []).append(r["pos"])
    for g in grams:
        expect = sorted(cols[(g, j)] for j in range(_BLOOM_K))
        assert sorted(got[g]) == expect, g


def test_bench_line_fits_driver_capture():
    """emit_line's worst case (every HEADLINE query at a 4-digit time,
    full calibration block) must fit ENTIRELY inside the driver's capture,
    which both BENCH_r10 and BENCH_r11 measured at exactly 2000 trailing
    bytes (r11 VERDICT task 1 — the earlier 3300-byte bound assumed a
    ~3.5 KB capture that does not exist, so the r10/r11 lines arrived
    head-truncated and unparseable). The line self-sizes by dropping the
    MOST-RECENTLY-CAPTURED per-query entries first (r12 VERDICT task 5 —
    coverage rotates, so every headline query lands a captured time
    within ~2 rounds); totals cover ALL queries regardless.

    Assertions are STRUCTURAL — re-derived from the same capture-history
    key emit_line uses, with no hard-coded current-round survivor and no
    `_ordered_names()` dependence — so the gate stays green both before
    AND after the driver writes this round's BENCH/CORRECTNESS artifacts
    (r12 VERDICT task 1: the old keying flipped when the untracked
    CORRECTNESS_r12.json landed, reddening the committed tree mid-round)."""
    import bench

    worst = {n: 9999.99 for n in bench.HEADLINE}
    calib = {"jvm_agg_sec": 999.999, "jvm_agg32_sec": 999.999,
             "python_hash_sec": 999.999}
    line = bench.emit_line(worst, 0.1, calib)
    assert "\n" not in line
    assert len(line) <= bench._EMIT_BUDGET, len(line)
    import json

    parsed = json.loads(line)
    # totals always cover the FULL sample set, even when entries drop
    assert parsed["value"] == round(sum(worst.values()), 3)
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert parsed["n_emitted"] == len(parsed["queries"])
    # the survivors must be exactly the kept-priority suffix of the SAME
    # drop order emit_line used (least-recently-captured kept)
    order = bench._drop_order(worst)
    assert list(parsed["queries"]) == order[-parsed["n_emitted"]:]
    # names with NO bench history (this round's registrations and the
    # capture-starved tail) all survive: only already-captured names drop
    history = bench._capture_rounds()
    dropped = [n for n in worst if n not in parsed["queries"]]
    assert all(n in history for n in dropped), [
        n for n in dropped if n not in history
    ]
    # rotation is real: every dropped name was captured no earlier than
    # every surviving captured name (most-recent-first eviction)
    if dropped:
        oldest_dropped = min(history[n] for n in dropped)
        survived_caps = [
            history[n] for n in parsed["queries"] if n in history
        ]
        assert all(c <= oldest_dropped for c in survived_caps)


def test_minhash_within_row_sigs_match_groupby(spark):
    """The streaming probe's WITHIN-ROW signature (array_min over the
    shingle-hash array) must equal minhash_signatures' groupBy min-agg on
    the same docs for every component — one affine family, two
    evaluation shapes (min over a set = min over its array). Uses the
    SAME shared builders the production plan uses
    (MINHASH_HASH_ARRAY_SQL / minhash_sig_cols_within_row), so drift in
    the production expression fails here, not only downstream."""
    from spark_streaming_kafka_example_spark.functions.text import (
        shingles_from_words,
    )
    from spark_streaming_kafka_example_spark.operators.dedup import (
        MINHASH_HASH_ARRAY_SQL,
        doc_shingles,
        minhash_sig_cols_within_row,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
            (3, "the quick brown fox jumps over the lazy cat"),
        ],
        "doc_id long, text string",
    )
    n = 15
    batch = {
        r["doc_id"]: [r[f"sig_{j}"] for j in range(n)]
        for r in minhash_signatures(
            doc_shingles(docs, distinct=False), num_hashes=n
        ).collect()
    }
    within = {
        r["doc_id"]: [r[f"sig_{j}"] for j in range(n)]
        for r in docs.select("doc_id", F.split("text", " ").alias("_w"))
        .select("doc_id", shingles_from_words("_w", 3).alias("_sh"))
        .select("doc_id", F.expr(MINHASH_HASH_ARRAY_SQL).alias("_hs"))
        .select("doc_id", *minhash_sig_cols_within_row(n))
        .collect()
    }
    assert batch == within


def test_split_by_cluster_zero_leakage(spark, sf_dir):
    """The contrast that closes the r07 audit's loop: the doc-id-gated
    split leaks planted duplicates into eval splits (nonzero
    n_contaminated — the observable failure), while the content-keyed
    split's audit is exactly 0 on every eval split, and fp-equal docs
    always share a split (the construction the zero follows from)."""
    docid_audit = plans.QUERIES["split_leakage_audit"](spark, sf_dir).toPandas()
    assert docid_audit.n_contaminated.sum() > 0  # planted dupes DO leak

    cluster_audit = plans.QUERIES["split_by_cluster_audit"](
        spark, sf_dir
    ).toPandas()
    assert set(cluster_audit.split) <= {"valid", "test"}
    assert (cluster_audit.n_contaminated == 0).all()
    assert (cluster_audit.contamination_rate == 0.0).all()
    assert (cluster_audit.n_docs > 0).all()  # eval splits are non-degenerate

    # construction property: equal fingerprint => equal split label
    from spark_streaming_kafka_example_spark.functions.text import fingerprint
    from spark_streaming_kafka_example_spark.plans.textprep import (
        cluster_split_column,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_multi_split_fps = (
        docs.select(fingerprint("text").alias("fp"),
                    cluster_split_column().alias("split"))
        .groupBy("fp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert n_multi_split_fps == 0


def test_split_by_neardup_cluster_contrast(spark, sf_dir):
    """The near-dup escalation of the split-leakage story: under the
    OWN-fp gate a planted truncated re-crawl hashes independently of its
    source, so near-dup clusters measurably straddle train/eval; under
    the representative-fp gate (split_by_neardup_cluster) cluster-level
    leakage is exactly 0 and every cluster's members share one split."""
    import pyspark.sql.functions as SF

    from spark_streaming_kafka_example_spark.plans.textprep import (
        _neardup_split_frame,
        cluster_split_column,
    )

    # rep-fp gate: audit reads zero on every eval split
    audit = plans.QUERIES["split_by_neardup_cluster_audit"](
        spark, sf_dir
    ).toPandas()
    assert set(audit.split) <= {"valid", "test"}
    assert (audit.n_cluster_leaked == 0).all()
    assert (audit.cluster_leak_rate == 0.0).all()

    # construction property: no cluster straddles two splits
    s = _neardup_split_frame(spark, sf_dir)
    straddling = (
        s.filter(SF.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(SF.countDistinct("split").alias("n_splits"))
        .filter(SF.col("n_splits") > 1)
        .count()
    )
    assert straddling == 0

    # the failure it fixes is OBSERVABLE: the own-fp gate (the exact-dup
    # split applied to the same near corpus) leaks eval docs into
    # train-shared clusters (the planted truncated copies straddle)
    from spark_streaming_kafka_example_spark.functions.text import fingerprint
    from spark_streaming_kafka_example_spark.operators.components import (
        connected_components,
    )
    from spark_streaming_kafka_example_spark.plans.llm import (
        _near_corpus,
        jaccard_pair_graph,
    )

    own = (
        _near_corpus(spark, sf_dir)
        .select(
            "doc_id",
            cluster_split_column(fingerprint("text")).alias("split"),
        )
        .join(
            connected_components(jaccard_pair_graph(spark, sf_dir)).select(
                SF.col("node").alias("doc_id"), "cluster_id"
            ),
            "doc_id",
            "left_outer",
        )
    )
    tc = (
        own.filter(
            (SF.col("split") == "train") & SF.col("cluster_id").isNotNull()
        )
        .select("cluster_id")
        .distinct()
    )
    leaked = (
        own.filter(SF.col("split") != "train")
        .join(tc, "cluster_id", "left_semi")
        .count()
    )
    assert leaked > 0
