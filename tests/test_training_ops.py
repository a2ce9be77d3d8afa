"""Tests for the training-data pipeline layer: dedup, similarity search,
text analysis, multimodal plumbing (SURVEY.md §2 extension set)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.text import (
    lang_id,
    quality_score,
    rolling_fingerprint,
    simhash32,
    token_count,
)
from crawler_spark.operators.dedup import (
    embedding_near_dup,
    exact_dedup,
    exact_dup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from crawler_spark.operators.multimodal import (
    extract_image_features,
    resize_images,
    sample_frames,
    synthesize_media,
)
from crawler_spark.operators.similarity import cosine_topk, lsh_bucketed_topk


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),                                  # exact dup of 0
        (2, base + " extra tail words appended"),   # near dup of 0
        (3, "completely different content about spark query engines and shuffles"),
        (4, "another unrelated document mentioning politeness budgets and robots"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- dedup

def test_exact_dedup_groups(docs):
    out = {r["keep_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert out[0] == 2          # docs 0 and 1 collapse
    assert out[2] == 1 and out[3] == 1 and out[4] == 1


def test_exact_dup_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in exact_dup_pairs(docs).collect()}
    assert pairs == {(0, 1)}


def test_minhash_finds_near_dups_not_distant(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(docs).collect()}
    assert (0, 1) in pairs                     # identical → all bands collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup shares most shingles
    assert (3, 4) not in pairs                 # unrelated docs don't collide


def test_minhash_signature_is_min_over_shingles(spark):
    # one-token doc: the single shingle IS the min for every permutation
    one = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    sig = minhash_signatures(one).collect()[0]
    from crawler_spark.functions.text import HASH_PRIME, MINHASH_A, MINHASH_B
    import hashlib

    h = int(hashlib.md5(b"hello").hexdigest()[:8], 16)
    for p in range(16):
        assert sig[f"h{p}"] == (MINHASH_A[p] * h + MINHASH_B[p]) % HASH_PRIME


def test_ngram_jaccard_exact_values(docs):
    cand = spark_pairs = docs.sparkSession.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a long, id_b long"
    )
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, cand, threshold=0.0).collect()}
    assert out[(0, 1)] == 1.0
    # doc0: 12 distinct tokens; doc2 adds 4 distinct new ones → 12/16
    assert out[(0, 2)] == pytest.approx(12 / 16, abs=1e-6)
    # zero shared tokens → no common row → the pair drops out entirely
    assert (0, 3) not in out


def test_connected_components_chain_triangle_pair(spark):
    from crawler_spark.operators.dedup import connected_components

    # 4-node chain (needs multi-round propagation), triangle, isolated pair
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    out = {r["node"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dup_clusters_groups_exact_and_near_dups(docs):
    from crawler_spark.operators.dedup import dup_clusters

    rows = dup_clusters(docs, threshold=0.3).collect()
    by_doc = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in rows}
    # 0, 1 (exact dup) and 2 (near dup) form one cluster, keeper = 0
    assert by_doc[0] == (0, 3) and by_doc[1] == (0, 3) and by_doc[2] == (0, 3)
    # unrelated docs never appear in any cluster
    assert 3 not in by_doc and 4 not in by_doc


def test_simhash_relational_equals_columnar(docs):
    rel = {r["doc_id"]: r["simhash"]
           for r in simhash_signatures(docs).collect()}
    col = {r["doc_id"]: r["sh"]
           for r in docs.select("doc_id", simhash32(F.col("text")).alias("sh")).collect()}
    assert rel == col


def test_simhash_near_pairs_finds_exact_dup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_pairs(docs, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0


# ---------------------------------------------------------------- similarity

@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for i in range(40):
        v = rng.randn(64)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    # plant 40=near-dup of 0, 41=exact dup of 1
    v0 = np.array(rows[0][1]); v0n = v0 + rng.randn(64) * 0.01
    rows.append((40, [float(x) for x in v0n / np.linalg.norm(v0n)]))
    rows.append((41, rows[1][1]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(emb):
    out = cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["neighbor_id"] == 40            # the planted near-dup
    assert out[0]["cosine"] > 0.99
    # verify rank-1 cosine against numpy
    import numpy as np

    rows = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    expect = float(rows[0] @ rows[40] / (np.linalg.norm(rows[0]) * np.linalg.norm(rows[40])))
    assert out[0]["cosine"] == pytest.approx(expect, abs=1e-6)


def test_lsh_topk_recall_on_planted_dups(emb):
    queries = emb.where(F.col("vec_id").isin(0, 1))
    out = lsh_bucketed_topk(emb, queries, k=1, n_planes=6).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in out}
    # near-identical vectors share the sketch → found inside the bucket
    assert got.get(0) == 40
    assert got.get(1) == 41


def test_embedding_near_dup(emb):
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dup(emb, threshold=0.95).collect()}
    assert (0, 40) in pairs
    assert (1, 41) in pairs


def test_lsh_recall_measured_at_sf01(spark):
    """Recall gauge at sf0.1 (2000 vectors), planes sized by the
    suggest_n_planes rule.

    Two populations: (a) planted near-duplicates (cosine ≈ 0.999) — the
    workload LSH bucketing is for — must be retrieved with high recall;
    (b) arbitrary nearest neighbors of isotropic random vectors — reported
    for the record (sign sketches are weak there by construction, which is
    why `cosine_topk` stays the exactness baseline).  Multi-probe may only
    add candidates, so its recall dominates single-probe.
    """
    import numpy as np

    from crawler_spark.operators.similarity import suggest_n_planes

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    base = emb.where(F.col("vec_id") < 50).collect()
    rng = np.random.RandomState(11)
    planted = []
    for r in base:
        v = np.array(r["embedding"]) + rng.randn(64) * 0.02
        planted.append((int(r["vec_id"]) + 100_000, [float(x) for x in v]))
    corpus = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<double>")
    )
    n = corpus.count()
    planes = suggest_n_planes(n)
    queries = emb.where(F.col("vec_id") < 20)

    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    exact = pairs(cosine_topk(corpus, queries, k=5))
    multi = pairs(lsh_bucketed_topk(corpus, queries, k=5, n_planes=planes,
                                    multiprobe=True))
    single = pairs(lsh_bucketed_topk(corpus, queries, k=5, n_planes=planes,
                                     multiprobe=False))
    overall = len(exact & multi) / len(exact)
    overall_single = len(exact & single) / len(exact)

    want = {(q, q + 100_000) for q in range(20)}  # each query's planted dup
    planted_multi = len(want & multi) / len(want)
    planted_single = len(want & single) / len(want)
    print(
        f"lsh recall@5 sf0.1 planes={planes}: planted multi={planted_multi:.2f} "
        f"single={planted_single:.2f}; overall multi={overall:.2f} "
        f"single={overall_single:.2f}"
    )
    assert planted_multi >= 0.7       # near-dups land in the probed buckets
    assert planted_multi >= planted_single
    assert overall >= overall_single  # multi-probe only widens the candidates


# ---------------------------------------------------------------- text analysis

def test_lang_id_rules(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "der hund ist nicht hier"),
        (3, "el gato es una mascota"),
        (4, "le chat est dans une maison"),
        (5, "这是中文文本"),
        (6, "привет мир"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["lang"] for r in
           df.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "zh", 6: "ru"}


def test_quality_score_ranges(docs):
    vals = [r["q"] for r in
            docs.select(quality_score(F.col("text")).alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    # junk text scores below normal prose
    junk = docs.sparkSession.createDataFrame(
        [(9, "!!! ### $$$ %%% ^^^ &&&")], "doc_id long, text string"
    )
    junk_q = junk.select(quality_score(F.col("text")).alias("q")).collect()[0]["q"]
    assert junk_q < min(vals)


def test_token_count_and_fingerprint_deterministic(docs):
    a = docs.select("doc_id", token_count(F.col("text")).alias("n"),
                    rolling_fingerprint(F.col("text")).alias("fp")).collect()
    b = docs.select("doc_id", token_count(F.col("text")).alias("n"),
                    rolling_fingerprint(F.col("text")).alias("fp")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    byid = {r["doc_id"]: r for r in a}
    assert byid[0]["n"] == 14  # "the" appears 3x in the 14-token base text
    assert byid[0]["fp"] == byid[1]["fp"]        # same text, same fingerprint
    assert byid[0]["fp"] != byid[2]["fp"]        # order/content sensitive


# ---------------------------------------------------------------- multimodal

def test_media_feature_extraction(docs):
    media = synthesize_media(docs, text_col="text", id_col="doc_id")
    feats = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert len(feats) == 5
    assert all(r["ok"] for r in feats.values())
    assert all(r["width"] == 8 and r["height"] == 8 for r in feats.values())
    # identical payloads → identical features; different → different phash
    assert feats["m0"]["phash"] == feats["m1"]["phash"]
    assert feats["m0"]["phash"] != feats["m3"]["phash"]


def test_media_error_row_does_not_fail_job(spark):
    media = spark.createDataFrame(
        [("bad", None), ("ok", bytearray(b"payload"))],
        "media_id string, data binary",
    )
    out = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert out["bad"]["ok"] is False and out["bad"]["error"]
    assert out["ok"]["ok"] is True


def test_resize_and_frame_sample_shapes(docs):
    media = synthesize_media(docs, text_col="text", id_col="doc_id")
    resized = resize_images(media, target=(4, 4)).collect()
    assert all(len(r["resized"]) == 16 for r in resized)
    frames = sample_frames(media, every_nth=2, max_frames=4).collect()
    assert len(frames) >= 5          # at least one frame per doc
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(idxs == sorted(idxs) and len(idxs) <= 4 for idxs in per.values())


def test_ivf_topk_recall_and_shape(emb):
    from crawler_spark.operators.similarity import cosine_topk, ivf_topk

    queries = emb.where(F.col("vec_id").isin(0, 1))
    approx = ivf_topk(emb, queries, k=1, n_centroids=6, nprobe=3)
    got = {r["query_id"]: r["neighbor_id"] for r in approx.collect()}
    # planted near-identical vectors land in the same centroid bucket
    assert got.get(0) == 40
    assert got.get(1) == 41
    # rank-1 cosine matches the exact scorer for the found neighbor
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in cosine_topk(emb, queries, k=5).collect()}
    for r in approx.collect():
        assert r["cosine"] == exact[(r["query_id"], r["neighbor_id"])]


def test_kmeans_assign_separable_clusters(spark):
    import numpy as np

    from crawler_spark.operators.similarity import kmeans_assign

    # two tight, well-separated direction bundles -> 3 Lloyd rounds must
    # put each bundle in a single cluster
    rng = np.random.RandomState(11)
    c1, c2 = rng.randn(64), rng.randn(64)
    rows = []
    for i in range(30):
        base = c1 if i % 2 == 0 else c2
        v = base + rng.randn(64) * 0.05
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign(emb, n_centroids=2, iters=3).collect()
    evens = {r["centroid_id"] for r in out if r["vec_id"] % 2 == 0}
    odds = {r["centroid_id"] for r in out if r["vec_id"] % 2 == 1}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds
    # every member sits close to its refined centroid
    assert all(r["cosine"] > 0.9 for r in out)


def test_semdedup_drops_planted_dups(emb):
    from crawler_spark.operators.similarity import semdedup

    kept = {r["vec_id"] for r in
            semdedup(emb, n_centroids=4, iters=2, threshold=0.95).collect()}
    # exact dup 41 (of 1) and near-dup 40 (of 0, cosine ~0.999) must drop;
    # the keep side is always the smaller id
    assert 1 in kept and 0 in kept
    assert 41 not in kept and 40 not in kept
    # near-orthogonal randoms survive
    assert len(kept) == 40


# ------------------------------------------------- incremental dedup

def test_minhash_incremental_matches_batch_cross_pairs(docs):
    """Incoming-vs-existing candidates == the cross-split subset of the
    all-at-once batch candidates (band computation is per-doc, so the
    incremental join must reproduce exactly the batch pairs that straddle
    the split)."""
    from crawler_spark.operators.dedup import (
        minhash_bands,
        minhash_lsh_incremental,
    )

    existing = docs.where(F.col("doc_id") <= 2)
    incoming = docs.where(F.col("doc_id") > 2).union(
        existing.select((F.col("doc_id") + 100).alias("doc_id"), "text")
    )
    inc = {
        (r["new_id"], r["old_id"])
        for r in minhash_lsh_incremental(incoming, minhash_bands(existing)).collect()
    }
    batch = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(existing.union(incoming)).collect()
    }
    cross = {(b, a) for a, b in batch if a <= 2 and b > 2}
    assert inc == cross
    # the re-keyed copies of existing docs must collide with their originals
    assert (100, 0) in inc and (101, 0) in inc and (102, 2) in inc


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing property: docs sharing a substring of length >= k+w-1
    (= 11 at k=8,w=4) share >= 1 fingerprint; identical docs share all."""
    from crawler_spark.operators.dedup import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (0, "PREFIX AAA " + shared + " SUFFIX BBB"),
            (1, "zzz unrelated opening " + shared + " different tail qq"),
            (2, "completely disjoint text with no overlap whatsoever!!"),
            (3, "PREFIX AAA " + shared + " SUFFIX BBB"),  # clone of 0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in winnow_fingerprints(docs).collect()}
    assert out[0]["fp_digest"] == out[3]["fp_digest"]       # clone: same set
    assert out[0]["n_fp"] == out[3]["n_fp"]
    assert out[0]["fp_digest"] != out[2]["fp_digest"]

    # density: expected 2/(w+1) of grams selected; allow generous band
    n_grams = len("PREFIX AAA " + shared + " SUFFIX BBB") - 8 + 1
    assert 0.15 * n_grams < out[0]["n_fp"] < 0.8 * n_grams


def test_winnow_shared_substring_shares_fp(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawler_spark.functions.text import h32
    from crawler_spark.operators.dedup import winnow_fingerprints

    # recover the raw fingerprint SETS (not the digest) for two docs that
    # share an 11+-char substring, via the same operator internals
    shared = "abcdefghijklmnop"  # 16 chars >= k+w-1
    docs = spark.createDataFrame(
        [(0, "xxxx " + shared + " yyyy"), (1, "qq " + shared + " rr 1234")],
        "doc_id long, text string",
    )
    d = docs.select("doc_id", "text")
    k, w = 8, 4
    n_grams = F.greatest(F.length("text") - k + 1, F.lit(1))
    g = d.select(
        "doc_id", n_grams.alias("n"),
        F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"), "text",
    ).select(
        "doc_id", "n", "pos",
        h32(F.col("text").substr(F.col("pos"), F.lit(k))).alias("h"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    sel = (
        g.select("doc_id", "pos", "n", F.min("h").over(win).alias("fp"))
        .where(F.col("pos") <= F.col("n") - w + 1)
        .select("doc_id", "fp").distinct()
    )
    sets = {
        r["doc_id"]: set(r["fps"])
        for r in sel.groupBy("doc_id").agg(F.collect_set("fp").alias("fps"))
        .collect()
    }
    assert sets[0] & sets[1], "shared >=k+w-1 substring must share a fp"


def test_sq8_topk_recall_and_planted_neighbor(emb):
    from crawler_spark.operators.similarity import sq8_topk

    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx_rows = sq8_topk(emb, queries, k=5).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall          # 8-bit quantization barely loses
    top1 = {r["query_id"]: r["neighbor_id"]
            for r in approx_rows if r["rank"] == 1}
    assert top1[0] == 40                  # planted near-dup survives SQ8
    assert top1[1] == 41                  # exact dup is rank 1 for query 1


def test_sq8_quantize_bounds_and_plan(emb, spark):
    from crawler_spark.operators.similarity import sq8_quantize, sq8_stats

    lo, hi = sq8_stats(emb)
    assert len(lo) == len(hi) == 64
    q = emb.select(sq8_quantize(F.col("embedding"), lo, hi).alias("q"))
    mn, mx = q.select(
        F.min(F.array_min("q")), F.max(F.array_max("q"))
    ).first()
    assert mn == 0 and mx == 255          # codebook spans the corpus range
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_cdc_chunks_survive_insertion(spark):
    """The content-defined property: inserting text mid-document only
    re-chunks the edited neighborhood — chunks far from the edit keep
    their hashes, so the two versions share most chunks.  (A fixed-width
    blocker would shift every downstream block and share none.)"""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawler_spark.functions.text import h32

    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "sparrows argue about breadcrumbs near the old stone fountain "
            "and a tired postman counts his remaining letters twice") * 2
    edited = base[:150] + " INSERTED PHRASE " + base[150:]
    docs = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string"
    )
    k, mask = 8, 31
    n_grams = F.greatest(F.length("text") - k + 1, F.lit(1))
    g = docs.select(
        "doc_id", F.length("text").alias("len"), "text",
        F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"),
    )
    h = h32(F.col("text").substr(F.col("pos"), F.lit(k)))
    starts = g.where((F.col("pos") == 1) | (h.bitwiseAND(F.lit(mask)) == 0))
    nxt = F.lead("pos").over(Window.partitionBy("doc_id").orderBy("pos"))
    chunks = starts.select(
        "doc_id",
        h32(F.col("text").substr(
            F.col("pos"),
            F.coalesce(nxt, F.col("len") + 1) - F.col("pos"),
        )).alias("ch"),
    )
    sets = {
        r["doc_id"]: set(r["cs"])
        for r in chunks.groupBy("doc_id")
        .agg(F.collect_set("ch").alias("cs")).collect()
    }
    inter = len(sets[0] & sets[1])
    assert inter >= 2, sets                  # chunks away from the edit match
    assert sets[0] != sets[1]                # the edited region re-chunked


def test_cdc_chunk_stats_shared_detection(spark):
    from crawler_spark.operators.dedup import cdc_chunk_stats

    shared_passage = ("all rights reserved contact the webmaster for "
                      "licensing and reuse terms today ") * 3
    docs = spark.createDataFrame(
        [
            (0, "unique opening words here. " + shared_passage),
            (1, "different lead paragraph!! " + shared_passage),
            (2, "totally unrelated text with nothing borrowed from anyone "
                "at all, not even punctuation habits or rhythm."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cdc_chunk_stats(docs).collect()}
    assert out[0]["shared_chunks"] >= 1
    assert out[1]["shared_chunks"] >= 1
    assert out[2]["shared_chunks"] == 0
    assert out[0]["shared_frac"] > 0.3      # the passage dominates the doc
    assert out[2]["shared_frac"] == 0.0


def test_truncation_recall_monotone_and_full_width(emb):
    from crawler_spark.operators.similarity import truncation_recall

    queries = emb.where(F.col("vec_id") < 5)
    out = truncation_recall(emb, queries, dims=(8, 32, 64), k=5).collect()
    by_dim = {}
    for r in out:
        by_dim.setdefault(r["dim"], []).append(r["recall"])
    assert set(by_dim) == {8, 32, 64}
    assert all(len(v) == 5 for v in by_dim.values())  # one row per query
    mean = {d: sum(v) / len(v) for d, v in by_dim.items()}
    assert mean[64] == 1.0                 # full width == reference set
    assert mean[8] <= mean[32] + 1e-9      # wider keeps (weakly) more
    assert all(0.0 <= r <= 1.0 for v in by_dim.values() for r in v)


def test_containment_detects_near_superset(spark):
    from crawler_spark.operators.dedup import containment_pairs

    quoted = "alpha beta gamma delta epsilon zeta"
    wrapper = ("intro words here " + quoted +
               " plus a very long tail of unrelated filler tokens "
               "one two three four five six seven eight nine ten")
    docs = spark.createDataFrame(
        [(1, quoted), (2, wrapper), (3, "totally different content")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = {(r["id_a"], r["id_b"]): r
           for r in containment_pairs(docs, cand, threshold=0.5).collect()}
    # doc1 fully contained in doc2 despite low Jaccard
    assert (1, 2) in out
    assert out[(1, 2)]["cont_a_in_b"] == 1.0
    assert out[(1, 2)]["cont_b_in_a"] < 0.5
    # unrelated pair filtered out
    assert (1, 3) not in out


def test_resolve_clusters_keep_best_one_keeper_per_cluster(spark):
    from crawler_spark.operators.dedup import resolve_clusters_keep_best

    # cluster 0: docs 0,1,2 — doc 1 has the best quality text; cluster 10:
    # docs 10,11 with IDENTICAL text (quality tie -> min id keeps)
    good = ("the quick brown fox jumps over the lazy dog and then walks "
            "home to rest for a while because it was a long day") * 3
    rows = [
        (0, "zzzz!!!! @@@@ ####"),
        (1, good),
        (2, "short"),
        (10, good),
        (11, good),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    out = resolve_clusters_keep_best(docs, clusters).collect()
    assert len(out) == 5
    keepers = {r["cluster_id"]: r["doc_id"] for r in out if r["keep"]}
    assert keepers == {0: 1, 10: 10}
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert sum(m["keep"] for m in members) == 1  # exactly one keeper
        kept = next(m for m in members if m["keep"])
        assert kept["quality"] == max(m["quality"] for m in members)


def test_embedding_outliers_flags_far_vector(spark):
    from crawler_spark.operators.similarity import embedding_outliers

    # 20 vectors tightly clustered around +e1, one pointing the other way
    rows = [(i, [1.0, 0.01 * (i % 5), 0.0, 0.0]) for i in range(20)]
    rows.append((99, [-1.0, 0.0, 0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in embedding_outliers(emb).collect()}
    assert len(out) == 21
    assert out[99]["outlier"] is True
    assert sum(r["outlier"] for r in out.values()) == 1
    assert out[99]["centroid_sim"] < 0  # opposite hemisphere
    assert all(
        out[i]["centroid_sim"] > 0.99 for i in range(20)
    )  # cluster sits on the centroid direction
    # the sweep test covers scale shapes; assert broadcast here explicitly
    plan = (
        embedding_outliers(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_pq_encode_shape_and_code_range(emb):
    from crawler_spark.operators.similarity import pq_encode, pq_train

    cb = pq_train(emb, m=4, ksub=8, iters=2, dim=64)
    cb_rows = cb.collect()
    assert len(cb_rows) <= 4 * 8
    assert all(len(r["cvec"]) == 16 for r in cb_rows)
    codes = pq_encode(emb, cb, m=4, dim=64).collect()
    assert len(codes) == 42                   # one pivoted row per vector
    assert set(codes[0].asDict()) == {"vec_id", "c0", "c1", "c2", "c3"}
    live = {(r["s"], r["centroid_id"]) for r in cb_rows}
    for r in codes:
        for s in range(4):
            assert (s, r[f"c{s}"]) in live    # every code points at a
                                              # surviving centroid


def test_pq_topk_planted_neighbors_survive_compression(emb):
    from crawler_spark.operators.similarity import pq_topk

    queries = emb.where(F.col("vec_id") < 5)
    rows = pq_topk(emb, queries, k=5, m=4, ksub=8, iters=2, dim=64).collect()
    assert len(rows) == 25
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] \
            == [1, 2, 3, 4, 5]
        assert all(r["neighbor_id"] != qid for r in rs)
        assert all(r["adc_dist"] >= 0 for r in rs)
    # 4 codes x 8 centroids is coarse, but an EXACT duplicate has the same
    # codes as its twin, so its ADC distance ties the query's own
    # reconstruction error — it must appear in the top-5 for query 1
    assert 41 in {r["neighbor_id"] for r in by_q[1]}


def test_pq_adc_approximates_true_l2(emb):
    import numpy as np

    from crawler_spark.operators.similarity import pq_topk

    queries = emb.where(F.col("vec_id") == 0)
    rows = pq_topk(emb, queries, k=10, m=4, ksub=8, iters=2, dim=64).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    q = vecs[0]
    # Spearman-ish sanity: ADC must rank the planted near-dup (true L2
    # ~0.01) strictly above the median candidate
    adc = {r["neighbor_id"]: r["adc_dist"] for r in rows}
    assert 40 in adc
    true_l2 = {n: float(((vecs[n] - q) ** 2).sum()) for n in adc}
    assert true_l2[40] == min(true_l2.values())
    assert adc[40] == min(adc.values())


def test_pq_recall_bounds_and_planted_dup(emb):
    from crawler_spark.operators.similarity import pq_recall

    queries = emb.where(F.col("vec_id") < 5)
    rows = {r["query_id"]: r
            for r in pq_recall(emb, queries, k=5, dim=64).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}          # every probe gets a row
    for r in rows.values():
        assert 0.0 <= r["recall"] <= 1.0
        assert r["recall"] == round(r["n_hits"] / 5, 6)
    # queries 0/1 have planted (near-)exact twins: PQ must find them, so
    # recall there is strictly positive
    assert rows[0]["n_hits"] >= 1
    assert rows[1]["n_hits"] >= 1


def test_l2_topk_exact_matches_numpy(emb):
    import numpy as np

    from crawler_spark.operators.similarity import l2_topk_exact

    out = l2_topk_exact(emb, emb.where(F.col("vec_id") == 0), k=3).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    q = vecs[0]
    truth = sorted(
        ((float(((v - q) ** 2).sum()), i) for i, v in vecs.items() if i != 0)
    )[:3]
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] \
        == [i for _, i in truth]
    assert out[0]["l2_dist"] == round(truth[0][0], 6)


def test_span_corruption_short_doc_untouched(spark):
    from crawler_spark.operators.corpus import span_corruption

    docs = spark.createDataFrame([(1, "Alpha beta GAMMA delta")],
                                 "doc_id long, text string")
    row = span_corruption(docs).collect()[0]
    assert row["n_spans"] == 0
    assert row["input_text"] == "alpha beta gamma delta"
    assert row["target_text"] == ""


def test_span_corruption_reconstructs_original(spark):
    from crawler_spark.operators.corpus import span_corruption

    text = " ".join(f"w{i}" for i in range(47))      # 2 full blocks + tail
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    row = span_corruption(docs).collect()[0]
    assert row["n_tokens"] == 47 and row["n_spans"] == 2

    # parse target into {sentinel: span tokens}
    tgt = row["target_text"].split(" ")
    spans, cur = {}, None
    for tok in tgt:
        if tok.startswith("<extra_id_"):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    assert set(spans) == {"<extra_id_0>", "<extra_id_1>"}
    assert all(len(v) == 3 for v in spans.values())

    # splice the spans back in -> the original token stream
    rebuilt = []
    for tok in row["input_text"].split(" "):
        rebuilt.extend(spans.get(tok, [tok]))
    assert rebuilt == text.split(" ")

    # sentinels appear in order and exactly once in the input
    idx0 = row["input_text"].index("<extra_id_0>")
    idx1 = row["input_text"].index("<extra_id_1>")
    assert idx0 < idx1
    assert row["input_text"].count("<extra_id_") == 2


def test_span_corruption_density_and_determinism(spark):
    from crawler_spark.operators.corpus import span_corruption

    text = " ".join(f"t{i}" for i in range(200))     # 10 full blocks
    docs = spark.createDataFrame([(3, text), (4, text)],
                                 "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_corruption(docs).collect()}
    for r in out.values():
        assert r["n_spans"] == 10
        assert len(r["target_text"].split(" ")) == 10 * 4   # sentinel + 3
        assert len(r["input_text"].split(" ")) == 200 - 10 * 3 + 10
    # different doc_id -> different (hash-chosen) mask positions
    assert out[3]["input_text"] != out[4]["input_text"]
    # same doc twice -> identical output
    again = {r["doc_id"]: r["input_text"]
             for r in span_corruption(docs).collect()}
    assert again[3] == out[3]["input_text"]
