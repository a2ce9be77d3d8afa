"""Corpus deduplication operators — exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

All operators are pure DataFrame compositions over native expressions (the
portable md5-derived ``h32`` hash, see ``functions/text.py``), so each has an
exact DuckDB oracle.  Scale notes per operator below: at 100 TB the input is
hash-partitioned by the group key before each groupBy/join, candidate
generation is always *bucketed* (never all-pairs), and the only all-pairs
step runs inside a bucket whose size is bounded by the banding parameters.

Reference context: the F# crawler's only dedup is `Seq.distinct` on catalog
hrefs (``CrawlerPet911/ParserPet911.fs:133``) and in-memory id sets
(``NewCards.fs:50-65``); corpus-level dedup is a new capability the
training-data pipeline layer adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    HASH_PRIME,
    MINHASH_A,
    MINHASH_B,
    distinct_tokens,
    h32,
    shingles,
)


def _ensure_parallelism(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Small/single-file inputs arrive as 1-2 partitions; the explode+hash
    pipelines below are CPU-bound per row, so fan the input out to the
    session's parallelism first — keyed by the doc id, so the downstream
    per-id groupBy/join reuses the hash partitioning instead of shuffling
    again.  (No ``df.rdd.getNumPartitions()`` probe: converting the plan to
    an RDD per operator call is itself a cost; the keyed repartition is one
    shuffle of slim (id, text) rows that replaces the wider shuffle of
    exploded hash rows the aggregation would otherwise do.)"""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target, F.col(key_col))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash; keeps the smallest id per group.

    Returns (doc_id, content_hash, dup_count).  One hash-partitioned
    aggregation — the canonical map-side-combine groupBy; at 100 TB this is
    a single shuffle on a high-cardinality key (no skew: md5 uniform).
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dup_pairs(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id_a, id_b) pairs with byte-identical text, id_a < id_b.

    Self-join on the content hash — the join key is the hash, so the join
    is co-partitioned and the all-pairs blowup is bounded by duplicate-group
    size, not corpus size.
    """
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    a = h.select(F.col("content_hash"), F.col(id_col).alias("id_a"))
    b = h.select(F.col("content_hash"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "content_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "content_hash")
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 16,
                       shingle_k: int = 3) -> DataFrame:
    """Relational MinHash: explode shingles once, hash each under num_perm
    salted h32 functions as flat columns, map-side-combine ``min`` per doc.

    This shape (vs. a per-row array ``transform``) keeps every hash inside
    whole-stage codegen, computes the shingle set exactly once, and bounds
    executor memory at one (doc, shingle) row — the formulation that
    survives 100 TB.  Returns (id_col, h0..h{num_perm-1}).
    """
    sh = _ensure_parallelism(df, id_col).select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("shingle"),
    )
    # ONE md5 per shingle; permutations are integer universal hashes on top
    base = sh.select(F.col(id_col), h32(F.col("shingle")).alias("h"))
    hashed = base.select(
        F.col(id_col),
        *[
            ((F.col("h") * MINHASH_A[p] + MINHASH_B[p]) % HASH_PRIME).alias(f"h{p}")
            for p in range(num_perm)
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"h{p}").alias(f"h{p}") for p in range(num_perm)]
    )


def minhash_bands(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", num_perm: int = 16,
                  bands: int = 4, shingle_k: int = 3) -> DataFrame:
    """(id_col, band_key) LSH band table for a corpus.

    This is the *persistable* dedup artifact: at 100 TB the band table is
    written once, bucketed by ``band_key``, and every later snapshot only
    computes bands for ITS OWN documents and joins (see
    ``minhash_lsh_incremental``) — the existing corpus text is never
    re-shingled.
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, text_col, id_col, num_perm, shingle_k)
    band_keys = [
        h32(
            F.concat(
                F.lit(f"{b}|"),
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"h{p}").cast("string")
                        for p in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                ),
            )
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col),
        F.explode(F.array(*band_keys)).alias("band_key"),
    )


def minhash_lsh_incremental(new_df: DataFrame, existing_bands: DataFrame,
                            text_col: str = "text", id_col: str = "doc_id",
                            num_perm: int = 16, bands: int = 4,
                            shingle_k: int = 3) -> DataFrame:
    """Near-dup candidates of an INCOMING batch against an EXISTING corpus.

    ``existing_bands`` is a precomputed ``minhash_bands`` table (in
    production: persisted, bucketed by band_key).  Only the incoming batch
    is shingled/signed; the join touches existing bands only in the buckets
    the incoming batch actually hits.  This is the incremental-crawl dedup
    shape: per-snapshot cost is O(|new|) + a bucketed join, independent of
    corpus size per band bucket.

    Returns (new_id, old_id) distinct pairs — incoming docs whose band
    collided with an existing doc.  Self-collisions within the incoming
    batch are NOT reported here (run ``minhash_lsh_candidates`` on the batch
    for those).
    """
    new_bands = minhash_bands(new_df, text_col, id_col, num_perm, bands,
                              shingle_k)
    n = new_bands.select(F.col("band_key"), F.col(id_col).alias("new_id"))
    e = existing_bands.select(F.col("band_key"), F.col(id_col).alias("old_id"))
    return (
        n.join(e, "band_key")
        .where(F.col("new_id") != F.col("old_id"))
        .select("new_id", "old_id")
        .distinct()
    )


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_perm: int = 16,
                           bands: int = 4, shingle_k: int = 3) -> DataFrame:
    """MinHash + LSH banding near-dup candidate pairs.

    shingle → minhash signature (num_perm values) → `bands` band keys →
    explode → self-join per (band, key) bucket → distinct pairs.

    Returns (id_a, id_b) with id_a < id_b.  Scale: the shuffle key is the
    band hash (uniform); bucket sizes are the banding knob — r=num_perm/bands
    rows per band tunes the Jaccard threshold s ≈ (1/b)^(1/r).  No all-pairs
    anywhere outside a bucket.
    """
    banded = minhash_bands(df, text_col, id_col, num_perm, bands, shingle_k)
    a = banded.select(F.col("band_key"), F.col(id_col).alias("id_a"))
    b = banded.select(F.col("band_key"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "band_key")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Relational 32-bit SimHash: explode distinct tokens, hash once, and
    compute the 32 per-bit majority votes as flat codegen'd aggregates
    (sum of ±1 per bit) in one map-side-combined groupBy.

    Same value as ``functions.text.simhash32`` (which stays available as a
    per-row column function for small inputs), but the relational shape is
    what scales.  Returns (id_col, simhash).
    """
    toks = _ensure_parallelism(df, id_col).select(
        F.col(id_col),
        F.explode(distinct_tokens(F.col(text_col))).alias("tok"),
    )
    hashed = toks.select(F.col(id_col), h32(F.col("tok")).alias("h"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(32)
        ]
    )
    sim = None
    for b in range(32):
        term = F.when(F.col(f"v{b}") >= 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select(F.col(id_col), sim.alias("simhash"))


def simhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """SimHash signature per document + exact-signature grouping.

    Returns (doc_id, simhash, keep_id) where keep_id is the smallest doc id
    sharing the same 32-bit signature.  Near-dup (hamming<=k) variants join
    on rotated/banded signature pieces; the exact-signature group is the
    degenerate k=0 case and the one with a clean SQL oracle.
    """
    s = simhash_signatures(df, text_col, id_col)
    w = Window.partitionBy("simhash")
    return s.select(
        F.col(id_col),
        "simhash",
        F.min(id_col).over(w).alias("keep_id"),
    )


def simhash_signatures64(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Relational 64-bit SimHash as TWO 32-bit halves (sim_hi, sim_lo).

    The token's 64-bit hash is (h32('x:'||tok) << 32) | h32(tok); keeping
    the halves in separate non-negative longs sidesteps int64 sign-bit
    pitfalls in both engines (bit 63 would flip the sign, making shifts and
    band masks engine-dependent) while staying bit-for-bit oracle-checkable.
    Same one-pass shape as :func:`simhash_signatures`: explode distinct
    tokens, hash once, 64 flat ±1 vote sums in one map-side-combined
    groupBy.  Returns (id_col, sim_hi, sim_lo).
    """
    toks = _ensure_parallelism(df, id_col).select(
        F.col(id_col),
        F.explode(distinct_tokens(F.col(text_col))).alias("tok"),
    )
    hashed = toks.select(
        F.col(id_col),
        h32(F.col("tok")).alias("h_lo"),
        h32(F.concat(F.lit("x:"), F.col("tok"))).alias("h_hi"),
    )
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(half), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v_{half}_{b}")
            for half in ("h_hi", "h_lo")
            for b in range(32)
        ]
    )

    def _pack(half: str):
        sim = None
        for b in range(32):
            term = F.when(
                F.col(f"v_{half}_{b}") >= 0, F.lit(2 ** b).cast("long")
            ).otherwise(F.lit(0))
            sim = term if sim is None else sim + term
        return sim

    return votes.select(
        F.col(id_col), _pack("h_hi").alias("sim_hi"), _pack("h_lo").alias("sim_lo")
    )


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash64) <= max_hamming.

    Candidate generation by 4 × 16-bit band blocking over the 64-bit
    signature: two signatures within hamming 3 must agree on at least one
    of the 4 disjoint 16-bit blocks (pigeonhole), then exact hamming verify
    inside the bucket.  Returns (id_a, id_b, hamming).

    Scale math (why 16-bit bands): each band has 2^16 = 65,536 distinct
    keys, so expected bucket size is N/65,536 and the within-bucket
    self-join is (N/65,536)² per band — vs the previous 32-bit/8-bit-band
    scheme whose 256 keys per band collapsed to (N/256)² pairs (already
    14k pairs at 500 docs).  At 10^8 docs: ~1.5k docs/bucket → ~10^6
    comparisons per bucket, tractable; the 8-bit scheme would be ~10^11.
    """
    s = simhash_signatures64(df, text_col, id_col)
    blocks = [
        F.shiftright(F.col("sim_lo"), 0).bitwiseAND(F.lit(0xFFFF)),
        F.shiftright(F.col("sim_lo"), 16).bitwiseAND(F.lit(0xFFFF)),
        F.shiftright(F.col("sim_hi"), 0).bitwiseAND(F.lit(0xFFFF)),
        F.shiftright(F.col("sim_hi"), 16).bitwiseAND(F.lit(0xFFFF)),
    ]
    bands = s.select(
        F.col(id_col),
        "sim_hi",
        "sim_lo",
        F.explode(
            F.array(*[
                F.concat(F.lit(f"{i}|"), blk.cast("string"))
                for i, blk in enumerate(blocks)
            ])
        ).alias("block"),
    )
    a = bands.select(
        "block", F.col(id_col).alias("id_a"),
        F.col("sim_hi").alias("hi_a"), F.col("sim_lo").alias("lo_a"),
    )
    b = bands.select(
        "block", F.col(id_col).alias("id_b"),
        F.col("sim_hi").alias("hi_b"), F.col("sim_lo").alias("lo_b"),
    )
    return (
        a.join(b, "block")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (
                F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
                + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, candidates: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.5) -> DataFrame:
    """Exact token-set Jaccard verification of candidate pairs.

    ``candidates`` is an (id_a, id_b) DataFrame (e.g. from
    :func:`minhash_lsh_candidates`).  Jaccard is computed relationally —
    explode tokens, semi-join-count the intersection — never materializing
    an all-pairs cross product.  Returns (id_a, id_b, jaccard) filtered to
    >= threshold, jaccard rounded to 6 d.p. for stable comparison.
    """
    toks = _ensure_parallelism(df, id_col).select(
        F.col(id_col), F.explode(distinct_tokens(F.col(text_col))).alias("tok")
    )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))

    ta = toks.select(F.col(id_col).alias("id_a"), "tok")
    tb = toks.select(F.col(id_col).alias("id_b"), "tok")
    common = (
        candidates.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def embedding_near_dup(emb: DataFrame, vec_col: str = "embedding",
                       id_col: str = "vec_id", threshold: float = 0.95,
                       n_planes: int = 16) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-sketch LSH.

    Bucket by an ``n_planes``-bit deterministic sign sketch (coordinate
    comparisons, so the oracle reproduces it with plain list indexing),
    then exact cosine inside the bucket.  Returns (id_a, id_b, cosine).

    Scale: the sketch is the shuffle key; exact cosine runs only within a
    bucket (expected size |corpus| / 2^n_planes).  Default 16 planes =
    65,536 buckets — at 10^8 vectors ~1.5k/bucket → ~10^6 in-bucket
    comparisons; 8 planes (256 buckets) would be (N/256)², a scale-killer.
    Recall is a knob: fewer planes → bigger buckets → higher recall.
    """
    from .similarity import cosine_expr, sketch_expr

    sk = emb.select(
        F.col(id_col),
        F.col(vec_col),
        sketch_expr(F.col(vec_col), n_planes).alias("sketch"),
    )
    a = sk.select("sketch", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = sk.select("sketch", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, "sketch")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 20) -> DataFrame:
    """Connected components over an undirected pair list — the step that
    turns verified duplicate PAIRS into duplicate CLUSTERS (one canonical
    keeper per transitive group), which is what a corpus-dedup pipeline
    actually deletes by.

    Algorithm: iterative min-label propagation.  Each round every node
    offers its current label (initially its own id) to its neighbours and
    keeps the minimum it hears; the fixpoint labels every node with the
    smallest node id in its component.  Rounds converge in O(component
    diameter) — near-dup graphs are locally dense (LSH candidates arrive a
    whole bucket at a time, so components are unions of near-cliques) and
    diameters stay small; ``max_iter`` bounds the pathological chain case.
    For adversarial long-chain graphs swap in alternating large-star /
    small-star (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — same interface, O(log^2 n) rounds.

    Scale: each round is ONE hash-shuffle of (edges ⋈ labels) on the node
    key plus a map-side-combined min — no global structure, no driver
    state.  Lineage is truncated every round (``localCheckpoint``), or the
    plan would double each iteration.  Convergence is detected with a
    1-row aggregate on a monotone potential (labels only ever decrease, so
    an unchanged SUM(label) means a fixpoint) — no second join.

    Returns (node, cluster_id): every node that appears in ``pairs``,
    labelled with the min node id reachable from it.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = fwd.unionByName(rev).distinct().persist()

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # decimal(38,0) potential: SUM over bigint labels must not overflow
    potential = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("p")
    ).collect()[0]["p"]

    for _ in range(max_iter):
        offers = (
            edges.join(labels, edges["src"] == labels["node"])
            .select(F.col("dst").alias("node"), F.col("label"))
        )
        new_labels = (
            labels.unionByName(offers)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_potential = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("p")
        ).collect()[0]["p"]
        labels = new_labels
        if new_potential == potential:
            break
        potential = new_potential

    edges.unpersist()
    return labels.select("node", F.col("label").alias("cluster_id"))


def dup_clusters(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", num_perm: int = 16, bands: int = 4,
                 shingle_k: int = 3, threshold: float = 0.3) -> DataFrame:
    """End-to-end duplicate-cluster resolution: MinHash-LSH candidates →
    exact n-gram-Jaccard verification → connected components → per-cluster
    size.  Returns (doc_id, cluster_id, cluster_size) for every document
    in a verified duplicate cluster; ``cluster_id`` is the smallest doc_id
    in the cluster (the canonical keeper a dedup pass retains)."""
    cand = minhash_lsh_candidates(
        docs, text_col, id_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k,
    )
    verified = ngram_jaccard_pairs(
        docs, cand, text_col, id_col, threshold=threshold
    ).select("id_a", "id_b")
    cc = connected_components(verified)
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return cc.join(sizes, "cluster_id").select(
        F.col("node").alias(id_col), "cluster_id", "cluster_size"
    )


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every ``k``-char gram, slide a
    window of ``w`` consecutive gram hashes, select the minimum of each
    window; the distinct selected hashes are the document's fingerprint
    set.  Guarantees any shared substring of length ≥ ``k + w - 1`` yields
    at least one shared fingerprint, with expected density 2/(w+1) — the
    local-sampling property plain "every i-th hash" sampling lacks.

    Relational plan: pos-explode the gram starts (``sequence`` + explode),
    ``h32`` each gram, running window-min per doc (rows between CURRENT and
    w-1 FOLLOWING, full windows only), then one per-doc aggregate.  The
    explode is O(len) rows/doc but slim (id, pos, h) — at 100 TB this runs
    embarrassingly parallel after a keyed repartition, and the only shuffle
    is the final per-id aggregate.

    Returns (id_col, n_fp, fp_digest): fingerprint-set size and the ``h32``
    of the sorted comma-joined set — a compact set identity two docs can be
    compared on (equal digests ⇒ near-certain containment/clone).
    """
    d = _ensure_parallelism(docs.select(id_col, text_col), id_col)
    n_grams = F.greatest(F.length(F.col(text_col)) - k + 1, F.lit(1))
    g = d.select(
        F.col(id_col),
        n_grams.alias("__n"),
        F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"),
        F.col(text_col),
    ).select(
        id_col,
        "__n",
        "pos",
        h32(F.col(text_col).substr(F.col("pos"), F.lit(k))).alias("h"),
    )
    win = (
        Window.partitionBy(id_col).orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    selected = (
        g.select(
            id_col, "pos", "__n", F.min("h").over(win).alias("fp")
        )
        .where(F.col("pos") <= F.col("__n") - w + 1)
    )
    return (
        selected.groupBy(id_col)
        .agg(F.array_sort(F.collect_set("fp")).alias("fps"))
        .select(
            id_col,
            F.size("fps").cast("long").alias("n_fp"),
            h32(F.array_join(F.transform("fps", lambda x: x.cast("string")),
                             ",")).alias("fp_digest"),
        )
    )


def cdc_chunk_stats(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 8,
                    mask_bits: int = 5) -> DataFrame:
    """Content-defined chunking dedup (the rsync/FastCDC primitive):
    chunk boundaries land where the ``k``-gram hash has its low
    ``mask_bits`` bits zero (expected chunk ≈ 2^mask_bits chars), so an
    insertion/deletion only re-chunks its neighborhood — unlike fixed-width
    blocks, shared passages between documents keep identical chunk hashes.
    The cross-document complement to :func:`winnow_fingerprints` (which
    samples per-doc fingerprints): this finds *which spans* are shared —
    boilerplate passages, syndicated quotes, licence blocks.

    Relational plan: gram-hash explode (slim id/pos/h rows), boundary
    filter, ``lead`` window for spans, substring-hash per chunk, then one
    groupBy(chunk hash) over the corpus to mark chunks appearing in >1 doc
    and a per-doc rollup.  Two shuffles total (chunk-hash agg + doc agg),
    both on uniform hash keys; at 100 TB the chunk table is the dedup
    ledger an Iceberg maintenance job would persist.

    Returns (id_col, n_chunks, shared_chunks, shared_frac): chunk count,
    chunks whose hash occurs in ≥2 distinct docs, and the char fraction of
    the doc covered by shared chunks (rounded to 6).
    """
    d = _ensure_parallelism(docs.select(id_col, text_col), id_col)
    text_len = F.length(F.col(text_col))
    n_grams = F.greatest(text_len - k + 1, F.lit(1))
    g = d.select(
        F.col(id_col),
        text_len.alias("__len"),
        F.col(text_col),
        F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"),
    )
    h = h32(F.col(text_col).substr(F.col("pos"), F.lit(k)))
    mask = (1 << mask_bits) - 1
    starts = g.where(
        (F.col("pos") == 1) | (h.bitwiseAND(F.lit(mask)) == 0)
    )
    nxt = F.lead("pos").over(
        Window.partitionBy(id_col).orderBy("pos")
    )
    chunks = starts.select(
        F.col(id_col),
        "__len",
        "pos",
        (F.coalesce(nxt, F.col("__len") + 1) - F.col("pos")).alias("clen"),
        F.col(text_col),
    ).select(
        id_col,
        "__len",
        "pos",
        "clen",
        h32(F.col(text_col).substr(F.col("pos"), F.col("clen"))).alias("ch"),
    )
    shared = (
        chunks.groupBy("ch")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("ch", F.lit(1).alias("__shared"))
    )
    marked = chunks.join(shared, "ch", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.coalesce(F.col("__shared"), F.lit(0)))
            .cast("long").alias("shared_chunks"),
            F.round(
                F.sum(
                    F.when(F.col("__shared").isNotNull(), F.col("clen"))
                    .otherwise(F.lit(0))
                ).cast("double")
                / F.max("__len").cast("double"),
                6,
            ).alias("shared_frac"),
        )
    )


def containment_pairs(df: DataFrame, candidates: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      threshold: float = 0.5) -> DataFrame:
    """Asymmetric token-set *containment* verification of candidate pairs.

    Jaccard (:func:`ngram_jaccard_pairs`) misses the near-superset case
    that dominates web dedup: a page that quotes another wholesale (A ⊂ B
    — syndicated articles, boilerplate-wrapped reposts) has low Jaccard
    when |B| >> |A| but containment C(A,B) = |A∩B| / |A| ≈ 1.  Broder's
    resemblance/containment split; the training-data consequence is that
    keeping both A and B double-counts A's tokens.

    Same relational skeleton as the Jaccard verifier — explode distinct
    tokens, count the intersection via the candidate join, never an
    all-pairs product — with both directed scores emitted so the caller
    can tell which side is the contained one.  Candidate generation stays
    LSH's job; this is the exact verify.

    Returns (id_a, id_b, cont_a_in_b, cont_b_in_a) filtered to
    max(cont) >= threshold, scores rounded to 6 d.p.
    """
    toks = _ensure_parallelism(df, id_col).select(
        F.col(id_col), F.explode(distinct_tokens(F.col(text_col))).alias("tok")
    )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))

    ta = toks.select(F.col(id_col).alias("id_a"), "tok")
    tb = toks.select(F.col(id_col).alias("id_b"), "tok")
    common = (
        candidates.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a", "id_b",
            F.round(F.col("common") / F.col("na"), 6).alias("cont_a_in_b"),
            F.round(F.col("common") / F.col("nb"), 6).alias("cont_b_in_a"),
        )
        .where(
            F.greatest(F.col("cont_a_in_b"), F.col("cont_b_in_a")) >= threshold
        )
    )


def resolve_clusters_keep_best(docs: DataFrame, clusters: DataFrame,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> DataFrame:
    """Quality-aware duplicate-cluster resolution: instead of
    :func:`dup_clusters`' min-id canonical keeper, retain the HIGHEST
    quality document of each verified cluster (ties → min id) — the policy
    an LLM-corpus dedup pass actually wants, since near-dup groups often
    mix a clean original with boilerplate-wrapped mirrors.

    ``clusters`` is (id_col, cluster_id[, cluster_size]) — e.g.
    :func:`dup_clusters` output.  Quality is the engine's native
    ``quality_score`` rounded to 6 d.p. (the established cross-engine
    float contract), and the winner is resolved with the deterministic
    two-step max join (max quality per cluster, then min id among the
    maxima) — one groupBy per step on the cluster key, no windows, so the
    plan is a pair of hash-partitioned aggregates at any scale.

    Returns (id_col, cluster_id, quality, keep): every clustered doc,
    flagged keep/drop; exactly one keep per cluster.
    """
    from ..functions.text import quality_score

    q = docs.select(
        F.col(id_col), F.round(quality_score(F.col(text_col)), 6).alias("quality")
    )
    member = clusters.select(id_col, "cluster_id").join(q, id_col)
    best_q = member.groupBy("cluster_id").agg(F.max("quality").alias("best_q"))
    keeper = (
        member.join(best_q, "cluster_id")
        .where(F.col("quality") == F.col("best_q"))
        .groupBy("cluster_id")
        .agg(F.min(id_col).alias("keep_id"))
    )
    return member.join(keeper, "cluster_id").select(
        id_col, "cluster_id", "quality",
        (F.col(id_col) == F.col("keep_id")).alias("keep"),
    )


def minhash_calibration(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", num_perm: int = 16,
                        bands: int = 4, shingle_k: int = 3) -> DataFrame:
    """MinHash estimator calibration over the LSH candidate pairs.

    For every banding candidate pair, reports the signature-agreement
    estimate ``est_jaccard = |{p : h_p(a) = h_p(b)}| / num_perm`` next to
    the EXACT shingle-set Jaccard, plus ``abs_err``.  This is the
    pre-flight evidence for the dedup threshold choice: before trusting
    "minhash >= 0.7 means duplicate" on the 100 TB corpus, measure how
    tight the num_perm-permutation estimator actually is on a sample —
    the empirical counterpart of the sd = sqrt(J(1-J)/num_perm) bound.

    Scale shape: reuses the banded candidate generation (never all-pairs);
    the signature join is two hash joins against the num_perm flat-column
    signature table; the exact Jaccard is the same explode/semi-join-count
    skeleton as :func:`ngram_jaccard_pairs` but over SHINGLE sets (what
    minhash actually estimates, unlike the token-set verifier).  Pairs
    whose bucket collision shares no shingle at all surface with
    ``jaccard = 0`` (left join + coalesce), not silently dropped — those
    are exactly the false-positive rate the calibration wants visible.

    Returns (id_a, id_b, est_jaccard, jaccard, abs_err) ordered by
    (id_a, id_b).
    """
    cand = minhash_lsh_candidates(df, text_col, id_col, num_perm, bands,
                                  shingle_k)
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_k)
    sa = sigs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"h{p}").alias(f"a{p}") for p in range(num_perm)],
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"h{p}").alias(f"b{p}") for p in range(num_perm)],
    )
    matches = None
    for p in range(num_perm):
        m = F.when(F.col(f"a{p}") == F.col(f"b{p}"), 1).otherwise(0)
        matches = m if matches is None else matches + m
    est = cand.join(sa, "id_a").join(sb, "id_b").select(
        "id_a", "id_b",
        (matches.cast("double") / F.lit(float(num_perm))).alias("est_j"),
    )

    sh = _ensure_parallelism(df, id_col).select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("s"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    ha = sh.select(F.col(id_col).alias("id_a"), "s")
    hb = sh.select(F.col(id_col).alias("id_b"), "s")
    common = (
        cand.join(ha, "id_a")
        .join(hb, ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    joined = (
        est.join(common, ["id_a", "id_b"], "left")
        .na.fill({"common": 0})
        .join(sizes.select(F.col(id_col).alias("id_a"),
                           F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"),
                           F.col("n").alias("nb")), "id_b")
    )
    jac = (
        F.col("common").cast("double")
        / (F.col("na") + F.col("nb") - F.col("common")).cast("double")
    )
    return joined.select(
        "id_a", "id_b",
        F.round(F.col("est_j"), 6).alias("est_jaccard"),
        F.round(jac, 6).alias("jaccard"),
        F.round(F.abs(F.col("est_j") - jac), 6).alias("abs_err"),
    ).orderBy("id_a", "id_b")


def levenshtein_verify(df: DataFrame, candidates: DataFrame | None = None,
                       text_col: str = "text", id_col: str = "doc_id",
                       prefix_len: int = 256, max_dist: int | None = None,
                       num_perm: int = 16, bands: int = 4,
                       shingle_k: int = 3) -> DataFrame:
    """Edit-distance verification of near-dup candidate pairs.

    LSH banding (or any supplied ``candidates`` frame with id_a < id_b)
    proposes pairs; this confirms them with a character-level Levenshtein
    distance computed JVM-side (``F.levenshtein``, whole-stage codegen —
    no Python) over *bounded prefixes*.  The set-based verifiers
    (:func:`ngram_jaccard_pairs`, :func:`minhash_calibration`) are blind
    to token ORDER; edit distance is the order-sensitive second opinion a
    template-heavy web corpus needs (two pages with identical word bags
    but shuffled sections are not editorial duplicates).

    Scale shape — never all-pairs:

    * pairs come from the banded candidate generator (bucketed self-join);
    * the length-difference lower bound ``|len(a)-len(b)| <= lev(a,b)``
      prunes pairs BEFORE the quadratic-cost kernel runs when
      ``max_dist`` is set (classic edit-distance filter pushup);
    * prefix truncation caps per-row DP cost at ``prefix_len**2``
      regardless of document size — the knob that keeps the kernel O(1)
      per pair at 100 TB.

    Returns (id_a, id_b, len_a, len_b, lev_dist, norm_sim) where
    ``norm_sim = 1 - lev/greatest(len_a, len_b)`` over the truncated
    prefixes (1.0 when both prefixes are empty).
    """
    if candidates is None:
        candidates = minhash_lsh_candidates(df, text_col, id_col, num_perm,
                                            bands, shingle_k)
    pref = df.select(
        F.col(id_col),
        F.substring(F.col(text_col), 1, prefix_len).alias("pref"),
    ).select(
        id_col, "pref", F.length("pref").cast("long").alias("plen"),
    )
    a = pref.select(F.col(id_col).alias("id_a"),
                    F.col("pref").alias("pref_a"),
                    F.col("plen").alias("len_a"))
    b = pref.select(F.col(id_col).alias("id_b"),
                    F.col("pref").alias("pref_b"),
                    F.col("plen").alias("len_b"))
    paired = candidates.join(a, "id_a").join(b, "id_b")
    if max_dist is not None:
        # lower-bound prune: skip the DP whenever it provably exceeds the
        # threshold — this runs on two already-materialized length columns
        paired = paired.where(
            F.abs(F.col("len_a") - F.col("len_b")) <= F.lit(max_dist)
        )
    lev = F.levenshtein(F.col("pref_a"), F.col("pref_b")).cast("long")
    denom = F.greatest(F.col("len_a"), F.col("len_b"))
    out = paired.withColumn("lev_dist", lev).select(
        "id_a", "id_b", "len_a", "len_b", "lev_dist",
        F.when(denom == 0, F.lit(1.0)).otherwise(
            F.round(F.lit(1.0) - F.col("lev_dist").cast("double")
                    / denom.cast("double"), 6)
        ).alias("norm_sim"),
    )
    if max_dist is not None:
        out = out.where(F.col("lev_dist") <= F.lit(max_dist))
    return out.orderBy("id_a", "id_b")
