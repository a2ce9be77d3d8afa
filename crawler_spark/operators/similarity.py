"""Similarity search over an embedding column (``array<float/double>``).

Two paths:

* :func:`cosine_topk` — brute-force exact top-k: broadcast the (small) query
  set against the corpus, cosine per pair, per-query window top-k.  The
  exactness baseline; at 100 TB this is the pattern for "few queries, huge
  corpus" (the corpus is never shuffled — the query side broadcasts, the
  ranking is a per-query partial top-k that AQE keeps map-side).
* :func:`lsh_bucketed_topk` — the scale path: both sides keyed by a sign
  sketch, joined per bucket, exact cosine + top-k only inside the bucket
  (approximate: recall < 1 by design, measured in tests).

All arithmetic is native Spark ``aggregate``/``zip_with`` expressions — a
strict left fold so the floating-point result is reproducible and matches
the DuckDB oracle's ``list_reduce`` fold; outputs round to 6 d.p.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Strict left-fold dot product: sum_i a[i]*b[i] (no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def sketch_expr(vec: Column, n_planes: int = 8) -> Column:
    """Deterministic sign sketch: bit p = (vec[2p+1] > vec[2p+2]), 1-indexed.

    Pairwise coordinate comparisons — an order-statistics LSH that needs no
    random-plane table, so the DuckDB oracle reproduces it with plain list
    indexing.  Cosine-close vectors agree on most comparisons; used only
    for candidate *bucketing*, never for the final score.
    """
    bits = [
        F.when(
            F.element_at(vec, 2 * p + 1) > F.element_at(vec, 2 * p + 2),
            F.lit(2 ** p).cast("long"),
        ).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    out = bits[0]
    for c in bits[1:]:
        out = out + c
    return out


def suggest_n_planes(corpus_rows: int, target_candidates: int = 32,
                     multiprobe: bool = True) -> int:
    """Plane count sizing rule: smallest p whose expected candidate count
    per query — N·(1+p)/2^p with hamming-1 multi-probe, N/2^p without —
    stays at or under ``target_candidates``.

    The bucket count must scale with the corpus: 500 vectors want ~8
    planes, 10^8 vectors want ~27 — a fixed small p collapses to
    (N/2^p)² in-bucket work at scale, a fixed large p starves small
    corpora of candidates (recall → 0).
    """
    n = max(corpus_rows, 1)
    for p in range(1, 33):
        probes = (1 + p) if multiprobe else 1
        if n * probes / (2 ** p) <= target_candidates:
            return p
    return 32


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force cosine top-k per query.

    Returns (query_id, neighbor_id, cosine, rank), rank 1..k, neighbors
    exclude the query row itself.  Ranking key is cosine rounded to 9 d.p.
    desc then neighbor id asc — fully deterministic across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 9).alias("cos9"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos9").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos9"), 6).alias("cosine"),
            "rank",
        )
    )


def assign_centroids(df: DataFrame, centroids: DataFrame,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Nearest-centroid assignment (the IVF coarse quantizer).

    ``centroids``: (centroid_id, cvec) — small, broadcast.  One cross join
    against the (few) centroids + a min_by aggregation; the corpus is
    scanned once and never self-joined.
    """
    scored = df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine_expr(F.col(vec_col), F.col("cvec")).alias("c_sim"),
    )
    return scored.groupBy(id_col).agg(
        # ordering key = (cosine desc, centroid_id asc): exact-cosine ties
        # must break deterministically or assignment differs run-to-run
        F.min_by(
            F.struct("centroid_id", vec_col, "c_sim"),
            F.struct(
                (-F.col("c_sim")).alias("neg_sim"),
                F.col("centroid_id").alias("cid"),
            ),
        ).alias("best")
    ).select(
        F.col(id_col),
        F.col(f"best.{vec_col}").alias(vec_col),
        F.col("best.centroid_id").alias("centroid_id"),
    )


def pick_centroids(corpus: DataFrame, n_centroids: int = 8,
                   vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Deterministic centroid seed: the ``n_centroids`` vectors with the
    smallest ``(h32(id), id)`` key.

    ``orderBy().limit(n)`` compiles to TakeOrderedAndProject — a map-side
    partial top-k per partition merged on the driver — so there is NO
    global sort and NO single-partition window anywhere (the previous
    ``Window.orderBy(id)`` funneled the whole corpus through one task; a
    scale-killer, asserted gone in tests/test_plans.py).  The portable h32
    key makes the pick a uniform pseudo-random sample of the corpus while
    staying bit-reproducible in the DuckDB oracle.  Exactly ``n_centroids``
    rows reach the driver — constant, never corpus-sized; a corpus smaller
    than ``n_centroids`` simply yields fewer centroids (no division edge).

    A k-means refinement would iterate assign→mean; the seed alone already
    gives the IVF bucketing structure (and stays fully deterministic)."""
    from ..functions.text import h32

    picked = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("hk", h32(F.col(id_col).cast("string")))
        .orderBy(F.col("hk").asc(), F.col(id_col).asc())
        .limit(n_centroids)
        .collect()
    )
    rows = [(cid, list(r[vec_col])) for cid, r in enumerate(picked)]
    return corpus.sparkSession.createDataFrame(
        rows, "centroid_id int, cvec array<double>"
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 8, nprobe: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest centroid; each
    query probes its ``nprobe`` nearest centroid buckets only.

    Same output shape as :func:`cosine_topk`; recall < 1 by design.  Scale:
    the corpus is written partitioned by centroid once; a query touches
    nprobe/n_centroids of the data.
    """
    cents = pick_centroids(corpus, n_centroids, vec_col, id_col)
    bucketed = assign_centroids(corpus, cents, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "centroid_id",
    )
    q_scored = queries.crossJoin(F.broadcast(cents)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("centroid_id"),
        cosine_expr(F.col(vec_col), F.col("cvec")).alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("c_sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q_scored.withColumn("probe_rank", F.row_number().over(wq))
        .where(F.col("probe_rank") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    scored = (
        bucketed.join(F.broadcast(probes), "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 9).alias("cos9"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos9").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos9"), 6).alias("cosine"),
            "rank",
        )
    )


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      n_planes: int = 16, multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sketch bucket —
    plus, with ``multiprobe``, every bucket at hamming distance 1 from it.

    Same output shape as :func:`cosine_topk`; recall measured (not asserted
    =1) in tests.  At scale the corpus is bucketed once (write-side
    partitionBy(sketch)); a query probes 1 + n_planes of the 2^n_planes
    buckets, so the candidate set is ~(1+n_planes)/2^n_planes of the
    corpus.  Default 16 planes = 65,536 buckets keeps in-bucket work
    (N/65,536 candidates per probe) tractable at 10^8+ vectors, and
    multi-probe buys back the recall that finer bucketing costs — the
    standard trade vs the old 6-plane/64-bucket default whose buckets held
    N/64 vectors (quadratic blowup at scale).
    """
    q_sketch = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sketch_expr(F.col(vec_col), n_planes).alias("sketch"),
    )
    if multiprobe:
        probes = F.array(
            F.col("sketch"),
            *[
                F.col("sketch").bitwiseXOR(F.lit(2 ** p).cast("long"))
                for p in range(n_planes)
            ],
        )
        q = q_sketch.select(
            "query_id", "qv", F.explode(probes).alias("sketch")
        )
    else:
        q = q_sketch
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sketch_expr(F.col(vec_col), n_planes).alias("sketch"),
    )
    scored = (
        c.join(F.broadcast(q), "sketch")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 9).alias("cos9"),
        )
        # a neighbor can surface in several probe buckets — dedup before rank
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos9").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos9"), 6).alias("cosine"),
            "rank",
        )
    )


def kmeans_refine(corpus: DataFrame, n_centroids: int = 8, iters: int = 3,
                  vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Lloyd's k-means with a FIXED iteration count (the deterministic,
    oracle-checkable variant — convergence-test loops are not reproducible
    across engines, a fixed unroll is).

    Per round: broadcast the k centroids, assign by (cosine desc,
    centroid_id asc) exactly like :func:`assign_centroids`, then recompute
    each centroid as the element-wise mean of its members via ``posexplode``
    — the aggregation keys on (centroid_id, dim), uniform and skew-free, and
    only k x dim averaged doubles ever reach the driver (constant, never
    corpus-sized).  Collecting the means per round keeps every round's plan
    one scan + one aggregate instead of an exponentially nesting lineage;
    cache ``corpus`` when calling with iters > 1 on a real cluster.

    Means are rounded to 12 d.p. on both engines: the quantization is far
    above summation-order ulp noise and far below any real signal, so the
    next round's cosine comparisons are bit-identical in Spark and DuckDB.

    A cluster that loses all members simply drops out of the next round
    (both engines aggregate only non-empty groups).  Returns the refined
    (centroid_id, cvec) — broadcastable, k rows.
    """
    from pyspark import StorageLevel

    # each Lloyd round re-scans the corpus; persist the slim projection for
    # the duration of the refinement (unpersisted before returning — the
    # final means are already collected, so nothing downstream re-reads it)
    slim = corpus.select(F.col(id_col), F.col(vec_col)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cents = pick_centroids(slim, n_centroids, vec_col, id_col)
    spark = corpus.sparkSession
    for _ in range(iters):
        assigned = assign_centroids(slim, cents, vec_col, id_col)
        means = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.round(F.avg("val"), 12).alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id",
                F.transform("pm", lambda s: s["m"]).alias("cvec"),
            )
            .collect()
        )
        cents = spark.createDataFrame(
            [(r["centroid_id"], r["cvec"]) for r in means],
            "centroid_id int, cvec array<double>",
        )
    slim.unpersist(False)
    return cents


def kmeans_assign(corpus: DataFrame, n_centroids: int = 8, iters: int = 3,
                  vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Final per-vector cluster assignment after :func:`kmeans_refine`.

    Returns (id_col, centroid_id, cosine) — cosine to the winning centroid,
    rounded to 6.  One broadcast cross join + min_by; the corpus is never
    shuffled or self-joined.
    """
    cents = kmeans_refine(corpus, n_centroids, iters, vec_col, id_col)
    scored = corpus.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col("centroid_id"),
        cosine_expr(F.col(vec_col), F.col("cvec")).alias("c_sim"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.min_by(
                F.struct("centroid_id", "c_sim"),
                F.struct(
                    (-F.col("c_sim")).alias("neg_sim"),
                    F.col("centroid_id").alias("cid"),
                ),
            ).alias("best")
        )
        .select(
            id_col,
            F.col("best.centroid_id").alias("centroid_id"),
            F.round(F.col("best.c_sim"), 6).alias("cosine"),
        )
    )


def semdedup(corpus: DataFrame, n_centroids: int = 8, iters: int = 3,
             threshold: float = 0.85,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by k-means bucketing +
    within-cluster pairwise cosine — pairs above ``threshold`` drop the
    greater id, survivors keep their cluster label.

    The all-pairs comparison happens ONLY inside a cluster: with k
    clusters the work is k * (N/k)^2 — at 100 TB you raise k with the
    corpus (exactly like the IVF/LSH bucket sizing) so in-cluster
    candidate sets stay bounded; the cluster id is a uniform join key.
    Cosine is rounded to 6 before the threshold so the boundary gates
    identically in both engines.

    Returns (id_col, centroid_id) for surviving vectors.
    """
    from pyspark import StorageLevel

    cents = kmeans_refine(corpus, n_centroids, iters, vec_col, id_col)
    # the assignment feeds both sides of the in-cluster pair join AND the
    # survivor anti-join — persist it (LRU-evicted) instead of recomputing
    # the broadcast-assign three times
    assigned = assign_centroids(corpus, cents, vec_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "centroid_id"
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "centroid_id"
    )
    dropped = (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(cosine_expr(F.col("va"), F.col("vb")), 6) >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dropped, id_col, "left_anti")
        .select(id_col, "centroid_id")
    )


def sq8_stats(corpus: DataFrame, vec_col: str = "embedding") -> tuple:
    """Per-dimension (lo, hi) quantization codebook over the corpus — the
    scalar-quantization analog of the IVF centroid pick: one tiny
    posexplode + groupBy(dim) job whose result (2 × dim floats) is driver
    metadata, embedded as literal arrays in the quantize expression (at
    1000 executors this is a broadcast of a few hundred bytes, trained once
    per corpus snapshot and reused for every query batch)."""
    rows = (
        corpus.select(F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("dim").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("dim").collect()
    )
    return [r["lo"] for r in rows], [r["hi"] for r in rows]


def sq8_quantize(vec: Column, lo: list, hi: list) -> Column:
    """int8-range scalar quantization: q_i = floor((x-lo)*255/(hi-lo)+.5),
    clamped to [0,255]; constant dimensions map to 0.  Pure ``transform``
    expression — the quantized vector is 4-8× smaller on the wire/in state
    than float32/64, and candidate scoring below runs in integer codegen."""
    lo_a = F.array(*[F.lit(float(v)) for v in lo])
    hi_a = F.array(*[F.lit(float(v)) for v in hi])
    return F.transform(
        vec,
        lambda x, i: F.when(
            F.element_at(hi_a, i + 1) == F.element_at(lo_a, i + 1),
            F.lit(0).cast("long"),
        ).otherwise(
            F.least(
                F.lit(255).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(
                        (x - F.element_at(lo_a, i + 1)) * 255.0
                        / (F.element_at(hi_a, i + 1) - F.element_at(lo_a, i + 1))
                        + 0.5
                    ),
                ),
            )
        ),
    )


def sq8_decode(codes: Column, lo: list, hi: list) -> Column:
    """Decode SQ8 codes back to doubles: x̂_i = lo_i + (q_i·(hi_i-lo_i))/255.
    Scoring always runs on decoded values (the FAISS SQ semantics) — the
    raw-code dot product is NOT monotone in the true dot because the
    per-dimension affine offset introduces lo·x cross terms; measured on a
    random-unit-vector corpus it drops recall@5 to ~0.64, while decoded
    scoring holds ~1.0.  The compression win is storage/shuffle width (the
    codes are what an Iceberg corpus would persist, 4-8× narrower), not the
    scoring arithmetic."""
    lo_a = F.array(*[F.lit(float(v)) for v in lo])
    hi_a = F.array(*[F.lit(float(v)) for v in hi])
    return F.transform(
        codes,
        lambda x, i: F.element_at(lo_a, i + 1)
        + (x * (F.element_at(hi_a, i + 1) - F.element_at(lo_a, i + 1)))
        / F.lit(255.0),
    )


def sq8_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             rerank_factor: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """ANN top-k via int8 scalar quantization + exact rerank — the standard
    vector-store compression path (FAISS SQ8): quantize the corpus to
    per-dimension 8-bit codes, score candidates on the *decoded*
    approximation (see :func:`sq8_decode` for why never on raw codes),
    shortlist ``k·rerank_factor`` per query, then re-rank the shortlist on
    exact cosine over the original vectors.

    Same macro-shape as :func:`cosine_topk` (query side broadcast, corpus
    never shuffled); at scale the corpus scan reads the 1-byte codes and
    only the shortlist rows ever touch the full-width vectors.
    Deterministic: approximate and exact ties both break by neighbor id.
    Returns (query_id, neighbor_id, cosine, rank)."""
    lo, hi = sq8_stats(corpus, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sq8_decode(
            sq8_quantize(F.col(vec_col), lo, hi), lo, hi
        ).alias("cq"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sq8_decode(
            sq8_quantize(F.col(vec_col), lo, hi), lo, hi
        ).alias("qq"),
    )
    qdot = F.round(
        F.aggregate(
            F.zip_with("cq", "qq", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        9,
    )
    cand = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv", qdot.alias("qdot"))
    )
    w_q = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cand.withColumn("r", F.row_number().over(w_q))
        .where(F.col("r") <= k * rerank_factor)
    )
    w_c = Window.partitionBy("query_id").orderBy(
        F.col("cos9").desc(), F.col("neighbor_id").asc()
    )
    return (
        shortlist.select(
            "query_id", "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 9).alias("cos9"),
        )
        .withColumn("rank", F.row_number().over(w_c))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round(F.col("cos9"), 6).alias("cosine"), "rank")
    )


def truncation_recall(corpus: DataFrame, queries: DataFrame,
                      dims: tuple = (8, 16, 32), k: int = 5,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> DataFrame:
    """Matryoshka-style truncation analysis: recall@k of cosine top-k over
    only the first ``d`` dimensions versus the full-width exact top-k, per
    query and truncation width — the sizing study run before committing a
    100 TB corpus to a cheaper index width (half the dims = half the scan
    bytes and half the ANN memory, IF recall holds; this measures the IF).

    Pure composition of :func:`cosine_topk` over ``slice`` projections —
    one broadcast-probe pass per width, one join against the full-width
    reference set.  Returns (dim, query_id, recall) with recall rounded
    to 6, one row per (width, query).
    """
    exact = cosine_topk(corpus, queries, k=k, vec_col=vec_col,
                        id_col=id_col).select("query_id", "neighbor_id")
    parts = []
    for d in dims:
        trunc = F.slice(F.col(vec_col), 1, d).alias(vec_col)
        cd = corpus.select(F.col(id_col), trunc)
        qd = queries.select(F.col(id_col), trunc)
        top_d = cosine_topk(cd, qd, k=k, vec_col=vec_col, id_col=id_col)
        parts.append(
            top_d.select(
                F.lit(d).cast("long").alias("dim"), "query_id", "neighbor_id"
            )
        )
    approx = parts[0]
    for p in parts[1:]:
        approx = approx.unionByName(p)
    matched = approx.join(exact, ["query_id", "neighbor_id"], "left_semi")
    per_q = matched.groupBy("dim", "query_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    universe = approx.select("dim", "query_id").distinct()
    return (
        universe.join(per_q, ["dim", "query_id"], "left")
        .select(
            "dim", "query_id",
            F.round(
                F.coalesce(F.col("__n"), F.lit(0)).cast("double") / float(k), 6
            ).alias("recall"),
        )
    )


def embedding_outliers(corpus: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       z_threshold: float = 2.0) -> DataFrame:
    """Centroid-distance outlier pruning over an embedding column — the
    embedding-space curation step (CLIP-score-style filtering, broken-
    encoder detection) that complements SemDeDup: SemDeDup removes points
    too CLOSE to each other, this removes points too FAR from everything.

    Fully in-engine, zero driver-side math:

    * the corpus centroid is ONE per-dimension aggregate (posexplode →
      groupBy(pos) → avg, 12-d.p. quantized like the k-means centroids),
      reassembled into a 1-row array and broadcast-crossJoined back;
    * each vector's cosine to the centroid is a codegen zip_with/aggregate;
    * mean/std of the similarity distribution are one more scalar
      aggregate, broadcast back, with
      ``sigma = sqrt(max(E[s^2] - E[s]^2, 0))`` written out explicitly so
      both engines compute the identical population estimator;
    * a vector is an outlier when its z-score ``(s - mu) / sigma`` falls
      below ``-z_threshold`` (low similarity side — far from the corpus).

    At 100 TB: two scalar-sized shuffles (d-dimension centroid, 2-double
    stats) plus scan-stage projections — the same cost profile as a count.

    Returns (id_col, centroid_sim, z, outlier) rounded to 6 d.p.
    """
    pos_val = corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "val"))
    centroid = (
        pos_val.groupBy("pos")
        .agg(F.round(F.avg("val"), 12).alias("m"))
        .groupBy()
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda x: x["m"],
            ).alias("cvec")
        )
    )
    sims = corpus.crossJoin(F.broadcast(centroid)).select(
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("cvec")).alias("s"),
    )
    stats = sims.agg(
        F.avg("s").alias("mu"),
        F.sqrt(
            F.greatest(
                F.avg(F.col("s") * F.col("s")) - F.avg("s") * F.avg("s"),
                F.lit(0.0),
            )
        ).alias("sigma"),
    )
    z = (F.col("s") - F.col("mu")) / F.col("sigma")
    return sims.crossJoin(F.broadcast(stats)).select(
        id_col,
        F.round(F.col("s"), 6).alias("centroid_sim"),
        F.round(z, 6).alias("z"),
        (z <= F.lit(-z_threshold)).alias("outlier"),
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) — the canonical memory-bounded ANN index
# --------------------------------------------------------------------------

def l2sq_expr(a: Column, b: Column) -> Column:
    """Strict left-fold squared L2: sum_i (a[i]-b[i])^2 (no UDF) — the
    fold order is fixed, so DuckDB's explicit left-associated sum is
    bit-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _subvectors(df: DataFrame, m: int, subdim: int,
                vec_col: str, id_col: str, out_id: str) -> DataFrame:
    """(id, s, subv): split each vector into m contiguous subvectors via
    posexplode over an array of slices — scan-stage, no shuffle."""
    slices = F.array(*[
        F.slice(F.col(vec_col), s * subdim + 1, subdim) for s in range(m)
    ])
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(slices).alias("s", "subv"),
    )


def pq_train(corpus: DataFrame, m: int = 4, ksub: int = 8, iters: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id",
             dim: int | None = None) -> DataFrame:
    """Train PQ codebooks: per subspace, ``ksub`` centroids refined with a
    FIXED number of Lloyd rounds under squared-L2 (the PQ-native metric —
    Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011, public algorithm).

    Deterministic end to end, same recipe as :func:`kmeans_refine`:
    the seed is the ``ksub`` vectors with the smallest ``(h32(id), id)``
    key (TakeOrderedAndProject — no global sort), sliced into their m
    subvectors so subspace s's codebook starts from the same sample;
    each round assigns by (l2 asc, centroid_id asc) and recomputes
    per-(s, centroid, dim) means rounded to 12 d.p. — only
    ``m × ksub × dim/m = ksub × dim`` doubles ever reach the driver per
    round, constant at any corpus size.

    Returns (s, centroid_id, cvec) — m×ksub rows, broadcastable.
    """
    from pyspark import StorageLevel

    from ..functions.text import h32

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    subdim = dim // m
    spark = corpus.sparkSession

    seed = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("hk", h32(F.col(id_col).cast("string")))
        .orderBy(F.col("hk").asc(), F.col(id_col).asc())
        .limit(ksub)
        .collect()
    )
    cb_rows = [
        (s, j, [float(x) for x in r[vec_col][s * subdim:(s + 1) * subdim]])
        for j, r in enumerate(seed) for s in range(m)
    ]
    cb = spark.createDataFrame(
        cb_rows, "s int, centroid_id int, cvec array<double>"
    )

    subs = _subvectors(corpus, m, subdim, vec_col, id_col, "vid").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    for _ in range(iters):
        assigned = (
            subs.join(F.broadcast(cb), "s")
            .withColumn("d", l2sq_expr(F.col("subv"), F.col("cvec")))
            .groupBy("vid", "s")
            .agg(F.min_by(
                F.struct("centroid_id", "subv"),
                F.struct(F.col("d"), F.col("centroid_id").alias("cid")),
            ).alias("best"))
            .select("s", F.col("best.centroid_id").alias("centroid_id"),
                    F.col("best.subv").alias("subv"))
        )
        means = (
            assigned.select(
                "s", "centroid_id",
                F.posexplode(F.col("subv")).alias("pos", "val"),
            )
            .groupBy("s", "centroid_id", "pos")
            .agg(F.round(F.avg("val"), 12).alias("mv"))
            .groupBy("s", "centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mv")))
                 .alias("pm"))
            .select("s", "centroid_id",
                    F.transform("pm", lambda x: x["mv"]).alias("cvec"))
            .collect()
        )
        cb = spark.createDataFrame(
            [(r["s"], r["centroid_id"], r["cvec"]) for r in means],
            "s int, centroid_id int, cvec array<double>",
        )
    subs.unpersist(False)
    return cb


def pq_encode(corpus: DataFrame, codebooks: DataFrame, m: int = 4,
              vec_col: str = "embedding", id_col: str = "vec_id",
              dim: int | None = None) -> DataFrame:
    """Encode every vector as m codes — one pivoted row per vector
    (``id, c0..c{m-1}``), 1 byte/code at ksub<=256: the 64-double
    embedding becomes m bytes, the whole point of PQ at 100 TB.

    The pivot is a conditional-aggregation groupBy (exactly one non-null
    per (id, s)) rather than m rows, so downstream ADC adds the m
    distance terms in a FIXED left-to-right order — deterministic across
    engines, where a grouped SUM over m rows would be order-nondeterministic
    in the last ulp.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    subdim = dim // m
    assigned = (
        _subvectors(corpus, m, subdim, vec_col, id_col, id_col)
        .join(F.broadcast(codebooks), "s")
        .withColumn("d", l2sq_expr(F.col("subv"), F.col("cvec")))
        .groupBy(id_col, "s")
        .agg(F.min_by(
            "centroid_id",
            F.struct(F.col("d"), F.col("centroid_id").alias("cid")),
        ).alias("code"))
    )
    return assigned.groupBy(id_col).agg(*[
        F.min(F.when(F.col("s") == s, F.col("code"))).cast("int")
        .alias(f"c{s}")
        for s in range(m)
    ])


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 5, m: int = 4,
            ksub: int = 8, iters: int = 2, vec_col: str = "embedding",
            id_col: str = "vec_id", query_id: str = "query_id",
            dim: int | None = None) -> DataFrame:
    """PQ + asymmetric distance computation (ADC) top-k: codebooks train
    on the corpus, every corpus vector compresses to m codes, and each
    query scans CODES, not vectors — per-candidate cost is m table
    lookups + m-1 additions instead of a dim-length dot product, and the
    index is dim/m × smaller than the raw embeddings.

    Scale shape: the distance table (queries × m × ksub squared-L2
    entries) is tiny and broadcast; the corpus-side plan is one
    broadcast-nested-loop against the query ids plus m broadcast-hash
    joins keyed (query, code) — the code table is never shuffled and
    never self-joined; ranking is a per-query window (few queries, each
    partition corpus-sized but pre-reduced to scalar adc rows).

    Returns (query_id, neighbor_id, adc_dist, rank) — ADC approximates
    the true L2; recall vs exact search is the ksub/m knob, measured the
    same way :func:`truncation_recall` does for dimension truncation.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    subdim = dim // m
    cb = pq_train(corpus, m, ksub, iters, vec_col, id_col, dim)
    codes = pq_encode(corpus, cb, m, vec_col, id_col, dim)

    qsubs = _subvectors(queries, m, subdim, vec_col, id_col, query_id)
    dt = (
        qsubs.join(F.broadcast(cb), "s")
        .select(
            query_id, "s", "centroid_id",
            l2sq_expr(F.col("subv"), F.col("cvec")).alias("dsub"),
        )
    )
    est = codes.crossJoin(
        F.broadcast(queries.select(F.col(id_col).alias(query_id)))
    )
    for s in range(m):
        dts = dt.where(F.col("s") == s).select(
            query_id, F.col("centroid_id").alias(f"c{s}"),
            F.col("dsub").alias(f"d{s}"),
        )
        est = est.join(F.broadcast(dts), [query_id, f"c{s}"])
    adc = F.col("d0")
    for s in range(1, m):
        adc = adc + F.col(f"d{s}")
    w = Window.partitionBy(query_id).orderBy(
        F.round(adc, 9).asc(), F.col(id_col).asc()
    )
    return (
        est.where(F.col(id_col) != F.col(query_id))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id, F.col(id_col).alias("neighbor_id"),
            F.round(adc, 6).alias("adc_dist"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def l2_topk_exact(corpus: DataFrame, queries: DataFrame, k: int = 5,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  query_id: str = "query_id") -> DataFrame:
    """Exact squared-L2 top-k (brute force): the ground truth PQ/SQ8
    approximate search is calibrated against.  Broadcast the (few)
    queries against the corpus — the corpus is scanned once, never
    shuffled or self-joined; ranking is a per-query window."""
    paired = corpus.crossJoin(
        F.broadcast(
            queries.select(
                F.col(id_col).alias(query_id),
                F.col(vec_col).alias("__qv"),
            )
        )
    ).where(F.col(id_col) != F.col(query_id))
    d = l2sq_expr(F.col(vec_col), F.col("__qv"))
    w = Window.partitionBy(query_id).orderBy(
        F.round(d, 9).asc(), F.col(id_col).asc()
    )
    return (
        paired.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id, F.col(id_col).alias("neighbor_id"),
            F.round(d, 6).alias("l2_dist"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_recall(corpus: DataFrame, queries: DataFrame, k: int = 5,
              m: int = 4, ksub: int = 8, iters: int = 2,
              vec_col: str = "embedding", id_col: str = "vec_id",
              dim: int | None = None) -> DataFrame:
    """Recall@k of PQ/ADC against exact L2 — the pre-flight evidence for
    the (m, ksub) compression choice, exactly what
    :func:`truncation_recall` provides for dimension truncation and
    :func:`..operators.dedup.minhash_calibration` for the dedup
    threshold: before trusting 4-byte codes on the 100 TB corpus,
    measure what the compression costs on a sample.

    Both sides are the operators under test (no third implementation);
    the join is on (query, neighbor) over two k-row-per-query frames —
    trivially broadcastable.  Returns (query_id, n_hits, recall) with
    recall = |PQ top-k ∩ exact top-k| / k, one row per probe, rounded 6.
    """
    approx = pq_topk(corpus, queries, k, m, ksub, iters, vec_col, id_col,
                     dim=dim).select("query_id", "neighbor_id")
    exact = l2_topk_exact(corpus, queries, k, vec_col, id_col).select(
        "query_id", "neighbor_id"
    )
    hits = approx.join(exact, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    return (
        queries.select(F.col(id_col).alias("query_id"))
        .join(hits, "query_id", "left")
        .na.fill({"n_hits": 0})
        .select(
            "query_id", "n_hits",
            F.round(F.col("n_hits").cast("double") / F.lit(float(k)), 6)
            .alias("recall"),
        )
    )
