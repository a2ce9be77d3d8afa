"""Bounded-memory sketch operators for 100 TB corpus observability.

A web-scale pipeline constantly needs two cheap questions answered before
it commits to an expensive pass: "roughly how many distinct X are there?"
(sizing dedup tables, vocab builds, shard plans) and "what does this key's
frequency look like without materializing the full count table?" (hot-key
/ skew detection, stopword discovery).  Exact answers at 10^10-URL scale
are themselves big jobs; the standard answers are the KMV (k-minimum-
values) cardinality sketch [Bar-Yossef et al. 2002] and the count-min
sketch [Cormode & Muthukrishnan 2005].

Both are implemented here as PURE relational plans over the portable
``h32`` hash (``functions/text.py``) — no UDFs, no driver loops — and,
because every step is deterministic integer arithmetic, both are fully
oracle-checkable against DuckDB (unlike Spark's built-in
``approx_count_distinct`` HLL, whose binary sketch is engine-private).

Reference context: the F# crawler sizes nothing — its only cardinality is
``Seq.length`` over an in-memory list (``NewCards.fs:50-65``).  These are
the sizing instruments its design never needed and a 100 TB frontier
cannot live without.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.text import h32, shingles, tokens

# Hash space of h32 (first 8 hex chars of md5): uniform on [0, 2^32).
H32_SPACE = 4294967296  # 2**32


def kmv_distinct_estimate(
    docs: DataFrame,
    k: int = 100,
    shingle_k: int = 3,
    group_col: str = "source",
    text_col: str = "text",
    hash_ceiling: int = H32_SPACE,
) -> DataFrame:
    """Per-group distinct-shingle cardinality estimate via a KMV sketch.

    The estimator: hash every shingle with the uniform ``h32``; the k-th
    smallest distinct hash value ``m`` estimates the cardinality as
    ``(k-1) * 2^32 / m`` (the classic k-minimum-values / bottom-k
    estimator).  When a group has fewer than ``k`` distinct hashes the
    count is exact and reported as-is.

    Scale shape — the whole point of the sketch: ``hash_ceiling`` is a
    SCAN-STAGE filter ``h < ceiling`` applied before any shuffle, so at
    10^10 shingles neither the distinct aggregate nor the per-group
    ordering ever sees more than ``ceiling / 2^32`` of the stream.
    Sizing rule: ``ceiling ≈ 2^32 * oversample * k / n_lo`` where ``n_lo``
    is a lower bound on the group's distinct count and ``oversample``
    (≥ 4) bounds the probability that fewer than ``k`` survivors remain.
    An undersized ceiling is VISIBLE, not silent: ``k_used < k`` in the
    output means the estimate degraded to an exact count of survivors —
    re-run with a larger ceiling.  The default (2^32) disables the filter,
    which is the correct setting for small-SF parity testing.

    The per-group ``row_number`` window orders only the filtered distinct
    survivors (≤ ~oversample*k rows per group by construction), never the
    raw stream — this is the documented contract that keeps the window
    out of scale-killer territory.

    Returns (group_col, k_used, kth_min, est_distinct) sorted by group.
    """
    sh = docs.select(
        F.col(group_col),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("s"),
    )
    hashed = (
        sh.select(F.col(group_col), h32(F.col("s")).alias("h"))
        .where(F.col("h") < F.lit(hash_ceiling))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").alias("kth_min"),
    )
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        (F.col("k_used") - 1).cast("double")
        * F.lit(float(H32_SPACE))
        / F.col("kth_min").cast("double")
    )
    return agg.select(
        F.col(group_col),
        "k_used",
        "kth_min",
        F.round(est, 6).alias("est_distinct"),
    ).orderBy(group_col)


def cms_heavy_hitters(
    docs: DataFrame,
    depth: int = 4,
    width: int = 1024,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Count-min-sketch calibration report over the corpus token stream.

    Builds a ``depth × width`` CMS (row ``d`` buckets a token at
    ``h32('d:'||token) % width``; each counter sums the counts of every
    token landing there) and then reads the sketch back for the true
    top-``top_k`` tokens, reporting the estimate next to the truth.  The
    CMS guarantee — ``true ≤ est ≤ true + εN`` with ε ≈ e/width — becomes
    an observable ``overcount`` column, which is exactly the pre-flight
    evidence needed before trusting a (depth, width) choice for hot-key
    detection on the 100 TB stream.

    Scale shape: ONE hash shuffle (the token count groupBy, map-side
    combined); the sketch itself is built FROM the aggregated counts (an
    optimization with identical results to streaming raw tokens) and is
    bounded at ``depth*width`` rows regardless of corpus size, so it
    broadcasts.  The candidate read-back is a broadcast join against that
    fixed-size sketch.  In production the candidate set is whatever keys
    you care about (suspected hot hosts, trap URL templates); the true
    top-k here makes the report self-contained and oracle-checkable.

    Returns (token, true_cnt, cms_est, overcount) ordered by true count
    descending (ties: token ascending).
    """
    tc = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )

    def bucket(d: int) -> F.Column:
        return F.pmod(
            h32(F.concat(F.lit(f"{d}:"), F.col("token"))), F.lit(width)
        )

    rows = tc.select(
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), bucket(d).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db"),
    ).select(F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"), "cnt")
    sketch = rows.groupBy("d", "bucket").agg(
        F.sum("cnt").cast("long").alias("c")
    )

    cand = tc.orderBy(F.desc("cnt"), F.asc("token")).limit(top_k)
    cand_buckets = cand.select(
        "token",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), bucket(d).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db"),
    ).select("token", "cnt", F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))

    est = (
        cand_buckets.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("token")
        .agg(
            F.max("cnt").alias("true_cnt"),  # constant per token
            F.min("c").alias("cms_est"),
        )
    )
    return est.select(
        "token",
        "true_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("true_cnt")).cast("long").alias("overcount"),
    ).orderBy(F.desc("true_cnt"), F.asc("token"))
