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


def bitlen_case_sql(col: str, max_bits: int) -> str:
    """Bit-length of a non-negative integer column as a CASE chain.

    Both engines evaluate this IDENTICAL SQL text (Spark via ``F.expr``,
    DuckDB verbatim), so ``floor(log2)`` semantics cannot drift the way
    libm-backed ``log2`` could at powers-of-two boundaries.  ``max_bits``
    bounds the chain (22 terms for the 22-bit HLL remainder — constant
    folded by both optimizers).
    """
    whens = " ".join(
        f"WHEN {col} >= {1 << (b - 1)} THEN {b}"
        for b in range(max_bits, 0, -1)
    )
    return f"(CASE {whens} ELSE 0 END)"


def hll_registers(items: DataFrame, p: int = 10) -> DataFrame:
    """(g, t) item stream → HLL register table (g, idx, M).

    Split out of :func:`hll_distinct_estimate` because registers are the
    MERGEABLE representation — the property that makes the sketch usable
    at 100 TB: per-snapshot/per-shard register tables union and fold
    with ONE ``max`` groupBy, and the merged estimate is IDENTICAL to
    the estimate over the concatenated raw streams (max is associative,
    commutative, idempotent).  ``corpus_hll_merge`` machine-checks that
    identity.
    """
    m = 1 << p
    rem_bits = 32 - p
    b_scale = rem_bits + 1
    hashed = items.select("g", h32(F.col("t")).alias("h"))
    reg = hashed.select(
        "g",
        (F.col("h") % m).alias("idx"),
        F.expr(f"CAST(h DIV {m} AS BIGINT)").alias("w"),
    ).select(
        "g",
        "idx",
        (F.lit(b_scale)
         - F.expr(bitlen_case_sql("w", rem_bits))).alias("rho"),
    )
    return reg.groupBy("g", "idx").agg(F.max("rho").alias("M"))


def _register_harmonics(regs: DataFrame, p: int):
    """Shared per-group register fold: (g, m_hit, z_hit) plus the raw
    harmonic-estimate expression — the ONE place the scaled-bigint
    discipline lives, so the plain and small-range-corrected estimators
    can never diverge on it."""
    m = 1 << p
    b_scale = 32 - p + 1
    num = 0.7213 / (1.0 + 1.079 / m) * (m * m) * float(1 << b_scale)
    per = regs.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("m_hit"),
        F.sum(F.expr(f"CAST(shiftleft(1, {b_scale} - M) AS BIGINT)"))
        .cast("long").alias("z_hit"),
    )
    raw = F.lit(num) / (
        F.col("z_hit")
        + (F.lit(m) - F.col("m_hit")) * F.lit(1 << b_scale)
    ).cast("double")
    return per, raw


def hll_estimate_from_registers(regs: DataFrame, p: int = 10) -> DataFrame:
    """Register table (g, idx, M) → (g, est_hll), same scaled-bigint
    harmonic-sum discipline as :func:`hll_distinct_estimate` (one final
    double division, numerator pre-folded)."""
    per, raw = _register_harmonics(regs, p)
    return per.select("g", F.round(raw, 4).alias("est_hll"))


def hll_distinct_estimate(
    docs: DataFrame,
    p: int = 10,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group HyperLogLog distinct-token estimate, calibrated against
    the exact count (Flajolet et al. 2007 — the register/harmonic-mean
    estimator behind every production cardinality sketch, including
    Spark's own ``approx_count_distinct``; re-derived here over the
    portable ``h32`` so the whole register pipeline is oracle-checkable,
    which the engine-private binary sketch is not).

    Register build: ``idx = h % 2^p`` picks one of ``m = 2^p`` registers;
    the remaining ``32-p`` hash bits form ``w``; ``rho = (32-p) -
    bitlen(w) + 1`` is the leading-zero rank (``w = 0`` → max rank);
    each register keeps ``max(rho)``.  The estimate is
    ``alpha_m · m² / Σ_j 2^(-M_j)``.

    Exactness discipline — the reason this parities bit-for-bit: the
    harmonic sum is kept as the SCALED INTEGER ``z_scaled =
    Σ 2^(B - M_j)`` (B = 33-p; empty registers contribute ``2^B``), a
    bigint, and the single floating division ``num / z_scaled`` happens
    once at the end with the numerator ``alpha·m²·2^B`` pre-folded to one
    repr'd double literal shared by both engines.  No ``pow``, no ``ln``
    (the low-cardinality linear-counting correction needs ``ln(m/V)``
    and is deliberately left to the caller — ``m - m_hit`` zero-register
    count is in the output so the caller can apply it).

    Scale shape: one hash shuffle to fold the token stream into ≤ m rows
    per group (map-side-combined ``max``), one tiny per-group aggregate —
    the sketch property: 100 TB of tokens → 2^p longs per group.  The
    exact-count calibration join is the small-SF harness; at production
    scale you run the sketch alone.

    Returns (group, m_hit, z_scaled, est_hll, true_distinct, rel_err)
    sorted by group.
    """
    m = 1 << p
    rem_bits = 32 - p
    b_scale = rem_bits + 1
    num = 0.7213 / (1.0 + 1.079 / m) * (m * m) * float(1 << b_scale)

    items = docs.select(
        F.col(group_col).alias("g"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    )
    regs = hll_registers(items, p)
    per = regs.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("m_hit"),
        F.sum(F.expr(f"CAST(shiftleft(1, {b_scale} - M) AS BIGINT)"))
        .cast("long").alias("z_hit"),
    )
    est = F.lit(num) / (
        F.col("z_hit")
        + (F.lit(m) - F.col("m_hit")) * F.lit(1 << b_scale)
    ).cast("double")
    truth = items.distinct().groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("true_distinct")
    )
    return (
        per.join(truth, "g")
        .select(
            F.col("g").alias(group_col),
            "m_hit",
            (F.col("z_hit")
             + (F.lit(m) - F.col("m_hit")) * F.lit(1 << b_scale))
            .cast("long").alias("z_scaled"),
            F.round(est, 4).alias("est_hll"),
            "true_distinct",
            F.round(
                (est - F.col("true_distinct"))
                / F.col("true_distinct").cast("double"),
                4,
            ).alias("rel_err"),
        )
        .orderBy(group_col)
    )


def histogram_quantiles(
    docs: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    n_buckets: int = 128,
    quantiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group quantile estimates from a fixed-width histogram,
    calibrated against the exact interpolated percentile — the third
    sizing instrument next to KMV (distinct) and CMS (frequency): at
    100 TB an exact percentile needs the full sorted value stream, while
    the histogram folds it to ``n_buckets`` counts per group in one
    map-side-combined shuffle (the same two-pass min/max + fixed-bin
    shape every engine's APPROX_PERCENTILE-style histogram uses).

    Estimator: per group, ``width = ceil((max-min+1)/n_buckets)`` (integer
    ceil division — so bucketing is EXACT integer arithmetic in both
    engines); value ``v`` lands in bucket ``(v-min) div width``.  For
    quantile ``q`` the target rank is ``ceil(q*n)``; the estimate
    interpolates linearly inside the covering bucket:
    ``min + bucket*width + width*(rank - cum_before)/bucket_count``.
    The only floating ops are ``q*n`` (exact doubles for n < 2^53) and
    the final interpolation division — deterministic cross-engine, like
    the HLL scaled sum.

    Calibration columns: the exact linear-interpolation percentile
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, verified bit-equal
    semantics by the length_profile operator) and the relative error —
    the pre-flight evidence for trusting an ``n_buckets`` choice before
    pointing it at the full corpus.

    Returns (group, q, n, width, est, exact, rel_err) sorted by
    (group, q).
    """
    vals = docs.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
    )
    stats = vals.groupBy("g").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    qexact = vals.groupBy("g").agg(
        F.expr(
            "percentile(v, array("
            + ", ".join(f"{q}D" for q in quantiles)
            + "))"
        ).alias("__ex")
    )
    width = F.expr(f"CAST((hi - lo + {n_buckets}) DIV {n_buckets} AS BIGINT)")
    bucketed = (
        vals.join(F.broadcast(stats), "g")
        .select("g", F.expr(
            f"CAST((v - lo) DIV ((hi - lo + {n_buckets}) DIV {n_buckets})"
            " AS BIGINT)").alias("b"))
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cum = bucketed.select(
        "g", "b", "cnt",
        F.sum("cnt").over(
            Window.partitionBy("g").orderBy("b")
        ).cast("long").alias("cum"),
    )
    qs = docs.sparkSession.createDataFrame(
        [(float(q), i) for i, q in enumerate(quantiles)], "q double, qi int"
    )
    targets = stats.crossJoin(F.broadcast(qs)).select(
        "g", "lo", "hi", "n", "q", "qi",
        F.ceil(F.col("q") * F.col("n")).cast("long").alias("rank"),
    )
    est = (
        targets.join(cum, "g")
        .where((F.col("cum") - F.col("cnt") < F.col("rank"))
               & (F.col("cum") >= F.col("rank")))
        .select(
            "g", "q", "qi", "n", width.alias("width"),
            (F.col("lo") + F.col("b") * width
             + width * (F.col("rank") - (F.col("cum") - F.col("cnt")))
             .cast("double") / F.col("cnt").cast("double")).alias("est"),
        )
    )
    return (
        est.join(qexact, "g")
        .select(
            F.col("g").alias(group_col),
            "q", "n", "width",
            F.round("est", 6).alias("est"),
            F.round(F.element_at("__ex", F.col("qi") + 1), 6).alias("exact"),
            F.round(
                (F.col("est") - F.element_at("__ex", F.col("qi") + 1))
                / F.element_at("__ex", F.col("qi") + 1), 4
            ).alias("rel_err"),
        )
        .orderBy(group_col, "q")
    )


def hll_estimate_corrected(regs: DataFrame, p: int = 10) -> DataFrame:
    """Register table (g, idx, M) → (g, est) WITH Flajolet's small-range
    correction: when the raw harmonic estimate is below ``2.5m`` and
    empty registers remain, switch to linear counting ``m·ln(m/V)``
    (V = empty registers) — without it, one item "estimates" to ~0.7m.
    :func:`hll_estimate_from_registers` serves the big-cardinality
    corpus queries where the raw branch always wins; this variant is
    for sketches of SMALL sets (HyperBall's per-node reachability balls
    start at size 1).  Integer register state in, one ln of an exact
    integer ratio + one division out, rounded 4 — cross-engine
    deterministic.
    """
    m = 1 << p
    per, raw = _register_harmonics(regs, p)
    lin = F.lit(float(m)) * F.log(
        F.lit(float(m)) / (F.lit(m) - F.col("m_hit")).cast("double")
    )
    est = F.when((raw < 2.5 * m) & (F.col("m_hit") < m), lin).otherwise(raw)
    return per.select("g", F.round(est, 4).alias("est"))
