"""Event-log analytics operators: funnel, cohort retention, top paths.

The crawl-telemetry half of the analytics story: the same wave/host logs
the CrawlJob emits (``plans/crawl_job.py`` metrics tables) are event
streams — fetch→parse→store is a funnel, host recrawl activity is a
cohort matrix, and frequent event paths are the crawl's behavioral
fingerprint.  Demonstrated over the synthetic ``events`` table (user_id,
event_type, ts, event_id), the exact shape of a wave log.

All three are window/aggregate compositions with bounded (per-key)
windows and map-side-combined groupBys — no global windows, no UDFs —
and integer-epoch arithmetic wherever time enters, so the DuckDB twins
are bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_funnel(events: DataFrame, steps: tuple,
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Ordered-step funnel: per user, the first occurrence of step 1,
    then the first strictly-LATER occurrence of step 2, and so on —
    the conversion question every pipeline asks of its own telemetry
    (how many fetched pages got parsed, how many parsed got stored).

    Strictness contract: each step must be at a strictly later
    timestamp than the previous step's chosen event (equal-timestamp
    completions don't count; mirrored in the oracle).  One bounded
    aggregate per step (conditional min over the user's own events),
    chained by join on the user key — ``len(steps)`` hash shuffles on
    the same key, no windows at all.

    Returns (step_idx, step, n_users, conv_from_prev) — cumulative
    funnel counts with the per-stage conversion rate (1.0 for step 1;
    0 users at the previous stage yields NULL, not a division error).
    """
    ep = F.unix_timestamp(F.col(ts_col)).cast("long")
    ev = events.select(F.col(user_col).alias("u"),
                       F.col(type_col).alias("et"), ep.alias("ts"))
    prev = None
    counts = []
    for i, step in enumerate(steps):
        if prev is None:
            cur = ev.where(F.col("et") == step).groupBy("u").agg(
                F.min("ts").alias("t")
            )
        else:
            cur = (
                ev.where(F.col("et") == step)
                .join(prev.select("u", F.col("t").alias("pt")), "u")
                .where(F.col("ts") > F.col("pt"))
                .groupBy("u")
                .agg(F.min("ts").alias("t"))
            )
        counts.append(cur.agg(F.count(F.lit(1)).cast("long").alias("n"))
                      .select(F.lit(i + 1).alias("step_idx"),
                              F.lit(step).alias("step"), "n"))
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    # conv via a self-join on the len(steps)-row table (no window at all,
    # keeping the whole inventory free of partition-less windows)
    prev_n = out.select((F.col("step_idx") + 1).alias("step_idx"),
                        F.col("n").alias("pn"))
    return (
        out.join(prev_n, "step_idx", "left")
        .select(
            "step_idx", "step", F.col("n").alias("n_users"),
            F.when(F.col("step_idx") == 1, F.lit(1.0)).otherwise(
                F.round(
                    F.col("n").cast("double")
                    / F.nullif(F.col("pn"), F.lit(0)).cast("double"), 4)
            ).alias("conv_from_prev"),
        )
        .orderBy("step_idx")
    )


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by first-seen epoch
    week, counted distinct in each subsequent week offset — the
    recrawl-health view of a host log (how many of the hosts first
    crawled in week W were still yielding new pages k weeks later).

    Integer epoch-week arithmetic only (``epoch div 604800`` — no
    calendar, no timezone): bit-exact across engines.  Two map-side
    aggregates (per-user min week; then distinct users per
    cohort/offset cell).  Returns (cohort_week, week_offset, n_users).
    """
    ep = F.unix_timestamp(F.col(ts_col)).cast("long")
    ev = events.select(F.col(user_col).alias("u"),
                       F.floor(ep / 604800).cast("long").alias("wk"))
    first = ev.groupBy("u").agg(F.min("wk").alias("cw"))
    return (
        ev.join(first, "u")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("wk") - F.col("cw")).alias("week_offset"),
        )
        .agg(F.count_distinct("u").cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def top_event_paths(events: DataFrame, path_len: int = 3, top_k: int = 20,
                    user_col: str = "user_id", type_col: str = "event_type",
                    order_cols: tuple = ("ts", "event_id")) -> DataFrame:
    """Most frequent length-``path_len`` event paths across users — the
    behavioral fingerprint (which fetch→outcome sequences dominate a
    crawl, which error loops recur).  Per-user lead windows (bounded by
    the user's own history), one count groupBy, deterministic top-k cut
    on (count desc, path asc).  Returns (path, n) — ``path`` is the
    '>'-joined step sequence.
    """
    w = Window.partitionBy(user_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    cols = [F.col(type_col)] + [
        F.lead(F.col(type_col), i).over(w) for i in range(1, path_len)
    ]
    path = F.concat_ws(">", *cols)
    seq = events.select(path.alias("path"),
                        cols[-1].isNotNull().alias("full"))
    return (
        seq.where("full")
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(top_k)
    )


def rate_anomaly(events: DataFrame, key_col: str = "event_type",
                 ts_col: str = "ts", bucket_s: int = 3600,
                 z_thresh: float = 3.0) -> DataFrame:
    """Per-key rate-anomaly scoring: bucket the stream (epoch integer
    division), then z-score every (key, bucket) count against that
    key's OWN mean/std across its observed buckets — the crawl-ops
    alarm for a host suddenly erroring or a fetch loop going hot.

    Numeric discipline: mean/variance from explicit integer sums
    (``sum``, ``sum(c²)``, ``n`` — exact, order-free) rather than the
    engines' streaming ``stddev`` implementations, which differ
    numerically (Welford vs two-pass); the one ``sqrt`` is
    IEEE-deterministic.  Buckets with zero events are not materialized
    (documented — the baseline is over OBSERVED buckets; a dense
    calendar spine is a caller-side cross join when needed).

    Two map-side-combined aggregates + one broadcast-size join back.
    Returns (key, bucket, cnt, mean_cnt, z, is_anomaly) — all cells
    scored, flag at ``|z| >= z_thresh`` (std = 0 → z = 0, never null).
    """
    ep = F.unix_timestamp(F.col(ts_col)).cast("long")
    cells = (
        events.select(F.col(key_col).alias("key"),
                      F.floor(ep / bucket_s).cast("long").alias("bucket"))
        .groupBy("key", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    stats = cells.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("cnt").cast("long").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("nb")
    var = F.col("s2").cast("double") / F.col("nb") - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(std > 0, (F.col("cnt") - mean) / std).otherwise(F.lit(0.0))
    return (
        cells.join(stats, "key")
        .select(
            "key", "bucket", "cnt",
            F.round(mean, 4).alias("mean_cnt"),
            F.round(z, 4).alias("z"),
            (F.abs(z) >= z_thresh).alias("is_anomaly"),
        )
        .orderBy("key", "bucket")
    )


def activity_heatmap(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Hour-of-day × day-of-week activity heatmap in pure epoch-integer
    arithmetic (``dow``: 0 = Monday, via the 1970-01-01-was-Thursday
    offset; no calendar library, no timezone surface) — the capacity
    view that sizes politeness budgets and maintenance windows.
    One map-side-combined groupBy.  Returns (dow, hour, n_events).
    """
    ep = F.unix_timestamp(F.col(ts_col)).cast("long")
    dow = (F.floor(ep / 86400).cast("long") + 3) % 7
    hour = F.floor((ep % 86400) / 3600).cast("long")
    return (
        events.select(dow.alias("dow"), hour.alias("hour"))
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy("dow", "hour")
    )
