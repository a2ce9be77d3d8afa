"""Fetch = join of the frontier against the ``pages`` universe (F1/J3).

The reference's ``httpRequest`` (CrawlerLib/Downloader.fs:57-126) maps to a
left join on ``url``: match → ``downloaded`` (200), no match → ``absent``
(404).  Retry with Fibonacci backoff (Downloader.fs:13-21,134-137,154-182)
becomes an ``attempt`` column and a budget predicate — errors re-enter the
next wave with attempt+1 until the next fib delay would exceed the cap.

Scale notes: the join shuffles both sides on ``url`` unless the wave is
broadcastable.  At 10^10-URL scale, `pages` should be written bucketed by
``url_hash`` (Iceberg bucket transform) so each wave is a storage-partitioned
join with no shuffle of the big side; here we hash-repartition.  AQE handles
skewed waves.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Downloader.fs:134-137
DELAY_UNIT_MS = 100
MAX_PERMITTED_DELAY_MS = 180_000

STATUS_DOWNLOADED = "downloaded"
STATUS_ABSENT = "absent"
STATUS_ERROR = "error"


@lru_cache(maxsize=1)
def fib_delays_ms(delay_unit_ms: int = DELAY_UNIT_MS, n: int = 102):
    """genFibonachi (Downloader.fs:13-21): first 102 fibs × delay unit."""
    fibs = [1, 1]
    while len(fibs) < n:
        fibs.append(fibs[-1] + fibs[-2])
    return tuple(f * delay_unit_ms for f in fibs)


def max_attempts(delay_unit_ms: int = DELAY_UNIT_MS,
                 max_delay_ms: int = MAX_PERMITTED_DELAY_MS) -> int:
    """Attempts before the next delay exceeds the cap (≈17 at defaults,
    Downloader.fs:162-169: retryIdx advances per error, gives up when
    fib[idx]*unit > cap)."""
    delays = fib_delays_ms(delay_unit_ms)
    k = 0
    while k < len(delays) and delays[k] <= max_delay_ms:
        k += 1
    return k


def within_retry_budget(attempt: Column) -> Column:
    """F2 budget predicate — attempt is 0-based retry index."""
    return attempt < F.lit(max_attempts())


def fetch_wave(frontier_df: DataFrame, pages_df: DataFrame,
               payload: bool = True) -> DataFrame:
    """One fetch micro-batch: frontier ⟕ pages on url.

    Adds: fetch_status ∈ {downloaded, absent} and, when ``payload``,
    html/text/warc_ts.  (An `error` status would come from a live-fetch
    transport layer; the deterministic corpus has no transport errors —
    Downloader.fs:118-120.)

    ``payload=False`` joins against a url-presence projection only — for
    consumers that need statuses, not bytes (seen/missing/log bookkeeping);
    the shuffle then carries urls, never page payloads.  Consumers that need
    payloads of *downloaded* rows only should use :func:`fetch_downloaded`,
    which never shuffles the pages side at all.
    """
    frontier_cols = frontier_df.columns
    if payload:
        pages_cols = pages_df.select(
            "url",
            F.col("warc_ts"),
            F.col("html"),
            F.col("text").alias("page_text"),
        )
        joined = frontier_df.join(pages_cols, "url", "left")
        out = joined.withColumn(
            "fetch_status",
            F.when(F.col("html").isNotNull(), F.lit(STATUS_DOWNLOADED)).otherwise(
                F.lit(STATUS_ABSENT)
            ),
        ).withColumn(
            # P17: canonical text = UTF-8 decode of bytes; prefer the corpus's
            # pre-decoded text column when present (identical by construction)
            "text",
            F.coalesce(F.col("page_text"), F.decode(F.col("html"), "UTF-8")),
        ).drop("page_text")
        return out.select(*frontier_cols, "warc_ts", "html", "text", "fetch_status")

    pages_cols = pages_df.select("url", F.lit(True).alias("__present"))
    joined = frontier_df.join(pages_cols, "url", "left")
    out = joined.withColumn(
        "fetch_status",
        F.when(F.col("__present"), F.lit(STATUS_DOWNLOADED)).otherwise(
            F.lit(STATUS_ABSENT)
        ),
    ).drop("__present")
    return out.select(*frontier_cols, "fetch_status")


# Above this wave size the broadcast build side stops being safe: at ~200
# bytes/frontier row (url + id + host strings) 2M rows is ~400 MB of build
# hash table per executor — near the practical broadcast ceiling on common
# executor sizes.  Larger waves take the hash-partitioned path instead.
BROADCAST_MAX_WAVE_ROWS = 2_000_000


def fetch_downloaded(frontier_df: DataFrame, pages_df: DataFrame,
                     wave_rows: int | None = None,
                     broadcast_max_rows: int = BROADCAST_MAX_WAVE_ROWS) -> DataFrame:
    """Payload fetch of the PRESENT urls only (inner join, frontier build side).

    This is the hot path feeding the parser/validator (absent rows come from
    the cheap payload-free :func:`fetch_wave`).  Join strategy is gated on
    ``wave_rows`` — the wave count the scheduler has already computed:

    * ``wave_rows <= broadcast_max_rows`` (or unknown): pages ⋈
      broadcast(frontier) — a BroadcastHashJoin where the multi-KB page
      payloads stream map-side and are **never shuffled**.
    * larger waves: hash-partitioned join on ``url`` with a shuffled-hash
      build of the frontier side — no broadcast of a multi-GB wave, and no
      sort of the payload rows (SHJ, not SMJ).  At 10^10 urls with `pages`
      written Iceberg-bucketed by url_hash this exchange on the pages side
      disappears entirely (storage-partitioned join); only the wave shuffles.

    Both paths are semantically identical (asserted in tests/test_plans.py).
    """
    frontier_cols = frontier_df.columns
    pages_cols = pages_df.select(
        "url",
        F.col("warc_ts"),
        F.col("html"),
        F.col("text").alias("page_text"),
    )
    if wave_rows is not None and wave_rows > broadcast_max_rows:
        joined = pages_cols.join(frontier_df.hint("shuffle_hash"), "url", "inner")
    else:
        joined = pages_cols.join(F.broadcast(frontier_df), "url", "inner")
    out = joined.withColumn("fetch_status", F.lit(STATUS_DOWNLOADED)).withColumn(
        "text",
        F.coalesce(F.col("page_text"), F.decode(F.col("html"), "UTF-8")),
    ).drop("page_text")
    return out.select(*frontier_cols, "warc_ts", "html", "text", "fetch_status")
