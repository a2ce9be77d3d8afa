"""Frontier generation — S1/S2/S3 of SURVEY.md §2.1.

``cardIDsFromRange`` (CrawlerPet911/Utils.fs:19-24) yields ``rf{n}`` then
``rl{n}`` for each n ascending; that enumeration order IS the reference's
crawl order (range mode fetches serially through a 1-permit semaphore in
submission order, Program.fs:52-55 + Downloader.fs:144-159).  We reproduce it
as a total order column ``seq`` so waves can be sorted and logged
deterministically under any parallelism.

All native expressions: `spark.range` → `explode` → `posexplode` ordering.
Scales: `spark.range(first, last+1)` is an embarrassingly-parallel source
with numSlices partitions — a 10^10-id range is fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.url import card_id_to_url, url_hash, url_host


def frontier_from_range(spark: SparkSession, first: int, last: int,
                        num_partitions: int | None = None) -> DataFrame:
    """S1+S2: ids ``rf{n}``, ``rl{n}`` for n in [first, last] with the
    reference's enumeration order captured in ``seq`` (0-based).

    Columns: seq, id, url, num, kind, url_hash, host, resource_type, attempt.
    """
    rng = spark.range(first, last + 1, 1, num_partitions or spark.sparkContext.defaultParallelism)
    df = (
        rng.select(
            F.col("id").alias("num"),
            F.posexplode(F.array(F.lit("rf"), F.lit("rl"))).alias("kind_rank", "kind"),
        )
        .withColumn("id", F.concat("kind", F.col("num").cast("string")))
        # rf{n} is yielded before rl{n}; n ascending (Utils.fs:20-23)
        .withColumn("seq", (F.col("num") - F.lit(first)) * 2 + F.col("kind_rank"))
    )
    return _with_url_columns(df).select(
        "seq", "id", "url", "num", "kind", "url_hash", "host",
        F.lit("card").alias("resource_type"),
        F.lit(0).alias("attempt"),
    )


def frontier_from_ids(ids_df: DataFrame, id_col: str = "id") -> DataFrame:
    """Descriptor DF from arbitrary card ids (discovery output, Program.fs:97).

    Order: numeric id descending (newcards bookkeeping order,
    Program.fs:123-126), rf before rl on ties.  ``seq`` only needs to be a
    unique total-order key in that order — it is computed as the ORDER
    ENCODING ``(max_num - num)*2 + kind_rank`` (one parallel max aggregate),
    NOT a row_number over a partition-less window: a global window funnels
    the whole input through one task, and this function also serves the
    revalidation sweep whose input is unbounded at scale.
    """
    df = (
        ids_df.select(F.col(id_col).alias("id"))
        .withColumn("num", F.substring("id", 3, 2_000_000).cast("long"))
        .withColumn("kind", F.substring("id", 1, 2))
    )
    mx = df.agg(F.max("num")).collect()[0][0] or 0
    df = df.withColumn(
        "seq",
        (F.lit(int(mx)) - F.col("num")) * 2
        + F.when(F.col("kind") == "rl", 1).otherwise(0),
    )
    return _with_url_columns(df).select(
        "seq", "id", "url", "num", "kind", "url_hash", "host",
        F.lit("card").alias("resource_type"),
        F.lit(0).alias("attempt"),
    )


def _with_url_columns(df: DataFrame) -> DataFrame:
    df = df.withColumn("url", card_id_to_url(F.col("id")))
    return df.withColumn("url_hash", url_hash(F.col("url"))).withColumn(
        "host", url_host(F.col("url"))
    )


def known_set_from_cards(cards_df: DataFrame, max_known: int = 50) -> DataFrame:
    """S3/A2 — startup known-set recovery (Program.fs:67-75): ids starting
    rl/rf, numeric suffix, top-50 by num desc.  ``limit`` after ``orderBy``
    is a TakeOrdered — no full sort at scale.
    """
    return (
        cards_df.select("id")
        .where(F.col("id").rlike("^r[lf]"))
        .withColumn("num", F.substring("id", 3, 2_000_000).cast("long"))
        .orderBy(F.col("num").desc())
        .limit(max_known)
    )
