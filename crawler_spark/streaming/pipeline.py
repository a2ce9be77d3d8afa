"""Structured-Streaming surfaces — the streaming analog of the newcards
monitoring loop (D4, Program.fs:76-159) and event-time aggregation.

The reference's only "streaming" is a poll-sleep loop; rebuilt Spark-first:

* :func:`stream_pages_to_cards` — incremental ingestion: a parquet-file
  stream of newly-landed pages (the micro-batch analog of pages arriving
  from a fetcher) → card-filter → parse UDF → cards sink with checkpoint.
  Restarting from the same checkpoint resumes exactly-once (the streaming
  twin of the CrawlJob snapshot-resume contract).
* :func:`windowed_event_counts` — event-time tumbling window + watermark
  (late-data policy the reference lacks; its closest analog is the top-50
  tail-window re-scan, Program.fs:73).
* :func:`streaming_crawl_log_rates` — per-status fetch-rate metrics over a
  crawl_log stream (K6 metrics surface).

All transformations are identical DataFrame expressions to the batch path —
the same ``with_parsed_card`` drives both, so streaming output is
byte-identical to batch output for the same input files (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parse_udfs import with_parsed_card

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(spark: SparkSession, source_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def parse_cards_stream(pages_stream: DataFrame) -> DataFrame:
    """Card pages only → parsed card columns (same kernel as batch)."""
    cards = pages_stream.where(F.col("text").contains("card-information"))
    parsed = with_parsed_card(cards, "text")
    return parsed.select(
        "url",
        F.col("card.id").alias("id"),
        F.col("card.animal").alias("animal"),
        F.col("card.sex").alias("sex"),
        F.col("card.type").alias("type"),
        F.col("card.address").alias("address"),
        F.col("card.latitude").alias("latitude"),
        F.col("card.longitude").alias("longitude"),
        F.col("card.date").alias("date"),
        F.col("card.description").alias("description"),
        F.col("card.photos").alias("photos"),
        F.col("card.error").alias("error"),
    )


def stream_pages_to_cards(spark: SparkSession, source_dir: str,
                          out_dir: str, checkpoint_dir: str,
                          available_now: bool = True):
    """Run the incremental pages→cards pipeline; returns the query handle.

    ``available_now=True`` drains everything currently in ``source_dir`` and
    stops — the deterministic test/batch-catchup trigger; pass False for a
    continuous micro-batch monitor (the D4 analog)."""
    parsed = parse_cards_stream(read_pages_stream(spark, source_dir))
    writer = (
        parsed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(events_stream: DataFrame,
                          watermark: str = "10 minutes",
                          window: str = "1 hour") -> DataFrame:
    """Event-time tumbling-window counts with a late-data watermark."""
    # watermarks require TIMESTAMP (with tz); parquet NTZ columns are cast —
    # session tz is UTC so the instant is unchanged
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def streaming_crawl_log_rates(log_stream: DataFrame,
                              watermark: str = "1 minute",
                              window: str = "1 minute") -> DataFrame:
    """K6 metrics: per-status fetch counts per processing window.

    Expects a crawl_log stream with an event-time ``ts`` column."""
    return (
        log_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "status")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "status", "n")
    )


def dedup_pages_stream(pages_stream: DataFrame,
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of :func:`crawler_spark.operators.dedup.exact_dedup`:
    drop re-fetches of byte-identical page content within the watermark
    horizon (`dropDuplicatesWithinWatermark`, so the dedup state is
    bounded and expires — the unbounded-state `dropDuplicates` would OOM a
    perpetual crawl).  Keyed on md5(text), the same content key the batch
    operator groups on; event time is the fetch timestamp ``warc_ts``.

    At scale the dedup state is hash-partitioned on the content key by the
    streaming aggregation itself; watermark length trades re-fetch
    suppression horizon against state size.
    """
    return (
        pages_stream.withColumn("ts", F.col("warc_ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .withColumn("content_hash", F.md5(F.col("text")))
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def clean_docs_stream(pages_stream: DataFrame, watermark: str = "1 hour",
                      quality_min: float = 0.65,
                      lang: str = "en") -> DataFrame:
    """Streaming twin of the front half of
    :func:`crawler_spark.operators.corpus.clean_corpus`: the incremental
    ingest gate a perpetual crawl runs before the batch hygiene passes —
    quality + language gate (stateless codegen row filters, evaluated
    per micro-batch with zero state) followed by content-hash exact dedup
    within the watermark horizon (bounded, expiring state).

    The corpus-global stages (C4 frequent-line removal, MinHash near-dup)
    need cross-document frequencies a stream cannot see incrementally
    without unbounded state — they stay batch by design; this operator's
    output is exactly what those batch passes consume.

    Returns (url, ts, content_hash, n_tokens, text) for surviving pages.
    """
    from ..functions.text import lang_id, quality_score, token_count

    return (
        pages_stream.withColumn("ts", F.col("warc_ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .where(
            (quality_score(F.col("text")) >= quality_min)
            & (lang_id(F.col("text")) == lang)
        )
        .withColumn("content_hash", F.md5(F.col("text")))
        .withColumn("n_tokens", token_count(F.col("text")).cast("long"))
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select("url", "ts", "content_hash", "n_tokens", "text")
    )


def trending_terms_stream(docs_stream: DataFrame,
                          watermark: str = "30 minutes",
                          window: str = "1 hour",
                          text_col: str = "text",
                          ts_col: str = "ts") -> DataFrame:
    """Watermarked per-window term counts — the aggregation half of the
    classic "trending terms" stream (what's suddenly being said across
    the crawl this hour): tokens explode per document (stateless,
    per-batch), then an event-time tumbling-window count with a
    late-data watermark so window state is BOUNDED and expires — the
    unbounded-term-dictionary version would OOM a perpetual crawl.

    Emitted in append mode a window's counts finalize exactly once,
    when the watermark passes its end — downstream ranking (see
    :func:`run_trending_terms`) therefore sees each window complete and
    immutable, the property that makes per-window top-k a per-batch
    operation instead of a stateful one.

    Returns (window_start, window_end, term, n).
    """
    from ..functions.text import tokens

    return (
        docs_stream.withColumn("ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("ts", watermark)
        .select("ts", F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(F.window("ts", window).alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term",
            "n",
        )
    )


def run_trending_terms(spark, source_dir: str, out_dir: str,
                       checkpoint_dir: str, k: int = 3,
                       schema=None, watermark: str = "30 minutes",
                       window: str = "1 hour",
                       max_files_per_trigger: int | None = None):
    """Drive :func:`trending_terms_stream` end-to-end: append-mode
    finalized windows rank to top-k inside ``foreachBatch`` (closed
    windows arrive whole, so the rank is a plain partitioned
    row_number over the batch — no extra streaming state) and land in
    ``out_dir`` as parquet.  Ties break by term ascending, and the sink
    is IDEMPOTENT under foreachBatch's at-least-once contract: each
    batch overwrites its own ``batch_id=N`` partition directory, so a
    batch retried after a partial/unacknowledged write replaces its
    previous attempt instead of appending duplicate top-k rows.
    Consumers read ``out_dir`` as a partitioned dataset (the inferred
    ``batch_id`` column doubles as sink lineage)."""
    from pyspark.sql import Window as W

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.format("parquet").load(source_dir)
    agg = trending_terms_stream(stream, watermark=watermark, window=window)

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        w = W.partitionBy("window_start").orderBy(
            F.col("n").desc(), F.col("term").asc()
        )
        (
            batch_df.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        )

    return (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
