"""Structured-Streaming tests: incremental pages→cards with checkpoint
resume, and watermarked event-time windows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.sources.pages import (
    build_pages,
    synthetic_docs_from_range,
)
from crawler_spark.streaming.pipeline import (
    stream_pages_to_cards,
    windowed_event_counts,
)


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("src", "out", "ckpt")}
    return d


def _land_pages(spark, dirs, lo, hi):
    docs = synthetic_docs_from_range(spark, hi).where(F.col("doc_id") >= lo)
    pages = build_pages(spark, "", include_fixtures=False, docs_df=docs)
    pages.write.mode("append").parquet(dirs["src"])


def test_stream_pages_to_cards_and_resume(spark, dirs):
    # batch 1 lands, stream drains it
    _land_pages(spark, dirs, 0, 30)
    q = stream_pages_to_cards(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    out1 = spark.read.parquet(dirs["out"])
    n1 = out1.count()
    assert n1 > 0
    assert out1.where(F.col("error").isNull()).count() == n1

    # batch 2 lands; resuming from the SAME checkpoint processes ONLY the new
    # files (exactly-once), no reprocessing of batch 1
    _land_pages(spark, dirs, 30, 60)
    q2 = stream_pages_to_cards(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    q2.awaitTermination(120)
    out2 = spark.read.parquet(dirs["out"])
    ids = [r["id"] for r in out2.select("id").collect()]
    assert len(ids) == len(set(ids))          # no duplicates across restarts
    assert len(ids) > n1                      # batch 2 got appended


def test_streaming_output_matches_batch(spark, dirs):
    from crawler_spark.functions.parse_udfs import with_parsed_card

    _land_pages(spark, dirs, 0, 25)
    q = stream_pages_to_cards(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    streamed = {
        (r["id"], r["address"], r["date"])
        for r in spark.read.parquet(dirs["out"]).collect()
    }
    pages = spark.read.parquet(dirs["src"])
    batch = with_parsed_card(
        pages.where(F.col("text").contains("card-information")), "text"
    ).select(
        F.col("card.id").alias("id"),
        F.col("card.address").alias("address"),
        F.col("card.date").alias("date"),
    )
    assert streamed == {(r["id"], r["address"], r["date"]) for r in batch.collect()}


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "events_src")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).format("parquet").load(src)
    )
    agg = windowed_event_counts(stream, watermark="10 minutes", window="1 hour")
    q = (
        agg.writeStream.format("memory").queryName("win_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select window_start, event_type, n from win_counts"
    ).collect()
    expect = {
        (r["ws"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {( r["window_start"], r["event_type"]): r["n"] for r in got} == expect


def test_stateful_known_set_tracker(spark, tmp_path):
    """applyInPandasWithState known-set fold: state carries across
    micro-batches, stays truncated to MAX_KNOWN, newest ids win."""
    from crawler_spark.streaming.stateful import MAX_KNOWN, run_known_set_tracker

    src = str(tmp_path / "ev"); out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    batch1 = [("rf", n) for n in range(100, 180)]          # 80 ids
    batch2 = [("rf", n) for n in range(500, 510)] + [("rl", 7)]
    spark.createDataFrame(batch1, "kind string, num long").coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(batch2, "kind string, num long").coalesce(1) \
        .write.mode("append").parquet(src)

    q = run_known_set_tracker(spark, src, out, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)

    rows = spark.read.parquet(out).collect()
    rf = sorted((r for r in rows if r["kind"] == "rf"),
                key=lambda r: r["batch_max"])
    assert len(rf) == 2                       # one output per micro-batch
    first, second = rf
    assert first["n_known"] == MAX_KNOWN      # 80 ids truncated to 50
    assert min(first["known_nums"]) == 130    # newest 50 of 100..179
    # second batch: union with carried state, 10 new ids admitted on top
    assert second["n_new"] == 10
    assert second["n_known"] == MAX_KNOWN
    assert max(second["known_nums"]) == 509
    assert min(second["known_nums"]) == 140   # 10 oldest evicted
    rl = [r for r in rows if r["kind"] == "rl"]
    assert len(rl) == 1 and rl[0]["known_nums"] == [7]


def test_dedup_pages_stream_drops_cross_batch_dups(spark, tmp_path):
    """Exact-dedup within watermark across micro-batches: the second
    arrival of byte-identical content is suppressed."""
    from crawler_spark.streaming.pipeline import dedup_pages_stream

    src = str(tmp_path / "pages_src")
    _land = lambda lo, hi: build_pages(
        spark, "", include_fixtures=False,
        docs_df=synthetic_docs_from_range(spark, hi).where(
            F.col("doc_id") >= lo
        ),
    ).coalesce(1).write.mode("append").parquet(src)
    _land(0, 20)          # batch 1
    _land(0, 20)          # batch 2: exact re-fetch of the same 20 docs
    _land(20, 30)         # batch 3: 10 genuinely new docs

    pages = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(pages.schema).format("parquet")
        .option("maxFilesPerTrigger", 1).load(src)
    )
    q = (
        dedup_pages_stream(stream)
        .select("url", "content_hash")
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select content_hash from dedup_out").collect()
    hashes = [r["content_hash"] for r in got]
    assert len(hashes) == len(set(hashes))            # no dup content emitted
    n_unique = pages.select(F.md5("text")).distinct().count()
    assert len(hashes) == n_unique                    # every unique kept once


def test_clean_docs_stream_gates_and_dedups(spark, tmp_path):
    """The streaming ingest gate suppresses re-fetched content AND applies
    the same quality/lang gate as the batch clean_corpus front half."""
    from crawler_spark.functions.text import lang_id, quality_score
    from crawler_spark.streaming.pipeline import clean_docs_stream

    src = str(tmp_path / "clean_src")
    _land = lambda lo, hi: build_pages(
        spark, "", include_fixtures=False,
        docs_df=synthetic_docs_from_range(spark, hi).where(
            F.col("doc_id") >= lo
        ),
    ).coalesce(1).write.mode("append").parquet(src)
    _land(0, 25)
    _land(0, 25)          # exact re-fetch
    _land(25, 40)

    pages = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(pages.schema).format("parquet")
        .option("maxFilesPerTrigger", 1).load(src)
    )
    q = (
        clean_docs_stream(stream, quality_min=0.3, lang="en")
        .writeStream.format("memory").queryName("clean_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select content_hash, n_tokens from clean_out").collect()
    hashes = [r["content_hash"] for r in got]
    assert len(hashes) == len(set(hashes))
    # batch twin of the same gate+dedup = same surviving content set
    batch = (
        pages.where(
            (quality_score(F.col("text")) >= 0.3)
            & (lang_id(F.col("text")) == "en")
        )
        .select(F.md5("text").alias("h")).distinct()
    )
    assert sorted(hashes) == sorted(r["h"] for r in batch.collect())
    assert all(r["n_tokens"] > 0 for r in got)


def test_politeness_gate_token_bucket_across_batches(spark, tmp_path):
    """Token-bucket state survives micro-batch boundaries: a burst split
    over two triggers is throttled exactly like one batch, and event-time
    refill re-admits later requests."""
    from crawler_spark.streaming.stateful import run_politeness_gate

    src = str(tmp_path / "req"); out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    # batch 1: 3 simultaneous requests at t=0 against capacity 4
    batch1 = [("a.example", f"u{i}", 0) for i in range(3)]
    # batch 2: 3 more at t=0 (burst continues: only 1 token left) plus one
    # at t=2500 (refill 2.5 tokens -> admitted) and a cold host
    batch2 = [("a.example", f"v{i}", 0) for i in range(3)] + [
        ("a.example", "w0", 2500), ("b.example", "x0", 0)]
    spark.createDataFrame(batch1, "host string, url string, ts_ms long") \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, "host string, url string, ts_ms long") \
        .coalesce(1).write.mode("append").parquet(src)

    q = run_politeness_gate(spark, src, out, ckpt, capacity=4.0,
                            rate_per_s=1.0, max_files_per_trigger=1)
    q.awaitTermination(180)

    rows = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert all(rows[f"u{i}"]["admitted"] for i in range(3))   # 4 -> 1 token
    assert rows["v0"]["admitted"]                             # burns the last
    assert not rows["v1"]["admitted"] and not rows["v2"]["admitted"]
    assert rows["w0"]["admitted"]                             # refilled 2.5
    assert rows["w0"]["tokens_after"] == 1.5
    assert rows["x0"]["admitted"]                             # cold host full


def test_politeness_gate_stream_equals_single_batch(spark, tmp_path):
    """Stream-over-N-triggers ≡ one batch: same admissions, same final
    token level (the determinism the checkpoint/resume story rests on)."""
    from crawler_spark.streaming.stateful import run_politeness_gate

    reqs = [("h.example", f"u{i:02d}", i * 400) for i in range(12)]

    def run(split_files: int, tag: str) -> dict:
        src = str(tmp_path / f"req{tag}"); out = str(tmp_path / f"out{tag}")
        ckpt = str(tmp_path / f"ck{tag}")
        chunk = len(reqs) // split_files
        for j in range(split_files):
            part = reqs[j * chunk:(j + 1) * chunk] or reqs[j * chunk:]
            spark.createDataFrame(
                part, "host string, url string, ts_ms long"
            ).coalesce(1).write.mode("append").parquet(src)
        q = run_politeness_gate(spark, src, out, ckpt, capacity=2.0,
                                rate_per_s=0.5, max_files_per_trigger=1)
        q.awaitTermination(180)
        return {r["url"]: (r["admitted"], r["tokens_after"])
                for r in spark.read.parquet(out).collect()}

    assert run(1, "one") == run(4, "four")


def test_rate_anomaly_stream_spike_and_bucket_continuity(spark, tmp_path):
    """A bucket split across two triggers counts once; a 10x spike after
    steady history is flagged; the still-open last bucket is not emitted."""
    from crawler_spark.streaming.stateful import run_rate_anomaly_stream

    src = str(tmp_path / "ev"); out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    B = 1000                       # 1s buckets for the test
    rows1, rows2, eid = [], [], 0
    for b in range(6):             # steady: 4 events per bucket 0..5
        for i in range(4):
            eid += 1
            (rows1 if not (b == 3 and i >= 2) else rows1).append(
                ("k", eid, b * B + i))
    # split bucket 6 across the two files: 2 events + 2 events
    for i in range(2):
        eid += 1; rows1.append(("k", eid, 6 * B + i))
    for i in range(2):
        eid += 1; rows2.append(("k", eid, 6 * B + 100 + i))
    # spike: 40 events in bucket 7
    for i in range(40):
        eid += 1; rows2.append(("k", eid, 7 * B + i))
    # closer: one event in bucket 8 closes the spike bucket
    eid += 1; rows2.append(("k", eid, 8 * B))

    for part in (rows1, rows2):
        spark.createDataFrame(part, "key string, event_id long, ts_ms long") \
            .coalesce(1).write.mode("append").parquet(src)
    q = run_rate_anomaly_stream(spark, src, out, ckpt, bucket_ms=B,
                                z_thresh=3.0)
    q.awaitTermination(180)

    rows = {r["bucket"]: r for r in spark.read.parquet(out).collect()}
    assert 8 not in rows                    # still open, never emitted
    assert rows[6]["cnt"] == 4              # 2 + 2 across the trigger split
    assert rows[7]["cnt"] == 40 and rows[7]["is_anomaly"]
    assert all(not rows[b]["is_anomaly"] for b in range(7))
    assert rows[7]["n_hist"] == 7           # scored against 7 closed buckets


def test_rate_anomaly_stream_split_invariance(spark, tmp_path):
    """N-trigger stream ≡ 1-trigger stream: identical emitted rows."""
    from crawler_spark.streaming.stateful import run_rate_anomaly_stream

    B = 1000
    rows, eid = [], 0
    import random
    rnd = random.Random(7)
    for b in range(12):
        for i in range(rnd.randint(2, 9)):
            eid += 1
            rows.append(("k", eid, b * B + i))

    def run(nfiles, tag):
        src = str(tmp_path / f"e{tag}"); out = str(tmp_path / f"o{tag}")
        ckpt = str(tmp_path / f"c{tag}")
        chunk = (len(rows) + nfiles - 1) // nfiles
        for j in range(nfiles):
            part = rows[j * chunk:(j + 1) * chunk]
            if part:
                spark.createDataFrame(
                    part, "key string, event_id long, ts_ms long"
                ).coalesce(1).write.mode("append").parquet(src)
        q = run_rate_anomaly_stream(spark, src, out, ckpt, bucket_ms=B)
        q.awaitTermination(180)
        return sorted(tuple(r) for r in spark.read.parquet(out).collect())

    assert run(1, "a") == run(4, "b")


def test_trending_terms_stream_ranks_closed_windows(spark, tmp_path):
    """Two hour-windows of docs with planted term frequencies; a far-
    future sentinel pushes the watermark past both so their counts
    finalize (append mode); top-3 per window with term tie-break."""
    from crawler_spark.streaming.pipeline import run_trending_terms

    src = str(tmp_path / "docs"); out = str(tmp_path / "trend")
    ckpt = str(tmp_path / "ck")
    h1, h2 = "2024-01-01 10:", "2024-01-01 11:"
    rows = (
        [(f"{h1}0{i}:00", "spark spark spark crawl") for i in range(4)]
        + [(f"{h1}2{i}:00", "index") for i in range(3)]
        + [(f"{h2}0{i}:00", "bloom bloom filter") for i in range(2)]
        + [("2024-01-03 00:00:00", "sentinel")]  # advances the watermark
    )
    spark.createDataFrame(rows, "ts string, text string").coalesce(1) \
        .write.parquet(src)
    schema = spark.read.parquet(src).schema
    q = run_trending_terms(spark, src, out, ckpt, k=3, schema=schema)
    q.awaitTermination(180)

    got = spark.read.parquet(out).collect()
    by_win = {}
    for r in got:
        by_win.setdefault(str(r["window_start"]), []).append(
            (r["rank"], r["term"], r["n"]))
    w1 = sorted(by_win["2024-01-01 10:00:00"])
    assert w1 == [(1, "spark", 12), (2, "crawl", 4), (3, "index", 3)]
    w2 = sorted(by_win["2024-01-01 11:00:00"])
    assert w2 == [(1, "bloom", 4), (2, "filter", 2)]
    assert "2024-01-03 00:00:00" not in by_win  # sentinel window open
