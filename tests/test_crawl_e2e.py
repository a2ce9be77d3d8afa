"""End-to-end crawl engine tests: frontier → politeness → fetch → parse →
photos → seen/missing → resume.  Ports the behavioral assertions of
Tests/Pet911Crawling.fs (reference live-HTTP tests) onto the deterministic
pages corpus, per SURVEY.md §5.2.
"""

import math

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.fetch import fetch_wave, fib_delays_ms, max_attempts
from crawler_spark.operators.photos import fanin_photos, fanout_photos, validate_image
from crawler_spark.operators.politeness import apply_robots, select_wave, select_wave_salted
from crawler_spark.operators.seen import (
    BloomFilter,
    build_bloom,
    filter_unseen,
    filter_unseen_with_bloom,
)
from crawler_spark.plans.crawl_job import CrawlJob
from crawler_spark.sources.frontier import frontier_from_range, known_set_from_cards
from crawler_spark.sources.pages import NUM_BASE, build_pages, fixture_pages


# --------------------------------------------------------------------- frontier
def test_frontier_range_order(spark):
    """S1: rf{n} then rl{n}, n ascending (Utils.fs:19-24) — seq is total."""
    f = frontier_from_range(spark, 5, 7).orderBy("seq").collect()
    assert [r["id"] for r in f] == ["rf5", "rl5", "rf6", "rl6", "rf7", "rl7"]
    assert [r["seq"] for r in f] == list(range(6))
    assert f[0]["url"].endswith("/rf5")
    assert f[0]["url"].startswith("https://pet911.ru/%D0%A5")
    assert f[0]["host"] == "pet911.ru"


def test_known_set_top50(spark):
    """S3/A2: top-50 numeric ids desc (Program.fs:67-75)."""
    cards = spark.createDataFrame(
        [(f"rl{i}",) for i in range(100)] + [("junk",)], "id string"
    )
    known = known_set_from_cards(cards).collect()
    assert len(known) == 50
    assert max(r["num"] for r in known) == 99
    assert min(r["num"] for r in known) == 50


# ---------------------------------------------------------------------- fetch
def test_fib_retry_budget():
    """F2 (Downloader.fs:13-21,134-137): fib delays, ~17 attempts at defaults."""
    d = fib_delays_ms()
    assert d[:6] == (100, 100, 200, 300, 500, 800)
    assert max_attempts() == 17  # fib(18)*100ms = 258,400 > 180,000


def test_fetch_statuses(spark):
    """F1: url in pages → downloaded; not in pages → absent (404)."""
    pages = fixture_pages(spark)
    from crawler_spark.functions.url import card_id_to_url

    frontier = spark.createDataFrame(
        [(0, "rf518209"), (1, "rf999999")], "seq long, id string"
    ).select("seq", "id", card_id_to_url(F.col("id")).alias("url"))
    res = {r["id"]: r["fetch_status"] for r in fetch_wave(frontier, pages).collect()}
    assert res == {"rf518209": "downloaded", "rf999999": "absent"}


# ----------------------------------------------------------------------- seen
def test_bloom_no_false_negatives():
    import numpy as np

    bf = BloomFilter.sized(10_000, fpp=0.01)
    keys = np.arange(10_000, dtype=np.int64) * 2_654_435_761
    bf.add_many(keys)
    assert bf.might_contain(keys).all()  # zero false negatives, ever
    probe = np.arange(50_000, 60_000, dtype=np.int64)
    fp = bf.might_contain(probe).mean()
    assert fp < 0.05  # fpp in the configured ballpark


@pytest.mark.parametrize("kind", ["plain", "sharded", "cuckoo", "routed"])
def test_filter_path_equals_exact_antijoin(spark, kind):
    """Every filter variant is a prefilter, never a semantics change — the
    'sharded' case is the regression guard for type-preserving broadcast
    (a ShardedBloom bitmap reinterpreted as a plain BloomFilter computes
    different bit positions → silent false negatives); the 'routed' case
    runs the executor-routed shard-cogroup variant (each task sees only its
    shard's bitmap slice) against the same exact baseline."""
    import numpy as np

    from crawler_spark.operators.seen import (
        CuckooFilter,
        ShardedBloom,
        build_bloom_into,
        filter_unseen_with_bloom_sharded,
    )

    frontier = frontier_from_range(spark, 0, 499)
    seen = frontier.where(F.col("num") % 3 == 0).select("url_hash", "id").withColumn(
        "wave", F.lit(0)
    )
    exact = {r["id"] for r in filter_unseen(frontier, seen).collect()}
    if kind == "plain":
        flt = build_bloom(seen)
    elif kind in ("sharded", "routed"):
        flt = build_bloom_into(
            seen.select("url_hash"), ShardedBloom.sized(2_000, n_shards=8)
        )
    else:
        flt = CuckooFilter.sized(2_000)
        keys = np.array(
            [r["url_hash"] for r in seen.select("url_hash").collect()],
            dtype=np.int64,
        )
        assert flt.insert_many(keys) == 0
    variant = (
        filter_unseen_with_bloom_sharded if kind == "routed"
        else filter_unseen_with_bloom
    )
    with_flt = {r["id"] for r in variant(frontier, seen, flt).collect()}
    assert with_flt == exact


def test_cuckoo_filter_semantics():
    """Insert → no false negatives; idempotent re-insert; delete removes;
    serialization round-trips through the magic-dispatched loader."""
    import numpy as np

    from crawler_spark.operators.seen import CuckooFilter, filter_from_bytes

    cf = CuckooFilter.sized(10_000)
    keys = np.arange(10_000, dtype=np.int64) * 2_654_435_761
    assert cf.insert_many(keys) == 0
    assert cf.might_contain(keys).all()          # zero false negatives
    assert cf.insert_many(keys[:100]) == 0       # idempotent (no dup fps)

    probe = np.arange(50_000, 60_000, dtype=np.int64)
    assert cf.might_contain(probe).mean() < 0.01  # 16-bit fp → tiny fpp

    cf2 = filter_from_bytes(cf.to_bytes())
    assert isinstance(cf2, CuckooFilter)
    assert cf2.might_contain(keys).all()

    # deletion — the capability blooms lack (drives revalidate precision)
    assert cf.delete_many(keys[:5_000]) == 0
    assert not cf.might_contain(keys[:5_000]).any()
    assert cf.might_contain(keys[5_000:]).all()


# ----------------------------------------------------------------- politeness
def test_token_bucket_budget(spark):
    frontier = frontier_from_range(spark, 0, 99)  # 200 urls, single host
    out = select_wave(frontier, wave_seconds=600)  # 600s/60s delay = 10 tokens
    sel = out.where("selected").collect()
    assert len(sel) == 10
    # crawl order: lowest seq first (rf0, rl0, rf1, ...)
    assert sorted(r["seq"] for r in sel) == list(range(10))


def test_token_bucket_salted_matches_budget_scale(spark):
    frontier = frontier_from_range(spark, 0, 499)
    exact = select_wave(frontier, 1200).where("selected").count()
    salted = (
        select_wave_salted(frontier, 1200, n_salts=4, hot_host_threshold=10)
        .where("selected")
        .count()
    )
    assert exact == 20
    # per-salt rounding: within n_salts of the exact budget
    assert abs(salted - exact) <= 4


def test_robots_anti_join(spark):
    frontier = frontier_from_range(spark, 0, 9)
    robots = spark.createDataFrame(
        [("pet911.ru", "/%D0%A5")], "host string, disallow_prefix string"
    )
    assert apply_robots(frontier, robots).count() == 0  # all card urls share the prefix
    robots_other = spark.createDataFrame(
        [("pet911.ru", "/private")], "host string, disallow_prefix string"
    )
    assert apply_robots(frontier, robots_other).count() == 20


# -------------------------------------------------------------------- photos
def test_photo_fanin_first_error_semantics(spark):
    """J2 (PhotosForCardCrawler.fs:38-62): all-ok → ok; first failure wins."""
    rows = [
        ("c1", 0, "c1/a.webp", True, None),
        ("c1", 1, "c1/b.webp", True, None),
        ("c2", 0, "c2/a.webp", True, None),
        ("c2", 1, "c2/b.webp", False, "err-b"),
        ("c2", 2, "c2/c.webp", False, "err-c"),
    ]
    df = spark.createDataFrame(
        rows, "card_id string, photo_seq int, photo_id string, photo_ok boolean, error string"
    )
    res = {r["card_id"]: r for r in fanin_photos(df).collect()}
    assert res["c1"]["photos_ok"] and res["c1"]["first_error"] is None
    assert not res["c2"]["photos_ok"]
    assert res["c2"]["first_error"] == "err-b"  # FIRST failure by photo_seq
    assert res["c2"]["n_photos"] == 3


def test_validate_image_magic(spark):
    rows = [
        ("jpeg", bytearray(b"\xff\xd8\xff\xe0rest")),
        ("png", bytearray(b"\x89PNG\r\n\x1a\nrest")),
        ("webp", bytearray(b"RIFF\x00\x00\x00\x00WEBPVP8 data")),
        ("html", bytearray(b"<html>not an image</html>")),
    ]
    df = spark.createDataFrame(rows, "id string, html binary")
    res = {r["id"]: r["image_ok"] for r in validate_image(df).collect()}
    assert res == {"jpeg": True, "png": True, "webp": True, "html": False}


# ----------------------------------------------------------------- end-to-end
@pytest.fixture(scope="module")
def crawl_result(spark, sf_dir, tmp_path_factory):
    pages = build_pages(spark, sf_dir)
    job = CrawlJob(
        spark,
        str(tmp_path_factory.mktemp("store")),
        pages,
        wave_seconds=10**9,  # no politeness throttling for the e2e run
    )
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rng = frontier_from_range(spark, NUM_BASE, NUM_BASE + n_docs - 1)
    from pathlib import Path

    from crawler_spark.sources.frontier import frontier_from_ids

    fixture_ids = sorted(
        f.stem.split("_")[1].split(".")[0]
        for f in Path("/root/reference/data/20240114").glob("petCard_*.html.dump")
    )
    extra = frontier_from_ids(
        spark.createDataFrame([(i,) for i in fixture_ids], "id string")
    ).withColumn("seq", F.col("seq") + F.lit(2 * n_docs))
    job.seed_frontier(rng.unionByName(extra))
    stats = job.crawl(max_waves=10)
    return job, stats, n_docs


def test_e2e_drains_in_two_waves(crawl_result):
    job, stats, n_docs = crawl_result
    # wave 0: all cards; wave 1: all photos; then frontier is empty
    assert len(stats) == 2
    assert stats[0]["fetched"] == 2 * n_docs + 10  # rf + rl per num + 10 fixtures
    assert stats[1]["fetched"] == stats[0]["enqueued_photos"]


def test_e2e_missing_semantics(crawl_result):
    job, stats, n_docs = crawl_result
    missing_cards = {
        r["id"] for r in job.missing_set().where(~F.col("id").contains("/")).collect()
    }
    # every rl twin of an even doc_id is absent (pages carry only the matching
    # kind), plus both kinds of withheld (doc_id%7==0) ids
    assert all(m.startswith(("rf", "rl")) for m in missing_cards)
    expected_absent = sum(
        1 + (1 if d % 7 == 0 else 0) for d in range(n_docs)
    )  # wrong-kind twin always absent; withheld ids absent for both kinds
    assert len(missing_cards) == expected_absent


def test_e2e_parse_results(crawl_result, spark, sf_dir):
    job, stats, n_docs = crawl_result
    cards = job.cards()
    ok = cards.where(F.col("error").isNull())
    n_present = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") % 7 != 0
    ).count()
    assert ok.count() == n_present + 10  # synthetic + 10 reference fixtures
    # derived fields round-trip
    n_docs_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    sample = (
        ok.where((F.col("num") >= NUM_BASE) & (F.col("num") < NUM_BASE + n_docs_total))
        .limit(5)
        .collect()
    )
    for r in sample:
        d = r["num"] - NUM_BASE
        assert r["animal"] == (1 if d % 3 == 0 else 2)
        assert r["latitude"] == pytest.approx(40.0 + (d % 2000) / 100.0)


def test_e2e_fixture_byte_identity(crawl_result):
    """The verbatim reference fixture pages parse to the golden values
    through the full Spark pipeline (BASELINE.json invariant)."""
    job, _, _ = crawl_result
    row = job.cards().where(F.col("id") == "rl518787").collect()
    assert len(row) == 1
    r = row[0]
    assert r["error"] is None
    assert r["address"] == "улица Брянский Пост, 6 с1А, Москва"
    assert r["animal"] == 2 and r["sex"] == 3 and r["type"] == 1
    assert r["latitude"] == pytest.approx(55.77292439, abs=1e-10)
    assert len(r["photos"]) == 7
    assert r["photos"][0]["ID"].startswith("rl518787/")


def test_e2e_seen_set_and_order(crawl_result):
    job, stats, _ = crawl_result
    log = job.crawl_log()
    first_wave = log.agg(F.min("wave")).collect()[0][0]
    # crawl-order evidence: within a wave, seq strictly increasing == the
    # reference's submission order (SURVEY §4.2.1); wave numbers are 1-based
    w0 = [
        r["seq"]
        for r in log.where(
            (F.col("wave") == first_wave) & (F.col("status") != "parse_error")
        ).orderBy("seq").collect()
    ]
    assert len(w0) > 0
    assert w0 == sorted(w0) and len(set(w0)) == len(w0)
    # URL-seen set == everything fetched exactly once
    seen = job.seen_set()
    assert seen.count() == seen.select("url_hash").distinct().count()


def test_e2e_photo_barrier(crawl_result):
    job, _, _ = crawl_result
    final = job.finalize()
    bad = final.where(~F.col("photos_ok"))
    good = final.where(F.col("photos_ok"))
    assert good.count() > 0
    # cards whose photo set includes a withheld (404) photo are NOT failed —
    # absent photos are 'Missing', not errors (Crawler.fs processes Absent as
    # Ok Missing); only invalid image bytes fail the barrier. Our corpus has
    # no invalid bytes, so every card with all photos fetched is ok.
    assert bad.count() == 0


def test_e2e_metrics_tables(crawl_result):
    """K6 / north-rule lineage surface: per-wave and per-host fetch/parse
    metrics persist as queryable store tables, consistent with the wave
    stats and the crawl log."""
    import json

    job, stats, _ = crawl_result
    wm = {r["wave"]: r for r in job.wave_metrics().collect()}
    assert len(wm) == len(stats)
    for s in stats:
        row = wm[s["wave"]]
        assert row["fetched"] == s["fetched"]
        assert row["parsed_ok"] == s["parsed_ok"]
        assert set(json.loads(row["step_seconds_json"])) == set(s["step_seconds"])
        # the fixture-derived corpus is entirely inside the fast scanner's
        # verified subset: any whole-document stdlib fallback here is a
        # kernel regression (at 100x scale a silent 5% fallback rate would
        # erase the pruned engine's 1.62x)
        assert row["parse_fallbacks"] == 0

    hm = job.host_metrics()
    # per-host rows sum back to the per-wave totals
    per_wave = {
        r["wave"]: r["n"]
        for r in hm.groupBy("wave").agg(F.sum("fetched").alias("n")).collect()
    }
    for s in stats:
        assert per_wave[s["wave"]] == s["fetched"]
    hosts = {r["host"] for r in hm.select("host").distinct().collect()}
    assert "pet911.ru" in hosts and "cdn.pet911.ru" in hosts


def test_e2e_photo_mime_and_ext(crawl_result):
    """K1/K2 mime sidecar semantics (FileCollector.fs:36-40, mime captured
    at Downloader.fs:114) + mimeToExt mapping (Images.fs:26-34): every
    stored photo carries the corpus Content-Type and its mapped extension."""
    job, _, _ = crawl_result
    photos = job.card_photos().collect()
    assert photos
    for r in photos:
        assert r["mime"] == "image/webp"
        assert r["ext"] == "webp"
    # the stored card record carries its Content-Type too (K1 .mime sidecar)
    cards = job.cards().where(F.col("error").isNull()).limit(5).collect()
    assert cards and all(r["mime"] == "text/html; charset=utf-8" for r in cards)


def test_e2e_retry_fib_budget(spark, sf_dir, tmp_path_factory):
    """F2 e2e (Downloader.fs:154-182): a transport-erroring url re-enters
    the next wave with attempt+1 until it heals or the fibonacci delay
    budget is exhausted.

    unit=30s → budget = fibs {1,1,2,3,5}×30s ≤ 180s → 5 attempts.
    Card A heals after 2 failures (succeeds on attempt 2); card B always
    fails and must be given up after exactly 5 attempts.
    """
    from crawler_spark.functions.url import card_id_to_url
    from crawler_spark.operators.fetch import max_attempts

    assert max_attempts(30_000, 180_000) == 5

    docs = __import__(
        "crawler_spark.sources.pages", fromlist=["synthetic_docs_from_range"]
    ).synthetic_docs_from_range(spark, 10)
    pages = build_pages(spark, "", include_fixtures=False, docs_df=docs)
    url_a = spark.range(1).select(
        card_id_to_url(F.lit(f"rf{NUM_BASE + 2}")).alias("url")
    ).collect()[0]["url"]
    url_b = spark.range(1).select(
        card_id_to_url(F.lit(f"rl{NUM_BASE + 3}")).alias("url")
    ).collect()[0]["url"]
    faults = spark.createDataFrame(
        [(url_a, 2), (url_b, 999)], "url string, fail_attempts int"
    )
    job = CrawlJob(
        spark, str(tmp_path_factory.mktemp("faults")), pages,
        wave_seconds=10**9, faults_df=faults,
        retry_delay_unit_ms=30_000, prewarm=False,
    )
    job.seed_range(NUM_BASE, NUM_BASE + 9)
    job.crawl(max_waves=20)

    assert job.pending_frontier().isEmpty()
    log = job.crawl_log()

    # card A: exactly 2 error rows, then downloaded on attempt 2 → parsed
    a_id = f"rf{NUM_BASE + 2}"
    a_log = log.where(F.col("id") == a_id).collect()
    assert sorted(r["status"] for r in a_log) == ["downloaded", "error", "error"]
    assert job.cards().where(
        (F.col("id") == a_id) & F.col("error").isNull()
    ).count() == 1
    assert job.seen_set().where(F.col("id") == a_id).count() == 1

    # card B: the initial attempt + 5 in-budget retries = 6 error rows
    # (an error at retry index i re-enters iff fib[i]*unit <= cap,
    # Downloader.fs:162-169), then given up — never stored, never marked
    # seen or missing (the reference reports the error and moves on)
    b_id = f"rl{NUM_BASE + 3}"
    b_log = log.where(F.col("id") == b_id).collect()
    assert [r["status"] for r in b_log] == ["error"] * 6
    assert job.cards().where(F.col("id") == b_id).count() == 0
    assert job.seen_set().where(F.col("id") == b_id).count() == 0
    assert job.missing_set().where(F.col("id") == b_id).count() == 0


def test_e2e_incremental_bloom(crawl_result, spark, sf_dir, tmp_path_factory,
                               monkeypatch):
    """C1-scale: the seen-bloom is maintained incrementally — one per-wave
    fold over that wave's keys only (driver-side Arrow fold for bounded
    waves, distributed partials for rebuilds), never a rescan of the seen
    table — persisted per snapshot, reloadable after a restart, and
    semantically identical to the exact-anti-join run.  prefilter_min_seen=0
    keeps the bloom-routed wave path itself exercised end-to-end."""
    import crawler_spark.plans.crawl_job as cj

    calls: list[int] = []
    real = cj.CrawlJob._filter_add

    def spy(self, keys_df, n_rows=None):
        calls.append(keys_df.count())
        return real(self, keys_df, n_rows)

    monkeypatch.setattr(cj.CrawlJob, "_filter_add", spy)

    ref_job, _, n_docs = crawl_result
    pages = ref_job.pages
    store = str(tmp_path_factory.mktemp("bloomstore"))
    job = CrawlJob(spark, store, pages, wave_seconds=10**9, use_bloom=True,
                   prewarm=False, prefilter_min_seen=0)
    job.seed_frontier(ref_job.store.read(spark, "frontier", as_of=0))
    job.crawl(max_waves=10)

    n_waves = job.store.latest_snapshot_id("seen") + 1
    # exactly one fold per wave, each over that wave's rows only; summed
    # they cover the seen table once — no wave rescanned history
    assert len(calls) == n_waves
    assert sum(calls) == job.seen_set().count()
    # the filter's item count tracks the folds (the cost-gate input) and
    # survives the per-snapshot blob round-trip
    assert job._bloom.n_items == job.seen_set().count()
    # one persisted blob per wave (crash-safe incremental state)
    blobs = sorted((job.store.root / "seen_bloom").glob("merged-*.bin"))
    assert len(blobs) == n_waves

    # restart: a fresh job loads the blob — no partial build, no table read
    calls.clear()
    job2 = CrawlJob(spark, store, pages, wave_seconds=10**9, use_bloom=True,
                    prewarm=False, prefilter_min_seen=0)
    bloom = job2._bloom_sync()
    assert calls == [] and job2._bloom_snap == n_waves - 1
    assert bloom is not None
    assert bloom.n_items == job.seen_set().count()

    # blobs lost (legacy store): one top-up build from the snapshot dirs
    for b in blobs:
        b.unlink()
    job3 = CrawlJob(spark, store, pages, wave_seconds=10**9, use_bloom=True,
                    prewarm=False, prefilter_min_seen=0)
    job3._bloom_sync()
    assert len(calls) == 1 and sum(calls) == job.seen_set().count()

    # semantics: identical final state vs the exact-anti-join reference run
    for getter in ("cards", "seen_set", "missing_set"):
        da, db = getattr(ref_job, getter)(), getattr(job, getter)()
        cols = [c for c in da.columns if c != "wave"]
        assert (
            da.select(cols).exceptAll(db.select(cols)).count() == 0
            and db.select(cols).exceptAll(da.select(cols)).count() == 0
        ), f"{getter} differs between bloom and exact runs"


def test_e2e_bucketed_pages_crawl_matches(crawl_result, spark, tmp_path_factory):
    """Storage-partitioned fetch end-to-end: a crawl over `pages` written
    bucketed by url_hash (payload joins carry no pages-side Exchange) must
    produce exactly the reference run's cards/seen/missing tables."""
    from crawler_spark.sources.pages import write_pages_bucketed

    ref_job, _, _ = crawl_result
    bucketed = write_pages_bucketed(
        ref_job.pages,
        str(tmp_path_factory.mktemp("bucketed") / "pages"),
        "pages_bucketed_e2e", n_buckets=8,
    )
    job = CrawlJob(
        spark, str(tmp_path_factory.mktemp("bstore")), bucketed,
        wave_seconds=10**9, prewarm=False, pages_bucketed=True,
    )
    job.seed_frontier(ref_job.store.read(spark, "frontier", as_of=0))
    job.crawl(max_waves=10)

    for getter in ("cards", "seen_set", "missing_set"):
        da, db = getattr(ref_job, getter)(), getattr(job, getter)()
        cols = [c for c in da.columns if c != "wave"]
        assert (
            da.select(cols).exceptAll(db.select(cols)).count() == 0
            and db.select(cols).exceptAll(da.select(cols)).count() == 0
        ), f"{getter} differs between bucketed and broadcast runs"
    spark.sql("DROP TABLE IF EXISTS pages_bucketed_e2e")


def test_e2e_resume_exactness(spark, sf_dir, tmp_path_factory):
    """North_rule: exact resume from snapshots — run A: all waves in one
    process; run B: one wave, new CrawlJob over the same store, finish.
    Final tables must be identical."""
    pages = build_pages(spark, sf_dir)

    def run(store, interrupt):
        job = CrawlJob(spark, store, pages, wave_seconds=10**9)
        job.seed_range(NUM_BASE, NUM_BASE + 49)
        if interrupt:
            job.run_wave()
            job = CrawlJob(spark, store, pages, wave_seconds=10**9)  # "restart"
        job.crawl(max_waves=10)
        return job

    a = run(str(tmp_path_factory.mktemp("a")), interrupt=False)
    b = run(str(tmp_path_factory.mktemp("b")), interrupt=True)

    for getter in ("cards", "seen_set", "missing_set"):
        da, db = getattr(a, getter)(), getattr(b, getter)()
        cols = [c for c in da.columns if c != "wave"]
        assert (
            da.select(cols).exceptAll(db.select(cols)).count() == 0
            and db.select(cols).exceptAll(da.select(cols)).count() == 0
        ), f"{getter} differs between straight and resumed runs"


def test_e2e_crawl_over_warc_ingested_pages_matches(
        crawl_result, spark, tmp_path_factory):
    """Full-provenance fidelity: pages written to WARC archives and read
    back through the ingestion path (per-record Content-Type preserved as
    mime) must drive a crawl to exactly the reference run's
    cards/seen/missing tables — i.e. the archive round trip is lossless
    for every byte the pipeline consumes."""
    from crawler_spark.sources.warc import pages_from_warc, write_warc

    ref_job, _, _ = crawl_result
    arch = tmp_path_factory.mktemp("warc_universe")
    write_warc(ref_job.pages, str(arch), shards=8).collect()
    pages = pages_from_warc(spark, str(arch) + "/*.warc", mime=True)

    job = CrawlJob(
        spark, str(tmp_path_factory.mktemp("wstore")), pages,
        wave_seconds=10**9, prewarm=False,
    )
    job.seed_frontier(ref_job.store.read(spark, "frontier", as_of=0))
    job.crawl(max_waves=10)

    for getter in ("cards", "seen_set", "missing_set"):
        da, db = getattr(ref_job, getter)(), getattr(job, getter)()
        cols = [c for c in da.columns if c != "wave"]
        assert (
            da.select(cols).exceptAll(db.select(cols)).count() == 0
            and db.select(cols).exceptAll(da.select(cols)).count() == 0
        ), f"{getter} differs between WARC-ingested and direct runs"


def test_e2e_crawl_over_deduped_archives_matches(
        crawl_result, spark, tmp_path_factory):
    """Same fidelity bar through the revisit-dedup layer: the universe plus
    a time-shifted recapture of every 5th url (identical bytes → genuine
    revisit records on disk) is written with write_warc_deduped, ingested
    with pages_from_warc(dedup=True) (resolve restores payload + mime from
    the original response), the recaptures filtered back out, and the
    crawl must land byte-identical to the reference run."""
    from crawler_spark.sources.warc import pages_from_warc, write_warc_deduped

    ref_job, _, _ = crawl_result
    recap = ref_job.pages.where(F.xxhash64("url") % 5 == 0).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 7300 DAYS"))
    n_recap = recap.count()
    assert n_recap > 0
    arch = tmp_path_factory.mktemp("warc_dedup_universe")
    manifest = write_warc_deduped(
        ref_job.pages.unionByName(recap), str(arch), shards=8).collect()
    assert sum(m["revisits"] for m in manifest) == n_recap
    assert sum(m["payload_bytes_saved"] for m in manifest) > 0

    pages = pages_from_warc(spark, str(arch) + "/*.warc", mime=True,
                            dedup=True)
    pages = pages.where(F.year("warc_ts") < 2040)  # drop the recaptures

    job = CrawlJob(
        spark, str(tmp_path_factory.mktemp("wdstore")), pages,
        wave_seconds=10**9, prewarm=False,
    )
    job.seed_frontier(ref_job.store.read(spark, "frontier", as_of=0))
    job.crawl(max_waves=10)

    for getter in ("cards", "seen_set", "missing_set"):
        da, db = getattr(ref_job, getter)(), getattr(job, getter)()
        cols = [c for c in da.columns if c != "wave"]
        assert (
            da.select(cols).exceptAll(db.select(cols)).count() == 0
            and db.select(cols).exceptAll(da.select(cols)).count() == 0
        ), f"{getter} differs between dedup-archived and direct runs"


def test_e2e_maintain_compacts_and_resume_stays_exact(
        spark, sf_dir, tmp_path_factory):
    """Store maintenance between crawl sessions must not change results:
    run A crawls range 1 then range 2 straight; run B crawls range 1,
    maintains (compact + expire, seen-filter rebuilt from the compacted
    snapshot), then a NEW job seeds range 2 and crawls.  The rebuilt bloom
    must keep suppressing range 1 (no false negatives after expiry) and
    admit range 2; final tables identical."""
    pages = build_pages(spark, sf_dir)

    def run(store, with_maintain):
        job = CrawlJob(spark, store, pages, wave_seconds=10**9, use_bloom=True)
        job.seed_range(NUM_BASE, NUM_BASE + 29)
        job.crawl(max_waves=10)
        if with_maintain:
            res = job.maintain(keep_last=1)
            # the multi-wave tables really were compacted and expired
            assert res["seen"]["compacted_to"] is not None
            assert res["seen"]["expired"] >= 2
            assert len(job.store.snapshots("seen")[-1]["dirs"]) == 1
            job = CrawlJob(spark, store, pages, wave_seconds=10**9,
                           use_bloom=True)
        job.enqueue_frontier(
            frontier_from_range(spark, NUM_BASE, NUM_BASE + 59)
        )  # overlaps range 1
        job.crawl(max_waves=10)
        return job

    a = run(str(tmp_path_factory.mktemp("a")), with_maintain=False)
    b = run(str(tmp_path_factory.mktemp("b")), with_maintain=True)

    for getter in ("cards", "seen_set", "missing_set"):
        da, db = getattr(a, getter)(), getattr(b, getter)()
        cols = [c for c in da.columns if c != "wave"]
        assert (
            da.select(cols).exceptAll(db.select(cols)).count() == 0
            and db.select(cols).exceptAll(da.select(cols)).count() == 0
        ), f"{getter} differs between straight and maintained runs"
    # no re-crawl of range 1: each url fetched exactly once across both runs
    seen = b.seen_set()
    assert seen.count() == seen.select("url_hash").distinct().count()


def test_e2e_sharded_routed_seen_filter_matches_broadcast(
    spark, crawl_result, tmp_path_factory
):
    """seen_filter="sharded-routed": the wave prefilter cogroups each bloom
    bitmap shard with the frontier rows that can only probe it (the
    10^10-key layout where the merged filter no longer broadcasts) — final
    crawl state must equal the exact-anti-join reference run, and the wave
    plan must actually route via cogroup (FlatMapCoGroupsInPandas)."""
    ref_job, _, n_docs = crawl_result
    pages = ref_job.pages
    store = str(tmp_path_factory.mktemp("routedstore"))
    job = CrawlJob(spark, store, pages, wave_seconds=10**9, use_bloom=True,
                   prewarm=False, prefilter_min_seen=0,
                   seen_filter="sharded-routed")
    job.seed_frontier(ref_job.store.read(spark, "frontier", as_of=0))
    job.crawl(max_waves=10)

    for getter in ("cards", "seen_set", "missing_set"):
        da, db = getattr(ref_job, getter)(), getattr(job, getter)()
        cols = [c for c in da.columns if c != "wave"]
        assert (
            da.select(cols).exceptAll(db.select(cols)).count() == 0
            and db.select(cols).exceptAll(da.select(cols)).count() == 0
        ), f"{getter} differs between sharded-routed and exact runs"

    # the routed path was really taken: probe the prefilter plan directly
    from crawler_spark.operators.seen import filter_unseen_with_bloom_sharded

    bloom = job._bloom_sync()
    assert bloom is not None and bloom.n_items > 0
    flagged = filter_unseen_with_bloom_sharded(
        ref_job.store.read(spark, "frontier", as_of=0), job.seen_set(), bloom
    )
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan


def test_corrupt_heal_through_resumed_cuckoo_job_equals_clean_run(
        spark, tmp_path):
    """C4 self-heal across a RESUME boundary (VERDICT r4 item 5): a card
    corrupted in the stored crawl is healed by a brand-new CrawlJob over
    the same store — the persisted cuckoo filter reloads from its blob,
    the revalidation sweep DELETES the healed key from it, the re-crawl
    re-adds it — and the final store state is indistinguishable from a
    crawl that never saw the corruption."""
    from crawler_spark.plans.crawl_job import CrawlJob
    from crawler_spark.sources.pages import (
        NUM_BASE, build_pages, synthetic_docs_from_range,
    )

    docs = synthetic_docs_from_range(spark, 10)
    pages = build_pages(spark, "", include_fixtures=False, docs_df=docs)
    broken = pages.withColumn(
        "text",
        F.when(
            F.col("url").endswith(f"rf{NUM_BASE + 4}"),
            F.regexp_replace(F.col("text"), "card-info", "x"),
        ).otherwise(F.col("text")),
    ).withColumn("html", F.encode(F.col("text"), "UTF-8"))

    CARD_COLS = ["id", "animal", "sex", "type", "address", "latitude",
                 "longitude", "date", "description"]

    def final_state(job):
        good = job.cards().where(F.col("error").isNull())
        return (
            sorted(map(tuple, good.select(*CARD_COLS).distinct().collect())),
            sorted(r["url_hash"] for r in
                   job.seen_set().select("url_hash").distinct().collect()),
        )

    # baseline: never-corrupted run
    clean_job = CrawlJob(spark, str(tmp_path / "clean"), pages,
                         wave_seconds=3600 * 1000, use_bloom=True,
                         seen_filter="cuckoo")
    clean_job.seed_range(NUM_BASE, NUM_BASE + 9)
    clean_job.crawl()
    want = final_state(clean_job)

    # run 1 crawls the corrupted universe, then "shuts down"
    job1 = CrawlJob(spark, str(tmp_path / "store"), broken,
                    wave_seconds=3600 * 1000, use_bloom=True,
                    seen_filter="cuckoo")
    job1.seed_range(NUM_BASE, NUM_BASE + 9)
    job1.crawl()
    assert job1.cards().where(F.col("error").isNotNull()).count() == 1
    del job1

    # run 2: fresh job over the SAME store against the healed universe —
    # cuckoo state must come from the persisted blob, not job1's memory
    job2 = CrawlJob(spark, str(tmp_path / "store"), pages,
                    wave_seconds=3600 * 1000, use_bloom=True,
                    seen_filter="cuckoo")
    assert job2.revalidate_cards() == {"revalidated": 1}
    assert not job2._filter_degraded
    job2.crawl()

    assert final_state(job2) == want
    # idempotence: a later sweep finds nothing to heal, enqueues nothing
    assert job2.revalidate_cards() == {"revalidated": 0}
    assert job2.pending_frontier().isEmpty()


def test_hot_host_cache_refreshes_on_composition_shift(spark, tmp_path):
    """The cached hot-host list must pick up a host that FIRST appears in
    a later wave (the photo CDN arrives in wave 2 already-hot): the
    composition-shift trigger (next-frontier estimate outside [0.5x,2x]
    of the last refresh) forces an early refresh, so the CDN is salted
    without waiting out hot_refresh_waves.  Results stay identical to
    the exact selector."""
    from crawler_spark.plans.crawl_job import CrawlJob
    from crawler_spark.sources.pages import (
        NUM_BASE, build_pages, synthetic_docs_from_range,
    )

    docs = synthetic_docs_from_range(spark, 120)
    pages = build_pages(spark, "", include_fixtures=False, docs_df=docs)

    job = CrawlJob(spark, str(tmp_path / "salted"), pages,
                   wave_seconds=3600 * 1000, hot_refresh_waves=10,
                   hot_host_threshold=50)
    job.seed_range(NUM_BASE, NUM_BASE + 119)
    job.crawl()
    # wave 1's refresh could only see pet911.ru; the CDN host carries the
    # photo frontier and must have been picked up by the shift trigger
    # (hot_refresh_waves=10 means the age trigger can NOT have fired)
    assert "cdn.pet911.ru" in (job._hot_hosts or [])

    exact = CrawlJob(spark, str(tmp_path / "exact"), pages,
                     wave_seconds=3600 * 1000, salted=False)
    exact.seed_range(NUM_BASE, NUM_BASE + 119)
    exact.crawl()

    def state(j):
        good = j.cards().where(F.col("error").isNull())
        return sorted(
            map(tuple, good.select("id", "address", "description").collect())
        )

    assert state(job) == state(exact)
