"""Benchmark driver — prints ONE JSON line.

Runs the headline workloads at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``:

* ``crawl_waves``      — the flagship: a full CrawlJob (frontier → seen/missing
  anti-joins → politeness wave select → fetch-as-join vs a synthetic pages
  corpus → parse UDF → photo fan-out/fan-in → snapshot commits) over
  ``BENCH_CARDS`` card ids.  Reported as pages/sec.
* ``frontier_select``  — frontier generation + seen anti-join + salted
  politeness selection over 1M urls (no fetch).  frontier-URLs/sec.
* a representative slice of ``__spark_entry__.queries()`` at the same sf.

Output: {"metric": "bench_total", "value": <total sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": <sf>, "pages_per_sec": ...,
         "frontier_urls_per_sec": ..., "cpus": N}

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_CARDS (default 20000),
BENCH_FRONTIER_URLS (default 1000000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CARDS = int(os.environ.get("BENCH_CARDS", "60000"))
BENCH_FRONTIER_URLS = int(os.environ.get("BENCH_FRONTIER_URLS", "1000000"))

QUERY_SLICE = (
    "seen_anti_join",
    "fanin_barrier",
    "windowed_counts",
    "sessionize_gaps",
    "doc_minhash_lsh_pairs",
    "doc_simhash_near_pairs",
    "emb_cosine_topk",
    "media_image_features",
)


def _sf_from_dir(d: str) -> float:
    tail = Path(d).name
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return -1.0


def bench_crawl(spark, timings: dict) -> dict:
    """Full crawl over a synthetic corpus; returns pages/sec stats."""
    from pyspark.sql import functions as F

    from crawler_spark.plans.crawl_job import CrawlJob
    from crawler_spark.sources.pages import NUM_BASE, synthetic_docs_from_range, build_pages

    docs = synthetic_docs_from_range(spark, BENCH_CARDS)
    pages = build_pages(spark, SF_DIR, include_fixtures=False, docs_df=docs)
    pages = pages.repartition(CPUS, "url").persist()
    n_pages = pages.count()  # materialize corpus OUTSIDE the timed section

    robots = spark.createDataFrame(
        [("pet911.ru", "/admin", 1), ("cdn.pet911.ru", "/admin", 1)],
        "host string, disallow_prefix string, crawl_delay_ms int",
    )
    store_dir = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        job = CrawlJob(
            spark, store_dir, pages,
            wave_seconds=3600 * 1000,  # budget >> corpus: throughput mode
            robots_df=robots, use_bloom=True, salted=False,
        )
        t0 = time.perf_counter()
        # synthetic ids are rf/rl{NUM_BASE+doc_id}: seed that exact range
        job.seed_range(NUM_BASE, NUM_BASE + BENCH_CARDS - 1)
        stats = job.crawl(max_waves=4)
        fetched = sum(s["fetched"] for s in stats)
        dt = time.perf_counter() - t0
        timings["crawl_waves"] = round(dt, 3)
        return {
            "pages_in_corpus": n_pages,
            "pages_fetch_attempts": fetched,
            "pages_per_sec": round(fetched / dt, 1),
            "waves": len(stats),
            "parsed_ok": sum(s["parsed_ok"] for s in stats),
        }
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)
        pages.unpersist()


def bench_frontier(spark, timings: dict) -> dict:
    """Frontier gen + anti-join + salted politeness select over N urls."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.politeness import select_wave_salted
    from crawler_spark.operators.seen import filter_unseen
    from crawler_spark.sources.frontier import frontier_from_range

    n_ids = BENCH_FRONTIER_URLS // 2  # two urls (rf/rl) per id

    def run(n):
        frontier = frontier_from_range(spark, 1, n)
        # seen = every 3rd id, as a realistic warm-crawl anti-join
        seen = frontier.where(F.col("num") % 3 == 0).select("url_hash")
        pending = filter_unseen(frontier, seen)
        picked = select_wave_salted(
            pending, wave_seconds=3600, n_salts=16, hot_host_threshold=10_000
        )
        return picked.where(F.col("selected")).count()

    run(max(n_ids // 20, 1))  # untimed warmup: codegen + exchange setup
    t0 = time.perf_counter()
    n_sel = run(n_ids)
    n_total = BENCH_FRONTIER_URLS
    dt = time.perf_counter() - t0
    timings["frontier_select"] = round(dt, 3)
    return {
        "frontier_urls": n_total,
        "frontier_selected": n_sel,
        "frontier_urls_per_sec": round(n_total / dt, 1),
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(CPUS))
    from crawler_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("crawler-spark-bench", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    crawl_stats = bench_crawl(spark, timings)
    frontier_stats = bench_frontier(spark, timings)

    qs = entrymod.queries()
    for name in QUERY_SLICE:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # untimed warmup (codegen, file listing)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "cpus": CPUS,
        **crawl_stats,
        **frontier_stats,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
