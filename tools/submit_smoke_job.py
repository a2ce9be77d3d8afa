"""Smoke driver for spark-submit --py-files packaging (north-rule launch
contract): imports the engine from the shipped zip ONLY, runs a miniature
range crawl, prints one JSON line.

Run via tools/submit.sh; asserted by tests/test_submit_packaging.py.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> None:
    spark = SparkSession.builder.appName("crawler-spark-submit-smoke").getOrCreate()
    # the engine must come from the --py-files zip, not the repo checkout
    from crawler_spark.plans.crawl_job import CrawlJob
    from crawler_spark.sources.pages import (
        NUM_BASE,
        build_pages,
        synthetic_docs_from_range,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    docs = synthetic_docs_from_range(spark, n)
    pages = build_pages(spark, "", include_fixtures=False, docs_df=docs)
    with tempfile.TemporaryDirectory(prefix="submit_smoke_") as store:
        job = CrawlJob(spark, store, pages, wave_seconds=10**9, prewarm=False)
        job.seed_range(NUM_BASE, NUM_BASE + n - 1)
        stats = job.crawl(max_waves=4)
        out = {
            "ok": True,
            "waves": len(stats),
            "fetched": sum(s["fetched"] for s in stats),
            "cards_ok": job.cards().where("error IS NULL").count(),
            "engine_from": __import__("crawler_spark").__file__,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
