"""Generic link-following BFS crawl plan (plans/link_crawl.py): min-hop
semantics, cycle safety, dead links, politeness-capped waves, robots
filtering."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.plans.link_crawl import link_crawl


def _pages(spark, edges):
    """edges: {url: [href, ...]} → pages(url, html binary)."""
    rows = [
        (u, bytearray("".join(f'<a href="{h}">x</a>' for h in hs)
                      .encode()))
        for u, hs in edges.items()
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def _seeds(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_bfs_min_hop_cycles_and_dead_links(spark):
    pages = _pages(spark, {
        "https://a/1": ["https://a/2", "https://b/3"],
        "https://a/2": ["https://a/4"],
        "https://b/3": ["https://a/4", "https://b/dead"],
        "https://a/4": ["https://a/1"],          # cycle back to the seed
    })
    got = {r["url"]: (r["hop"], r["host"])
           for r in link_crawl(spark, pages, _seeds(spark, ["https://a/1"]),
                               max_hops=5).collect()}
    assert got == {
        "https://a/1": (0, "a"),
        "https://a/2": (1, "a"), "https://b/3": (1, "b"),
        "https://a/4": (2, "a"), "https://b/dead": (2, "b"),
    }


def test_bfs_politeness_budget_caps_waves(spark):
    # one host, chain 1→2→3→4; budget of 1 fetch/wave (wave_seconds such
    # that budget=1) still crawls the chain one hop per wave; but a fanout
    # of 3 children can only expand 1 parent per wave
    pages = _pages(spark, {
        "https://h/1": ["https://h/2", "https://h/3"],
        "https://h/2": ["https://h/4"],
        "https://h/3": ["https://h/5"],
    })
    # DEFAULT_CRAWL_DELAY_MS=1000 → wave_seconds=1 gives budget 1/host
    got = {r["url"]: r["hop"]
           for r in link_crawl(spark, pages, _seeds(spark, ["https://h/1"]),
                               max_hops=3, wave_seconds=1).collect()}
    # hop 1 fetches only the seed (budget 1) → finds 2 and 3; hop 2
    # fetches ONE of {2,3} (xxhash64 order decides, deterministically) —
    # so exactly one of 4/5 is found by hop 3
    assert got["https://h/1"] == 0
    assert got["https://h/2"] == 1 and got["https://h/3"] == 1
    found_leaves = {u for u in got if u in ("https://h/4", "https://h/5")}
    assert len(found_leaves) == 1
    # uncapped crawl finds both leaves
    full = {r["url"] for r in link_crawl(
        spark, pages, _seeds(spark, ["https://h/1"]), max_hops=3).collect()}
    assert {"https://h/4", "https://h/5"} <= full


def test_bfs_robots_blocks_expansion_not_discovery(spark):
    from crawler_spark.operators.robots import parse_robots_rfc

    pages = _pages(spark, {
        "https://h/ok": ["https://h/private/x"],
        "https://h/private/x": ["https://h/leaked"],
    })
    robots = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /private\n")], "host string, text string")
    rules = parse_robots_rfc(robots)
    got = {r["url"]: r["hop"]
           for r in link_crawl(spark, pages, _seeds(spark, ["https://h/ok"]),
                               max_hops=4, robots_rules=rules).collect()}
    # /private/x is DISCOVERED (hop 1) but never fetched → /leaked unseen
    assert got == {"https://h/ok": 0, "https://h/private/x": 1}


def test_bfs_normalize_dedups_href_variants(spark):
    # two href spellings of the same target collapse under normalization
    pages = _pages(spark, {
        "https://h/a": ["HTTPS://H/t?b=2&a=1", "https://h/t?a=1&b=2"],
    })
    plain = link_crawl(spark, pages, _seeds(spark, ["https://h/a"]),
                       max_hops=1).count()
    norm = link_crawl(spark, pages, _seeds(spark, ["https://h/a"]),
                      max_hops=1, normalize=True).count()
    assert plain == 3 and norm == 2
