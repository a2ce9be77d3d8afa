"""Tests for the bounded-memory sketch operators (operators/sketches.py)
and the PMI collocation miner (operators/corpus.pmi_bigrams)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.corpus import pmi_bigrams
from crawler_spark.operators.sketches import (
    H32_SPACE,
    cms_heavy_hitters,
    kmv_distinct_estimate,
)


@pytest.fixture(scope="module")
def word_docs(spark):
    # two sources with very different distinct-shingle counts; every text
    # is >= 3 tokens so the shingle path (not the short-doc fallback) runs
    rows = []
    for i in range(120):
        rows.append(
            ("big", i, f"alpha w{i} beta w{i + 1} gamma w{i * 7 % 97} delta")
        )
    for i in range(30):
        rows.append(("small", 1000 + i, f"one two three common tail {i % 5}"))
    return spark.createDataFrame(rows, "source string, doc_id long, text string")


def test_kmv_exact_fallback_when_under_k(spark):
    # 3 docs, tiny shingle universe << k  ->  k_used < k and est == exact
    docs = spark.createDataFrame(
        [("s", 0, "a b c"), ("s", 1, "a b c"), ("s", 2, "x y z")],
        "source string, doc_id long, text string",
    )
    row = kmv_distinct_estimate(docs, k=100).collect()[0]
    assert row["k_used"] < 100
    exact = (
        docs.select(F.explode(F.split(F.col("text"), " "))).distinct().count()
    )
    # 3-token docs yield one full-text shingle each -> 2 distinct shingles
    assert row["k_used"] == 2
    assert row["est_distinct"] == float(row["k_used"])
    assert exact == 6  # sanity on the fixture, not the operator


def test_kmv_estimate_tracks_exact_cardinality(word_docs):
    out = {r["source"]: r for r in kmv_distinct_estimate(word_docs, k=64).collect()}
    # exact distinct shingle counts per source for comparison
    from crawler_spark.functions.text import shingles

    exact = {
        r["source"]: r["n"]
        for r in word_docs.select(
            "source", F.explode(shingles(F.col("text"), 3)).alias("s")
        )
        .groupBy("source")
        .agg(F.countDistinct("s").alias("n"))
        .collect()
    }
    big = out["big"]
    assert big["k_used"] == 64
    # KMV with k=64 has relative sd ~ 1/sqrt(62) ~ 13%; allow 3 sigma
    assert abs(big["est_distinct"] - exact["big"]) / exact["big"] < 0.4
    # the small source has fewer distinct shingles than k -> exact
    small = out["small"]
    assert small["k_used"] == exact["small"]
    assert small["est_distinct"] == float(exact["small"])


def test_kmv_hash_ceiling_filters_but_stays_sound(word_docs):
    # a mid-range ceiling keeps enough survivors for the big source; the
    # estimate must stay in the same band as the unfiltered one
    full = {
        r["source"]: r
        for r in kmv_distinct_estimate(word_docs, k=32).collect()
    }
    filt = {
        r["source"]: r
        for r in kmv_distinct_estimate(
            word_docs, k=32, hash_ceiling=H32_SPACE // 2
        ).collect()
    }
    big_full, big_filt = full["big"], filt["big"]
    if big_filt["k_used"] == 32:
        # still saturated -> bottom-32 survivors are IDENTICAL hashes
        # (the ceiling only removed larger ones), so the estimate is equal
        assert big_filt["kth_min"] == big_full["kth_min"]
        assert big_filt["est_distinct"] == big_full["est_distinct"]
    else:
        # undersized ceiling is visible, never silent
        assert big_filt["k_used"] < 32


def test_cms_never_underestimates_and_tight_when_wide(word_docs):
    out = cms_heavy_hitters(word_docs, depth=4, width=2048, top_k=20).collect()
    assert len(out) == 20
    for r in out:
        assert r["cms_est"] >= r["true_cnt"]          # CMS one-sided error
        assert r["overcount"] == r["cms_est"] - r["true_cnt"]
    # with width >> vocab, collisions are rare: the heaviest token exact
    top = out[0]
    assert top["overcount"] <= top["true_cnt"]  # loose: far from degenerate
    # ordering: true_cnt desc, token asc
    counts = [r["true_cnt"] for r in out]
    assert counts == sorted(counts, reverse=True)


def test_cms_narrow_width_overcounts_more(word_docs):
    wide = {
        r["token"]: r["overcount"]
        for r in cms_heavy_hitters(word_docs, depth=2, width=4096, top_k=10).collect()
    }
    narrow = {
        r["token"]: r["overcount"]
        for r in cms_heavy_hitters(word_docs, depth=2, width=8, top_k=10).collect()
    }
    assert sum(narrow.values()) > sum(wide.values())


def test_pmi_ranks_true_collocation_first(spark):
    # "hong kong" always adjacent; "the" is everywhere -> low PMI
    rows = [
        (0, "visit hong kong the city the harbor"),
        (1, "hong kong the skyline and the peak"),
        (2, "flights to hong kong depart the gate"),
        (3, "the weather in hong kong is humid"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_bigrams(docs, min_count=3, top_k=10).collect()
    assert out[0]["w1"] == "hong" and out[0]["w2"] == "kong"
    assert out[0]["c12"] == 4
    pmis = [r["pmi"] for r in out]
    assert pmis == sorted(pmis, reverse=True)
    # min_count floor: nothing below 3 instances survives
    assert all(r["c12"] >= 3 for r in out)


def test_minhash_calibration_est_vs_exact(spark):
    from crawler_spark.operators.dedup import minhash_calibration

    base = "the quick brown fox jumps over the lazy dog near the red barn"
    rows = [
        (1, base),
        (2, base + " tonight"),                      # near-dup of 1
        (3, "completely different text about spark shuffles and joins ok"),
        (4, base),                                   # exact dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r
           for r in minhash_calibration(docs).collect()}
    assert (1, 4) in out                 # exact dup must be a candidate
    exact_pair = out[(1, 4)]
    assert exact_pair["est_jaccard"] == 1.0
    assert exact_pair["jaccard"] == 1.0
    assert exact_pair["abs_err"] == 0.0
    for r in out.values():               # estimator consistency everywhere
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["jaccard"] <= 1.0
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["jaccard"])) < 2e-6


def test_levenshtein_verify_known_distances(spark):
    from crawler_spark.operators.dedup import levenshtein_verify

    docs = spark.createDataFrame(
        [(1, "kitten"), (2, "sitting"), (3, "kitten"), (4, "zzzzzz")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    rows = {(r.id_a, r.id_b): r
            for r in levenshtein_verify(docs, candidates=cand).collect()}
    assert rows[(1, 2)].lev_dist == 3            # classic kitten->sitting
    assert rows[(1, 3)].lev_dist == 0
    assert rows[(1, 3)].norm_sim == 1.0
    assert rows[(1, 4)].lev_dist == 6            # full substitution
    assert rows[(1, 4)].norm_sim == 0.0
    # normalized similarity uses the longer prefix as denominator
    assert rows[(1, 2)].norm_sim == round(1 - 3 / 7, 6)


def test_levenshtein_verify_length_prune_and_threshold(spark):
    from crawler_spark.operators.dedup import levenshtein_verify

    docs = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcdxf"), (3, "ab")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = levenshtein_verify(docs, candidates=cand, max_dist=2).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    # (1,3) is pruned by |len_a-len_b|=4 > 2 BEFORE the DP runs;
    # (1,2) survives with dist 1 <= 2
    assert pairs == {(1, 2)}
    assert out[0].lev_dist == 1


def test_levenshtein_verify_prefix_truncation_bounds_cost(spark):
    from crawler_spark.operators.dedup import levenshtein_verify

    long_a = "x" * 500
    long_b = "x" * 400 + "y" * 100
    docs = spark.createDataFrame(
        [(1, long_a), (2, long_b)], "doc_id long, text string"
    )
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = levenshtein_verify(docs, candidates=cand, prefix_len=100).collect()[0]
    # both prefixes are "x"*100 -> identical after truncation
    assert (r.len_a, r.len_b, r.lev_dist, r.norm_sim) == (100, 100, 0, 1.0)


def test_host_fetch_concentration_uniform_and_skewed(spark):
    from crawler_spark.operators.politeness import host_fetch_concentration

    # perfectly fair: 4 hosts x 5 fetches -> hhi = 1/4, eff_hosts = 4
    fair = spark.createDataFrame(
        [(f"h{i}",) for i in range(4) for _ in range(5)], "host string"
    )
    r = host_fetch_concentration(fair, top_n=2).collect()[0]
    assert (r.n_hosts, r.n_fetches) == (4, 20)
    assert r.hhi == 0.25 and r.eff_hosts == 4.0
    assert r.top1_share == 0.25 and r.topn_share == 0.5

    # one dominant host: 97 of 100 fetches
    skew = spark.createDataFrame(
        [("big",)] * 97 + [("a",), ("b",), ("c",)], "host string"
    )
    r = host_fetch_concentration(skew, top_n=10).collect()[0]
    assert r.top1_share == 0.97
    assert r.topn_share == 1.0           # top_n > n_hosts sums everything
    assert r.hhi == round((97 * 97 + 3) / 10000, 6)


def test_discover_feeds_filters_and_types(spark):
    from crawler_spark.operators.web import discover_feeds

    pages = spark.createDataFrame(
        [
            # rss + atom + stylesheet noise + hrefless alternate
            (1, '<head><link rel="stylesheet" href="/s.css">'
                '<link rel="alternate" type="application/rss+xml"'
                ' title="T1" href="/f.xml">'
                '<link rel="alternate" type="application/atom+xml"'
                ' href="https://e.x/a">'
                '<link rel="alternate" type="application/rss+xml"></head>'),
            # wrong type value -> dropped
            (2, '<link rel="alternate" type="text/html" href="/p">'),
            (3, "<p>no links at all</p>"),
        ],
        "doc_id long, html string",
    )
    rows = sorted(
        (r.doc_id, r.feed_type, r.feed_url, r.feed_title)
        for r in discover_feeds(pages).collect()
    )
    assert rows == [
        (1, "atom", "https://e.x/a", ""),
        (1, "rss", "/f.xml", "T1"),
    ]


def test_hll_register_arithmetic_single_token(spark):
    from crawler_spark.operators.sketches import hll_distinct_estimate

    # one distinct token -> exactly one hit register whose scaled term is
    # 2^(23-rho); the other 1023 empty registers contribute 2^23 each.
    docs = spark.createDataFrame([("s", 0, "hello hello hello")],
                                 "source string, doc_id long, text string")
    row = hll_distinct_estimate(docs, p=10).collect()[0]
    assert row["m_hit"] == 1
    assert row["true_distinct"] == 1
    rest = row["z_scaled"] - 1023 * (1 << 23)
    assert rest in {1 << (23 - r) for r in range(1, 24)}
    assert row["est_hll"] > 0


def test_hll_estimate_tracks_exact_cardinality(spark):
    from crawler_spark.operators.sketches import hll_distinct_estimate

    # ~5000 distinct tokens at p=10 (m=1024): standard error is
    # ~1.04/sqrt(1024) = 3.25%; assert well inside 5 sigma.
    rows = [("s", i, " ".join(f"tok{j}" for j in range(i * 10, i * 10 + 10)))
            for i in range(500)]
    docs = spark.createDataFrame(rows,
                                 "source string, doc_id long, text string")
    row = hll_distinct_estimate(docs, p=10).collect()[0]
    assert row["true_distinct"] == 5000
    assert abs(row["rel_err"]) < 0.17
    assert row["est_hll"] == pytest.approx(
        5000 * (1 + row["rel_err"]), rel=0.02)


def test_hll_per_group_and_duplicates_ignored(spark):
    from crawler_spark.operators.sketches import hll_distinct_estimate

    # duplicate-heavy group and distinct-heavy group: the sketch sees
    # multiplicity-free cardinality (max(rho) is idempotent).
    rows = [("dup", i, "same words every time") for i in range(50)]
    rows += [("uniq", 100 + i, f"u{i} v{i} w{i}") for i in range(40)]
    docs = spark.createDataFrame(rows,
                                 "source string, doc_id long, text string")
    out = {r["source"]: r for r in hll_distinct_estimate(docs, p=10).collect()}
    assert out["dup"]["true_distinct"] == 4
    assert out["uniq"]["true_distinct"] == 120
    assert out["dup"]["est_hll"] < out["uniq"]["est_hll"]
    assert out["dup"]["m_hit"] == 4     # 4 tokens -> <=4 registers, no clash


def test_hist_quantiles_width1_is_near_exact(spark):
    from crawler_spark.operators.sketches import histogram_quantiles

    # 1..100 with 128 buckets -> width 1: every value its own bucket, the
    # estimate can only differ from the interpolated exact by < 1.
    docs = spark.createDataFrame([("s", v) for v in range(1, 101)],
                                 "source string, n_chars long")
    out = {r["q"]: r for r in histogram_quantiles(docs).collect()}
    assert out[0.5]["width"] == 1
    for q in (0.5, 0.9, 0.99):
        assert abs(out[q]["est"] - out[q]["exact"]) < 1.0
        assert abs(out[q]["rel_err"]) < 0.02


def test_hist_quantiles_coarse_buckets_still_bounded(spark):
    from crawler_spark.operators.sketches import histogram_quantiles

    # skewed long-tail values, only 8 buckets: error bounded by one
    # bucket width (the histogram guarantee), and visible in rel_err.
    vals = [v for v in range(1, 201)] + [5000, 6000, 7000, 8000]
    docs = spark.createDataFrame([("s", v) for v in vals],
                                 "source string, n_chars long")
    out = {r["q"]: r for r in
           histogram_quantiles(docs, n_buckets=8).collect()}
    w = out[0.5]["width"]
    assert w >= (8000 - 1 + 1) // 8
    for q in (0.5, 0.9):
        assert abs(out[q]["est"] - out[q]["exact"]) <= w


def test_hist_quantiles_per_group_independent(spark):
    from crawler_spark.operators.sketches import histogram_quantiles

    docs = spark.createDataFrame(
        [("a", v) for v in range(1, 51)]
        + [("b", 10 * v) for v in range(1, 51)],
        "source string, n_chars long")
    rows = histogram_quantiles(docs).collect()
    med = {(r["source"], r["q"]): r["est"] for r in rows}
    assert med[("b", 0.5)] > 5 * med[("a", 0.5)]
    assert len(rows) == 6


def test_hll_registers_merge_identity(spark):
    from pyspark.sql import functions as F
    from crawler_spark.operators.sketches import (
        hll_estimate_from_registers, hll_registers)

    rows = [("s", i, " ".join(f"tok{j}" for j in range(i * 8, i * 8 + 8)))
            for i in range(120)]
    docs = spark.createDataFrame(rows,
                                 "source string, doc_id long, text string")

    def items(d):
        return d.select(
            F.col("source").alias("g"),
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"))

    ra = hll_registers(items(docs.where(F.col("doc_id") % 2 == 0)))
    rb = hll_registers(items(docs.where(F.col("doc_id") % 2 == 1)))
    merged = ra.unionByName(rb).groupBy("g", "idx").agg(
        F.max("M").alias("M"))
    direct = hll_registers(items(docs))
    em = hll_estimate_from_registers(merged).collect()[0]["est_hll"]
    ed = hll_estimate_from_registers(direct).collect()[0]["est_hll"]
    assert em == ed            # merge identity is EXACT, not approximate
    # and the register tables themselves agree row-for-row
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))
