"""Web-scale URL / HTML / sitemap operators (crawler_spark/operators/web.py).

Golden-value tests: exact expected strings for the canonicalizer and the
text extractor (the DuckDB oracle parity is covered by tools/oracle_check.py
via the url_normalize / page_text_extract / sitemap_extract /
host_quality_rollup queries)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.web import (
    extract_sitemap_urls,
    host_quality_rollup,
    html_visible_text,
    normalize_url,
)


def _norm(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(normalize_url(F.lit(url)).alias("u"))
        .collect()[0]["u"]
    )


@pytest.mark.parametrize(
    "raw,expected",
    [
        # scheme+host case, default port, fragment
        ("HTTP://ExAmple.COM:80/Path#frag", "http://example.com/Path"),
        ("https://A.B.org:443/", "https://a.b.org/"),
        # non-default port survives
        ("http://h.io:8080/x", "http://h.io:8080/x"),
        # empty path -> '/', trailing slash stripped on non-root
        ("http://h.io", "http://h.io/"),
        ("http://h.io/a/b/", "http://h.io/a/b"),
        # tracking params dropped, remainder sorted, empty query dropped
        (
            "http://h.io/p?utm_source=x&b=2&a=1&fbclid=f&gclid=g&msclkid=m&ref=r",
            "http://h.io/p?a=1&b=2",
        ),
        ("http://h.io/p?utm_campaign=only", "http://h.io/p"),
        # percent-encoding preserved verbatim (Downloader.fs:58-64)
        ("https://pet911.ru/%D0%A5%D0%B0/rf1", "https://pet911.ru/%D0%A5%D0%B0/rf1"),
        # whitespace trim; query order canonicalized
        ("  http://h.io/p?z=1&y=2  ", "http://h.io/p?y=2&z=1"),
    ],
)
def test_normalize_url_golden(spark, raw, expected):
    assert _norm(spark, raw) == expected


def test_normalize_url_merges_param_order_identity(spark):
    a = _norm(spark, "http://h.io/p?a=1&b=2&utm_source=s")
    b = _norm(spark, "http://h.io/p?b=2&utm_medium=m&a=1")
    assert a == b == "http://h.io/p?a=1&b=2"


def test_html_visible_text_golden(spark):
    html = (
        "<html><head><title>T</title><style>p {color: red}</style>"
        "<script>if (1 < 2) { x = '</div>'; }</script></head>"
        "<body><!-- hidden --><h1>Head</h1>\n<p>one &amp; two &lt;three&gt;"
        "&nbsp;&quot;four&quot; &#39;five&#39;</p></body></html>"
    )
    out = (
        spark.range(1)
        .select(html_visible_text(F.lit(html)).alias("t"))
        .collect()[0]["t"]
    )
    assert out == "T Head one & two <three> \"four\" 'five'"


def test_html_visible_text_double_escape_not_decoded(spark):
    # '&amp;lt;' is the ESCAPED text '&lt;' — must decode to '&lt;', not '<'
    out = (
        spark.range(1)
        .select(html_visible_text(F.lit("<p>&amp;lt;</p>")).alias("t"))
        .collect()[0]["t"]
    )
    assert out == "&lt;"


def test_extract_sitemap_urls_order_and_trim(spark):
    df = spark.createDataFrame(
        [
            ("h1", "<urlset><url><loc> http://h1/a </loc></url>"
                   "<url><loc>http://h1/b</loc></url></urlset>"),
            ("h2", "<urlset></urlset>"),
        ],
        "host string, sitemap_xml string",
    )
    rows = extract_sitemap_urls(df).orderBy("host", "pos").collect()
    assert [(r.host, r.pos, r.url) for r in rows] == [
        ("h1", 1, "http://h1/a"),
        ("h1", 2, "http://h1/b"),
    ]


def test_host_quality_rollup_dup_ratio(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique one", "h1"),
            (2, "same text", "h1"),
            (3, "same text", "h1"),
            (4, "other", "h1"),
            (5, "solo", "h2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r.source: r
        for r in host_quality_rollup(docs, F.length("text").cast("double")).collect()
    }
    assert out["h1"].n_docs == 4
    assert out["h1"].dup_ratio == 0.5  # docs 2 and 3 of 4
    assert out["h2"].dup_ratio == 0.0
    # mean over DOCS not distinct texts: (10+9+9+5)/4
    assert out["h1"].mean_quality == pytest.approx(8.25)
    assert out["h1"].priority == pytest.approx(8.25 * 0.5)


def test_extract_links_multi_and_none(spark):
    from crawler_spark.operators.web import extract_links

    df = spark.createDataFrame(
        [
            ("p1", '<a href="/x">one</a> mid <a href="/y" rel="no"> two </a>'),
            ("p2", "no links at all"),
        ],
        "url string, html string",
    )
    rows = extract_links(df).orderBy("url", "pos").collect()
    assert [(r.url, r.pos, r.href, r.anchor) for r in rows] == [
        ("p1", 1, "/x", "one"),
        ("p1", 2, "/y", "two"),
    ]


def test_anchor_text_profile_dominant_and_ties(spark):
    from crawler_spark.operators.web import anchor_text_profile

    links = spark.createDataFrame(
        [
            ("t1", "buy now"), ("t1", "buy now"), ("t1", "cheap"),
            ("t2", "b"), ("t2", "a"),          # tie -> lexicographic min
            ("t3", "solo"),
        ],
        "href string, anchor string",
    )
    out = {r.href: r for r in anchor_text_profile(links).collect()}
    assert out["t1"].n_links == 3 and out["t1"].n_distinct_anchors == 2
    assert out["t1"].top_anchor == "buy now"
    assert out["t2"].top_anchor == "a"        # tie broken deterministically
    assert out["t3"].n_links == 1 and out["t3"].top_anchor == "solo"


# ---------------------------------------------------------------------------
# RefinedWeb-style URL filtering
# ---------------------------------------------------------------------------

def test_url_quality_flags(spark):
    from crawler_spark.operators.web import url_quality_flags

    urls = [
        (0, "https://good.example.org/article/how-to-train"),
        (1, "http://spam-casino.example/win"),                  # blocked host
        (2, "https://sub.badsite.example/page"),                # blocked parent
        (3, "https://ok.org/page?a=1&" + "&".join(f"p{i}={i}" for i in range(9))),
        (4, "https://ok.org/" + "x" * 600),                     # too long
        (5, "ftp://files.org/pub"),                             # non-http
        (6, "https://ok.org/watch-free-casino-stream"),         # bad word
        (7, "https://ok.org/" + "1234567890" * 8),              # digit heavy
        (8, "https://notbadsite.example/x"),  # suffix must match on a dot
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_quality_flags(df).collect()}
    assert out[0]["url_keep"] is True
    assert out[1]["host_blocked"] and not out[1]["url_keep"]
    assert out[2]["host_blocked"]          # *.badsite.example
    assert out[8]["host_blocked"] is False  # 'notbadsite.example' ≠ suffix
    assert out[3]["too_many_params"] and out[3]["n_params"] == 10
    assert out[4]["too_long"]
    assert out[5]["non_http"]
    assert out[6]["bad_word_in_url"]
    assert out[7]["digit_heavy"] and out[7]["digit_frac"] > 0.4
    assert all(not out[i]["url_keep"] for i in (1, 2, 3, 4, 5, 6, 7))


# ---------------------------------------------------------------------------
# boilerpipe-style main-content extraction
# ---------------------------------------------------------------------------

def test_main_content_blocks(spark):
    from crawler_spark.operators.web import main_content_blocks

    nav = '<a href="/">home</a> <a href="/a">about</a> <a href="/c">contact</a>'
    body1 = ("this is the long main article paragraph with many plain words "
             "and a single <a href='/ref'>reference link</a> inside it")
    body2 = "a second substantial content paragraph follows the first one here"
    footer = '<a href="/t">terms</a> <a href="/p">privacy</a>'
    html = (f"<html><body><nav>{nav}</nav><p>{body1}</p><p>{body2}</p>"
            f"<footer>{footer}</footer><script>var x=1;</script></body></html>")
    pages = spark.createDataFrame([(0, html)], "doc_id long, html string")
    out = main_content_blocks(pages).collect()[0]
    assert out["n_kept"] == 2
    txt = out["content_text"]
    assert "main article paragraph" in txt and "content paragraph" in txt
    assert "reference link" in txt          # inline anchors keep their text
    assert "home" not in txt and "privacy" not in txt  # nav/footer dropped
    assert "var x=1" not in txt             # script stripped before splitting
    assert out["n_chars_main"] == len(txt)


def test_main_content_blocks_link_density_boundary(spark):
    from crawler_spark.operators.web import main_content_blocks

    # a block that is ALL link text (density 1.0) must drop even when long
    all_links = " ".join(f'<a href="/{i}">w{i} word{i}</a>' for i in range(6))
    prose = "plain prose block with more than five simple words in it"
    html = f"<p>{all_links}</p><p>{prose}</p>"
    pages = spark.createDataFrame([(0, html)], "doc_id long, html string")
    out = main_content_blocks(pages).collect()[0]
    assert out["content_text"] == prose
    assert out["n_kept"] == 1


def test_main_content_blocks_empty_page(spark):
    from crawler_spark.operators.web import main_content_blocks

    pages = spark.createDataFrame(
        [(0, "<html><body><nav><a href='/'>x</a></nav></body></html>")],
        "doc_id long, html string",
    )
    out = main_content_blocks(pages).collect()[0]
    assert out["n_kept"] == 0 and out["content_text"] == ""


# ---------------------------------------------------------------------------
# largest-remainder crawl-budget allocation
# ---------------------------------------------------------------------------

def test_allocate_crawl_budget_hamilton(spark):
    from crawler_spark.operators.politeness import allocate_crawl_budget

    hosts = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1), ("d", 1), ("e", 0)],
        "host string, weight long",
    )
    out = {r["host"]: r for r in allocate_crawl_budget(hosts, 7).collect()}
    # ideal = [3.5, 2.1, 0.7, 0.7, 0]; floors sum 5, two bonuses go to the
    # largest remainders (c, d at .7)
    assert [out[h]["quota"] for h in "abcde"] == [3, 2, 1, 1, 0]
    assert sum(r["quota"] for r in out.values()) == 7


def test_allocate_crawl_budget_tie_break_and_cap(spark):
    from crawler_spark.operators.politeness import allocate_crawl_budget

    hosts = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1), ("d", 1), ("e", 0)],
        "host string, weight long",
    )
    out = {r["host"]: r for r in allocate_crawl_budget(hosts, 6).collect()}
    # ideal = [3.0, 1.8, 0.6, 0.6, 0]; leftover 2 -> b (.8) then the c/d
    # tie at .6 breaks by host ascending -> c
    assert [out[h]["quota"] for h in "abcde"] == [3, 2, 1, 0, 0]
    assert sum(r["quota"] for r in out.values()) == 6
    # cap clamps after apportionment (total may undershoot, documented)
    capped = {r["host"]: r["quota"]
              for r in allocate_crawl_budget(hosts, 7, cap=2).collect()}
    assert capped["a"] == 2 and max(capped.values()) <= 2


# ---------------------------------------------------------------------------
# page metadata extraction
# ---------------------------------------------------------------------------

def test_extract_page_metadata(spark):
    from crawler_spark.operators.web import extract_page_metadata

    html = (
        "<html><head><title> My &amp; Page \n title </title>"
        '<meta name="description" content="A fine &quot;doc&quot;">'
        '<meta content="OG Title Here" property="og:title">'   # reversed attrs
        '<link rel="canonical" href="https://ex.org/canon">'
        "</head><body><h1>Main   Heading</h1><h1>second</h1></body></html>"
    )
    bare = "<html><body>no metadata at all</body></html>"
    pages = spark.createDataFrame(
        [(0, html), (1, bare)], "doc_id long, html string"
    )
    out = {r["doc_id"]: r for r in extract_page_metadata(pages).collect()}
    assert out[0]["title"] == "My & Page title"
    assert out[0]["meta_description"] == 'A fine "doc"'
    assert out[0]["og_title"] == "OG Title Here"      # content-first order
    assert out[0]["canonical_url"] == "https://ex.org/canon"
    assert out[0]["h1"] == "Main Heading"             # first h1 only
    assert all(out[1][c] == "" for c in
               ("title", "meta_description", "og_title", "canonical_url", "h1"))


# ---------------------------------------------------------------------------
# nested sitemap-index expansion
# ---------------------------------------------------------------------------

def _urlset(*urls):
    locs = "".join(f"<loc>{u}</loc>" for u in urls)
    return f'<?xml version="1.0"?><urlset>{locs}</urlset>'


def _smindex(*urls):
    locs = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in urls)
    return f'<?xml version="1.0"?><sitemapindex>{locs}</sitemapindex>'


def test_expand_sitemap_index_two_levels(spark):
    from crawler_spark.operators.web import expand_sitemap_index

    rows = [
        ("https://h/root.xml", _smindex("https://h/a.xml", "https://h/b.xml",
                                        "https://h/missing.xml")),
        ("https://h/a.xml", _urlset("https://h/p1", "https://h/p2")),
        ("https://h/b.xml", _smindex("https://h/c.xml")),   # nested index
        ("https://h/c.xml", _urlset("https://h/p3")),
    ]
    df = spark.createDataFrame(rows, "url string, sitemap_xml string")
    out = expand_sitemap_index(df).collect()
    root = {(r["url"], r["depth"]) for r in out
            if r["root_url"] == "https://h/root.xml"}
    # a.xml's pages at depth 2, c.xml's page (via b.xml) at depth 3;
    # missing.xml silently drops out
    assert root == {("https://h/p1", 2), ("https://h/p2", 2),
                    ("https://h/p3", 3)}
    # every leaf sitemap is also its own root at depth 1
    a_root = {(r["url"], r["depth"]) for r in out
              if r["root_url"] == "https://h/a.xml"}
    assert a_root == {("https://h/p1", 1), ("https://h/p2", 1)}


def test_expand_sitemap_index_cycle_terminates(spark):
    from crawler_spark.operators.web import expand_sitemap_index

    rows = [
        ("https://h/x.xml", _smindex("https://h/y.xml")),
        ("https://h/y.xml", _smindex("https://h/x.xml")),   # cycle
    ]
    df = spark.createDataFrame(rows, "url string, sitemap_xml string")
    out = expand_sitemap_index(df, max_depth=3).collect()
    assert out == []  # bounded depth; no page urls anywhere in the cycle


# ---------------------------------------------------------------------------
# fetch-timeline scheduling
# ---------------------------------------------------------------------------

def test_schedule_fetch_times(spark):
    from crawler_spark.operators.politeness import schedule_fetch_times

    wave = spark.createDataFrame(
        [("a.example", 1, "u1"), ("a.example", 3, "u2"), ("a.example", 2, "u3"),
         ("b.example", 1, "u4"), ("b.example", 2, "u5")],
        "host string, seq long, url string",
    )
    robots = spark.createDataFrame(
        [("a.example", 2000)], "host string, crawl_delay_ms long"
    )
    out = {r["url"]: r for r in
           schedule_fetch_times(wave, base_ts_ms=10_000,
                                default_delay_ms=500,
                                robots_df=robots).collect()}
    # a.example: robots delay 2000, crawl order by seq (u1, u3, u2)
    assert (out["u1"]["fetch_rank"], out["u1"]["fetch_at_ms"]) == (1, 10_000)
    assert (out["u3"]["fetch_rank"], out["u3"]["fetch_at_ms"]) == (2, 12_000)
    assert (out["u2"]["fetch_rank"], out["u2"]["fetch_at_ms"]) == (3, 14_000)
    # b.example: no robots row -> default 500ms spacing
    assert out["u4"]["fetch_at_ms"] == 10_000
    assert out["u5"]["fetch_at_ms"] == 10_500
    assert out["u5"]["host_delay_ms"] == 500


def test_host_circuit_breaker_trips_with_evidence(spark):
    from crawler_spark.operators.politeness import (
        apply_circuit_breaker,
        host_circuit_breaker,
    )

    rows = (
        [("a", False)] * 20 + [("a", True)] * 10
        + [("b", True)] * 29 + [("b", False)]
        + [("c", False)] * 5
    )
    log = spark.createDataFrame(rows, "host string, success boolean")
    br = {r["host"]: r for r in host_circuit_breaker(log).collect()}
    assert br["a"]["tripped"] and br["a"]["failure_rate"] == round(20 / 30, 6)
    assert not br["b"]["tripped"]        # healthy: 1/30 failures
    assert not br["c"]["tripped"]        # all-failing but below min_attempts
    frontier = spark.createDataFrame(
        [(h, i) for h in "abc" for i in range(3)], "host string, seq long"
    )
    kept = apply_circuit_breaker(frontier, host_circuit_breaker(log))
    assert sorted({r["host"] for r in kept.collect()}) == ["b", "c"]


def test_adaptive_crawl_delay_interpolation_and_clamps(spark):
    from crawler_spark.operators.politeness import adaptive_crawl_delay

    rows = (
        [("fast", 10)] * 20
        + [("slow", 100)] * 19 + [("slow", 1000)]
        + [("huge", 60000)] * 4
    )
    log = spark.createDataFrame(rows, "host string, latency_ms long")
    out = {r["host"]: r for r in adaptive_crawl_delay(log).collect()}
    # p95 of 19x100 + one 1000: 100 + 0.05*(1000-100) = 145 -> ceil(290)
    assert out["slow"]["p95_latency_ms"] == 145.0
    assert out["slow"]["delay_ms"] == 290
    assert out["fast"]["delay_ms"] == 100      # min clamp
    assert out["huge"]["delay_ms"] == 30000    # max clamp


def test_crawl_trap_score_signals_and_thresholds(spark):
    from crawler_spark.operators.web import crawl_trap_score

    rows = []
    # calendar trap: 30 urls, 3 distinct payloads, one digit template
    for i in range(30):
        rows.append((f"https://trap.example/cal/2024/{i}/view?sid={i}",
                     f"same-{i % 3}"))
    # healthy host: 25 urls, all-distinct content, distinct templates
    for i in range(25):
        rows.append((f"https://good.example/article/slug-{chr(97 + i)}",
                     f"unique content {i}"))
    # tiny host: trap-shaped but below the evidence floor
    for i in range(5):
        rows.append((f"https://tiny.example/p/{i}", "same"))
    pages = spark.createDataFrame(rows, "url string, text string")
    out = {r["host"]: r for r in crawl_trap_score(pages).collect()}

    t = out["trap.example"]
    assert t["n_urls"] == 30 and t["n_distinct_content"] == 3
    assert t["n_path_templates"] == 1      # /cal/N/N/view
    assert t["content_dup_ratio"] == 0.9
    assert t["urls_per_template"] == 30.0
    assert t["mean_params"] == 1.0
    assert t["trapped"]

    g = out["good.example"]
    assert g["content_dup_ratio"] == 0.0 and not g["trapped"]
    assert g["n_path_templates"] == 25

    tiny = out["tiny.example"]
    assert tiny["content_dup_ratio"] == 0.8 and not tiny["trapped"]


def test_crawl_trap_score_plan_is_one_agg_no_python(spark):
    from crawler_spark.operators.web import crawl_trap_score

    pages = spark.createDataFrame(
        [(f"https://h{i % 3}.example/a/{i}?x=1", f"t{i}") for i in range(50)],
        "url string, text string",
    )
    plan = crawl_trap_score(pages)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Window" not in plan
    # distinct-count aggregation expands but stays hash-partitioned on host
    assert "Exchange hashpartitioning(host" in plan


def test_url_alias_clusters_shortest_wins(spark):
    from crawler_spark.operators.web import url_alias_clusters

    pages = spark.createDataFrame(
        [
            ("https://ex.com/a", "same"),
            ("https://ex.com/a?utm=1", "same"),
            ("https://ex.com/print/a", "same"),
            ("https://ex.com/b", "other"),
            ("https://ex.com/ab", "tie"),   # same length as /ac: lexicographic
            ("https://ex.com/ac", "tie"),
        ],
        "url string, text string",
    )
    out = {r["url"]: r for r in url_alias_clusters(pages).collect()}
    assert out["https://ex.com/a?utm=1"]["canonical_url"] == "https://ex.com/a"
    assert out["https://ex.com/print/a"]["cluster_size"] == 3
    assert out["https://ex.com/a"]["is_canonical"]
    assert not out["https://ex.com/a?utm=1"]["is_canonical"]
    assert out["https://ex.com/b"]["cluster_size"] == 1
    assert out["https://ex.com/ac"]["canonical_url"] == "https://ex.com/ab"


def test_url_alias_clusters_plan_no_window_no_python(spark):
    from crawler_spark.operators.web import url_alias_clusters

    pages = spark.createDataFrame(
        [(f"https://h.example/{i}?v={i % 4}", f"c{i % 7}") for i in range(40)],
        "url string, text string",
    )
    plan = url_alias_clusters(pages)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Window" not in plan


def test_registered_domain_rules(spark):
    from crawler_spark.operators.web import registered_domain

    cases = [
        ("img1.shop.example.co.uk", "example.co.uk"),
        ("www.shop.example.co.uk", "example.co.uk"),
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("a.b.c.d.site.net", "site.net"),
        ("x.com.au", "x.com.au"),        # 3 labels ending in a cc-SLD
        ("com.au", "com.au"),            # bare suffix: <=2 labels -> itself
        ("10.0.17.1", "10.0.17.1"),      # IPv4 literal untouched
        ("localhost", "localhost"),      # single label
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select("host", registered_domain(F.col("host")).alias("d"))
        .collect()
    }
    for host, want in cases:
        assert got[host] == want, (host, got[host], want)


def test_registered_domain_codegen_no_python(spark):
    from crawler_spark.operators.web import registered_domain

    df = spark.createDataFrame([("a.b.co.uk",)], "host string")
    plan = (
        df.select(registered_domain(F.col("host")).alias("d"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_extract_tables_multiline_attrs_and_tagstrip(spark):
    from crawler_spark.operators.web import extract_tables

    html = """<TABLE border="1">
      <tr class="head">
        <th colspan="2"> A  Header </th>
      </tr>
      <tr><td><a href="/x">link text</a></td><td> v&nbsp;1 </td></tr>
    </TABLE>
    <p>between</p>
    <table><tr><td>solo</td></tr></table>"""
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    rows = extract_tables(pages).collect()
    got = {(r["table_idx"], r["row_idx"], r["col_idx"]): r["cell"] for r in rows}
    assert got[(1, 1, 1)] == "A Header"
    assert got[(1, 2, 1)] == "link text"        # inner tags stripped
    assert got[(2, 1, 1)] == "solo"
    assert len(rows) == 4


def test_extract_jsonld_quotes_case_and_malformed(spark):
    from crawler_spark.operators.web import extract_jsonld

    html = (
        '<script TYPE="application/ld+json">'
        '{"@type":"Product","name":"Rex","description":"good dog"}'
        "</script>"
        "<script type='application/ld+json'>{\"@type\":\"Offer\"}</script>"
        '<script type="application/ld+json">{"@type":broken</script>'
        '<script type="text/javascript">{"@type":"NotLD"}</script>'
    )
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    out = {r["block_idx"]: r for r in extract_jsonld(pages).collect()}
    assert len(out) == 3                        # plain JS block not captured
    assert out[1]["item_type"] == "Product" and out[1]["name"] == "Rex"
    assert out[2]["item_type"] == "Offer" and out[2]["name"] is None
    assert out[3]["item_type"] is None          # malformed -> nulls, no error


def test_http_cache_decision_rule_matrix(spark):
    from crawler_spark.operators.web import http_cache_decision

    rows = [
        # id, fetched_at,        cc,                 etag,  last_modified
        (1, "2024-01-19 23:00:00", "max-age=86400", None, None),  # fresh
        (2, "2024-01-10 00:00:00", "max-age=3600", '"e"', None),  # stale+etag
        (3, "2024-01-10 00:00:00", "max-age=3600", None,
         "2024-01-01 00:00:00"),                        # stale+lm only
        (4, "2024-01-10 00:00:00", "max-age=3600", None, None),   # stale bare
        (5, "2024-01-19 23:59:00", "no-store, max-age=999999", '"e"', None),
        (6, "2024-01-19 23:59:00", "no-cache, max-age=999999", '"e"', None),
        (7, "2024-01-19 23:59:00", "no-cache", None, None),
        (8, "2024-01-19 23:59:00", None, None, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        [(i, f, cc, e, lm) for i, f, cc, e, lm in rows],
        "url_id long, fetched_at string, cache_control string, "
        "etag string, last_modified string",
    ).selectExpr(
        "url_id", "cast(fetched_at as timestamp) fetched_at",
        "cache_control", "etag", "cast(last_modified as timestamp) "
        "last_modified",
    )
    out = {r["url_id"]: r["action"]
           for r in http_cache_decision(df, "2024-01-20 00:00:00").collect()}
    assert out == {
        1: "fresh",
        2: "revalidate_etag",
        3: "revalidate_lm",
        4: "refetch",
        5: "refetch",            # no-store beats everything
        6: "revalidate_etag",    # no-cache beats max-age freshness
        7: "refetch",            # no-cache without validators
        8: "revalidate_lm",      # no cc at all -> validator path
    }


def test_mine_url_templates_collapses_ids_and_hex(spark):
    from crawler_spark.operators.web import mine_url_templates

    urls = spark.createDataFrame(
        [
            ("https://h1/pet/123",),
            ("https://h1/pet/456",),
            ("https://h1/pet/456",),  # dup url
            ("https://h1/session/0123456789abcdef0123456789abcdef",),
            ("https://h1/session/fedcba9876543210fedcba9876543210",),
            ("https://h1/about",),  # below min_urls -> dropped
            ("https://h2/cal/2026/3",),
            ("https://h2/cal/2027/11",),
        ],
        "url string",
    )
    out = {
        (r["host"], r["template"]): r
        for r in mine_url_templates(urls, min_urls=2).collect()
    }
    assert set(out) == {
        ("h1", "/pet/{n}"),
        ("h1", "/session/{hex}"),
        ("h2", "/cal/{n}/{n}"),
    }
    pet = out[("h1", "/pet/{n}")]
    assert pet["n_urls"] == 3
    assert pet["n_distinct_urls"] == 2
    assert pet["sample_url"] == "https://h1/pet/123"
    assert out[("h1", "/session/{hex}")]["n_urls"] == 2


def test_detect_charset_meta_variants(spark):
    from crawler_spark.operators.web import detect_charset

    pages = spark.createDataFrame(
        [
            ("u1", '<html><head><meta charset="UTF-8"></head>'),
            ("u2", "<html><head><meta http-equiv='Content-Type' "
                   "content='text/html; charset=Windows-1251'></head>"),
            ("u3", "<html><head><meta charset=iso-8859-1></head>"),
            ("u4", "<html><head><title>no declaration</title></head>"),
            ("u5", ""),
        ],
        "url string, html string",
    )
    out = {r["url"]: (r["charset"], r["declared"])
           for r in detect_charset(pages).collect()}
    assert out == {
        "u1": ("utf-8", True),
        "u2": ("windows-1251", True),
        "u3": ("iso-8859-1", True),
        "u4": ("utf-8", False),
        "u5": ("utf-8", False),
    }


def test_detect_charset_ignores_declaration_past_sniff_window(spark):
    from crawler_spark.operators.web import detect_charset

    late = "<html>" + "x" * 3000 + '<meta charset="koi8-r">'
    pages = spark.createDataFrame([("u1", late)], "url string, html string")
    row = detect_charset(pages, sniff_bytes=2048).collect()[0]
    assert (row["charset"], row["declared"]) == ("utf-8", False)


def test_plan_frontier_shards_consistency_and_load(spark):
    from crawler_spark.operators.web import plan_frontier_shards

    frontier = spark.createDataFrame(
        [(f"host{i % 5}", f"https://host{i % 5}/u/{i}") for i in range(100)],
        "host string, url string",
    )
    out = plan_frontier_shards(frontier, n_shards=4).collect()
    # every URL accounted for, hosts never split across shards
    assert sum(r["n_urls"] for r in out) == 100
    assert sum(r["n_hosts"] for r in out) == 5
    # rel_load is each shard's share vs perfect balance: mean over all
    # n_shards is 1.0, so present shards sum to <= n_shards
    assert abs(sum(r["n_urls"] * 4 / 100 - r["rel_load"] for r in out)) < 1e-6
    # deterministic: same input -> same assignment
    again = plan_frontier_shards(frontier, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_host_dup_rate_counts_distinct_texts(spark):
    from crawler_spark.operators.web import host_dup_rate

    docs = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")],
        "host string, text string",
    )
    rows = {r.host: r for r in host_dup_rate(docs).collect()}
    assert (rows["a"].n_pages, rows["a"].n_unique) == (3, 2)
    assert rows["a"].dup_rate == round(1 - 2 / 3, 6)
    assert rows["b"].dup_rate == 0.0


def test_host_mirror_pairs_and_skew_guard(spark):
    from crawler_spark.operators.web import host_mirror_pairs

    rows = []
    # m1/m2 mirror each other on pages p1,p2,p3; m3 shares only p1
    for h in ("m1", "m2"):
        rows += [(h, "p1"), (h, "p2"), (h, "p3")]
    rows += [("m3", "p1")]
    # boilerplate page served by EVERY host — must be dropped by the guard
    for h in ("m1", "m2", "m3", "m4", "m5"):
        rows.append((h, "404 not found"))
    docs = spark.createDataFrame(rows, "host string, text string")
    out = {(r.host_a, r.host_b): r.shared_pages
           for r in host_mirror_pairs(docs, min_shared=2,
                                      max_hosts_per_hash=4).collect()}
    # only the true mirror pair survives: m3 shares 1 real page (< 2) and
    # the 5-host boilerplate hash is excluded before the self-join
    assert out == {("m1", "m2"): 3}


def test_host_mirror_pairs_duplicate_urls_within_host_collapse(spark):
    from crawler_spark.operators.web import host_mirror_pairs

    # the same page crawled twice on one host counts once (distinct)
    docs = spark.createDataFrame(
        [("a", "p"), ("a", "p"), ("b", "p"), ("a", "q"), ("b", "q")],
        "host string, text string",
    )
    out = {(r.host_a, r.host_b): r.shared_pages
           for r in host_mirror_pairs(docs, min_shared=2).collect()}
    assert out == {("a", "b"): 2}


def test_focused_crawl_scores_topicality_and_identity(spark):
    from crawler_spark.operators.web import focused_crawl_scores

    links = spark.createDataFrame(
        [
            (1, 0, "/pets", "pet rescue stories"),   # 2/3 topical
            (2, 0, "/pets", "click here"),           # same target, 0 hits
            (3, 0, "/pets", "pet rescue stories"),   # duplicate anchor,
                                                     # distinct link
            (1, 1, "/cars", "fast cars"),
            (4, 0, "/ghost", ""),                    # anchorless -> no row
        ],
        "doc_id long, pos long, href string, anchor string",
    )
    rows = {r.href: r for r in focused_crawl_scores(
        links, ["pet", "rescue"], link_id_cols=("doc_id", "pos")
    ).collect()}
    assert rows["/pets"].n_inlinks == 3      # duplicate anchors still count
    assert rows["/pets"].topic_hits == 4
    assert rows["/pets"].anchor_terms == 8
    assert rows["/pets"].score == 0.5
    assert rows["/cars"].score == 0.0
    assert "/ghost" not in rows              # no anchor evidence, no row


def test_soft404_title_error_is_sufficient(spark):
    from crawler_spark.operators.web import soft404_scores

    pages = spark.createDataFrame(
        [(1, "<html><head><title>404 Not Found</title></head>"
             "<body>" + "real content word " * 50 + "</body></html>"),
         (2, "<html><head><title>Great article</title></head>"
             "<body>" + "real content word " * 50 + "</body></html>")],
        "page_id long, html string")
    out = {r.page_id: r for r in soft404_scores(pages).collect()}
    assert out[1]["title_error"] and out[1]["is_soft404"]
    assert not out[2]["title_error"] and not out[2]["is_soft404"]
    assert not out[1]["thin"]                 # long body, still flagged


def test_soft404_weak_phrase_needs_thin_or_second_phrase(spark):
    from crawler_spark.operators.web import soft404_scores

    long_body_one_phrase = (
        "<html><head><title>ok</title></head><body>"
        "the page you want does not exist here, but "
        + "lots of genuine prose " * 30 + "</body></html>")
    thin_one_phrase = (
        "<html><head><title>ok</title></head>"
        "<body>sorry, does not exist</body></html>")
    two_phrases = (
        "<html><head><title>ok</title></head><body>page not found — it "
        "does not exist. " + "filler words here " * 30 + "</body></html>")
    pages = spark.createDataFrame(
        [(1, long_body_one_phrase), (2, thin_one_phrase), (3, two_phrases)],
        "page_id long, html string")
    out = {r.page_id: r for r in soft404_scores(pages).collect()}
    assert out[1]["phrase_hits"] == 1 and not out[1]["is_soft404"]
    assert out[2]["phrase_hits"] == 1 and out[2]["thin"] and out[2]["is_soft404"]
    assert out[3]["phrase_hits"] >= 2 and out[3]["is_soft404"]


def test_soft404_phrases_in_script_do_not_count(spark):
    from crawler_spark.operators.web import soft404_scores

    # phrase text inside <script> is not VISIBLE text -> no hit
    pages = spark.createDataFrame(
        [(1, "<html><head><title>fine</title>"
             "<script>alert('page not found')</script></head>"
             "<body>" + "healthy text " * 40 + "</body></html>")],
        "page_id long, html string")
    row = soft404_scores(pages).collect()[0]
    assert row["phrase_hits"] == 0 and not row["is_soft404"]


def test_sitemap_lastmod_entries_with_and_without(spark):
    from crawler_spark.operators.web import sitemap_lastmod_entries

    xml = ("<urlset>"
           "<url><loc> https://e.com/a </loc>"
           "<lastmod>2024-02-01</lastmod></url>"
           "<url><loc>https://e.com/b</loc></url>"
           "</urlset>")
    df = spark.createDataFrame([("h1", xml)], "host string, sitemap_xml string")
    out = {r["url"]: r for r in sitemap_lastmod_entries(df).collect()}
    assert out["https://e.com/a"]["lastmod"] == "2024-02-01"
    assert out["https://e.com/a"]["pos"] == 1
    assert out["https://e.com/b"]["lastmod"] == ""
    assert out["https://e.com/b"]["pos"] == 2


def test_recrawl_due_reasons(spark):
    from crawler_spark.operators.web import recrawl_due_from_sitemap

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    entries = spark.createDataFrame(
        [("u/new", "2024-03-01"),       # not in store -> never_fetched
         ("u/hot", "2024-03-01"),       # modified after fetch -> due
         ("u/cold", "2024-01-01"),      # fetched after lastmod -> not due
         ("u/bare", "")],               # no lastmod, fetched -> not due
        "url string, lastmod string")
    store = spark.createDataFrame(
        [("u/hot", "2024-02-01"), ("u/cold", "2024-02-01"),
         ("u/bare", "2024-02-01")],
        "url string, fetched_at string")
    out = {r["url"]: r for r in
           recrawl_due_from_sitemap(entries, store).collect()}
    assert out["u/new"]["reason"] == "never_fetched" and out["u/new"]["due"]
    assert out["u/hot"]["reason"] == "modified" and out["u/hot"]["due"]
    assert out["u/cold"]["reason"] is None and not out["u/cold"]["due"]
    assert out["u/bare"]["reason"] is None and not out["u/bare"]["due"]
    assert out["u/bare"]["lastmod_epoch"] is None


def test_rel_next_extraction_both_attr_orders(spark):
    from crawler_spark.operators.web import extract_rel_next

    pages = spark.createDataFrame(
        [("p1", '<link rel="next" href="p2">'),
         ("p2", "<link href='p3' rel='next'>"),
         ("p3", '<link rel="prev" href="p2">')],
        "url string, html string")
    out = {r["url"]: r["next_url"] for r in extract_rel_next(pages).collect()}
    assert out == {"p1": "p2", "p2": "p3", "p3": ""}


def test_pagination_chains_positions_and_heads(spark):
    from crawler_spark.operators.web import pagination_chains

    rel = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a3", ""),      # chain a1->a2->a3
         ("solo", "")],                                # singleton
        "url string, next_url string")
    out = {r["url"]: (r["chain_head"], r["position"])
           for r in pagination_chains(rel).collect()}
    assert out["a1"] == ("a1", 0)
    assert out["a2"] == ("a1", 1)
    assert out["a3"] == ("a1", 2)
    assert out["solo"] == ("solo", 0)


def test_pagination_chains_long_chain_and_tail_only_member(spark):
    from crawler_spark.operators.web import pagination_chains

    # 40-hop chain exercises the doubling rounds; the final target p40
    # never appears as a source row but must still resolve as a member
    rel = spark.createDataFrame(
        [(f"p{i}", f"p{i+1}") for i in range(40)],
        "url string, next_url string")
    out = {r["url"]: (r["chain_head"], r["position"])
           for r in pagination_chains(rel).collect()}
    assert out["p0"] == ("p0", 0)
    assert out["p40"] == ("p0", 40)
    assert len(out) == 41


def test_extract_hreflang_rows(spark):
    from crawler_spark.operators.web import extract_hreflang

    html = ('<head>'
            '<link rel="alternate" hreflang="EN" href="https://e.com/en">'
            '<link hreflang="fr" rel="alternate" href="https://e.com/fr">'
            '<link rel="alternate" type="application/rss+xml" href="/f">'
            '<link rel="canonical" href="https://e.com/en"></head>')
    pages = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = sorted(extract_hreflang(pages).collect(),
                  key=lambda r: r["pos"])
    assert [(r["hreflang"], r["href"]) for r in rows] == [
        ("en", "https://e.com/en"), ("fr", "https://e.com/fr")]


def test_publish_date_meta_wins_over_iso(spark):
    from crawler_spark.operators.web import extract_publish_date

    pages = spark.createDataFrame(
        [(1, '<meta property="article:published_time" '
             'content="2023-06-07T10:00:00Z"> body says 2021-01-01 too'),
         (2, "updated 2021-12-31 and also 2022-01-01"),
         (3, "Published March 5, 2024 by staff"),
         (4, "no date here")],
        "doc_id long, html string")
    out = {r["doc_id"]: (r["pub_date"], r["date_source"])
           for r in extract_publish_date(pages).collect()}
    assert out[1] == ("2023-06-07", "meta")
    assert out[2] == ("2021-12-31", "iso")      # first match wins
    assert out[3] == ("2024-03-05", "textual")
    assert out[4] == ("", "")


def test_publish_date_invalid_iso_rejected(spark):
    from crawler_spark.operators.web import extract_publish_date

    pages = spark.createDataFrame(
        [(1, "v2024-19-99 is a version, not a date; real: 2020-02-29"),
         (2, "content-order meta: <meta content='2019-08-01T00:00:00' "
             "property='article:published_time'>")],
        "doc_id long, html string")
    out = {r["doc_id"]: (r["pub_date"], r["date_source"])
           for r in extract_publish_date(pages).collect()}
    assert out[1] == ("2020-02-29", "iso")
    assert out[2] == ("2019-08-01", "meta")


def test_robots_meta_flags_and_none(spark):
    from crawler_spark.operators.web import robots_meta_directives

    pages = spark.createDataFrame(
        [(1, '<meta name="robots" content="noindex, nofollow">'
             '<a href="x">l</a>'),
         (2, "<meta content='NONE' name='robots'>"),
         (3, '<meta name="robots" content="index, follow">'
             '<a href="a">1</a><a rel="nofollow" href="b">2</a>'
             '<a href="c" rel="ugc nofollow">3</a>'),
         (4, "no meta at all <a href='z'>l</a>")],
        "doc_id long, html string")
    out = {r["doc_id"]: r for r in robots_meta_directives(pages).collect()}
    assert out[1]["noindex"] and out[1]["nofollow"]
    assert out[2]["noindex"] and out[2]["nofollow"]     # none => both
    assert not out[3]["noindex"] and not out[3]["nofollow"]
    assert out[3]["n_links"] == 3 and out[3]["n_nofollow_links"] == 2
    assert not out[4]["noindex"] and out[4]["robots_content"] == ""
    assert out[4]["n_links"] == 1 and out[4]["n_nofollow_links"] == 0


def test_orphan_pages_flags(spark):
    from crawler_spark.operators.web import orphan_pages

    pages = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "url string")
    links = spark.createDataFrame(
        [("x", "b"), ("y", "b"), ("z", "c")], "src string, href string")
    sitemap = spark.createDataFrame([("c",), ("d",)], "url string")
    out = {r["url"]: r for r in
           orphan_pages(pages, links, sitemap).collect()}
    assert out["a"]["orphan"] and out["a"]["n_inlinks"] == 0
    assert not out["b"]["orphan"] and out["b"]["n_inlinks"] == 2
    assert not out["c"]["orphan"] and out["c"]["in_sitemap"]
    assert not out["d"]["orphan"] and out["d"]["in_sitemap"]
    assert len(out) == 4                    # link-only urls not emitted


def test_extract_microdata_meta_and_text_values(spark):
    from crawler_spark.operators.web import extract_microdata

    html = ('<div itemscope itemtype="https://schema.org/Product">'
            '<meta itemprop="sku" content="ABC-123">'
            '<span itemprop="name">Red  Bike</span>'
            '<span class="x" itemprop="price">99</span>'
            '<span>no prop</span></div>')
    pages = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = sorted(extract_microdata(pages).collect(), key=lambda r: r["pos"])
    assert all(r["item_type"] == "https://schema.org/Product" for r in rows)
    assert [(r["prop"], r["value"]) for r in rows] == [
        ("sku", "ABC-123"), ("name", "Red Bike"), ("price", "99")]


def test_extract_microdata_no_items(spark):
    from crawler_spark.operators.web import extract_microdata

    pages = spark.createDataFrame([(1, "<p>plain page</p>")],
                                  "doc_id long, html string")
    assert extract_microdata(pages).count() == 0


def test_declared_language_subtag_and_missing(spark):
    from crawler_spark.operators.web import declared_language

    pages = spark.createDataFrame(
        [(1, '<html lang="EN-us"><body>x</body></html>'),
         (2, "<html lang='de'>y</html>"),
         (3, "<html><body>none</body></html>")],
        "doc_id long, html string")
    out = {r["doc_id"]: r["declared_lang"]
           for r in declared_language(pages).collect()}
    assert out == {1: "en", 2: "de", 3: ""}


def test_parked_page_detection_arms(spark):
    from crawler_spark.operators.web import parked_page_scores

    parked = ('<html><body>This domain is for sale! '
              '<a href="/buy">buy</a></body></html>')
    linkfarm = ("<html><body>"
                + "".join(f'<a href="/l{i}">x</a>' for i in range(12))
                + "</body></html>")
    real = ("<html><body><a href='/a'>link</a>"
            + "genuine prose word " * 40 + "</body></html>")
    pages = spark.createDataFrame(
        [(1, parked), (2, linkfarm), (3, real)], "doc_id long, html string")
    out = {r["doc_id"]: r for r in parked_page_scores(pages).collect()}
    assert out[1]["sale_phrase"] and out[1]["is_parked"]
    assert out[2]["link_heavy"] and out[2]["is_parked"]
    assert not out[3]["is_parked"] and not out[3]["link_heavy"]


def test_bitext_pairs_symmetric_collapse_and_lang_gate(spark):
    # A->B and B->A declarations collapse to ONE pair; same-lang edges
    # dropped; cosine computed from the vectors exactly
    from crawler_spark.operators.web import mine_bitext_pairs

    docs = spark.createDataFrame(
        [(1, "https://ex.org/en/1", "en"),
         (2, "https://ex.org/de/2", "de"),
         (3, "https://ex.org/en/3", "en"),
         (4, "https://ex.org/en/4", "en")],
        "doc_id long, url string, lang string")
    alts = spark.createDataFrame(
        [(1, "https://ex.org/de/2"),   # 1 -> 2 (cross-lingual)
         (2, "https://ex.org/en/1"),   # 2 -> 1 (same pair, reversed)
         (3, "https://ex.org/en/4"),   # 3 -> 4 (same lang: dropped)
         (1, "https://ex.org/zz/9")],  # dangling href: dropped
        "doc_id long, href string")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 1.0]), (3, [0.0, 1.0]), (4, [1.0, 0.0])],
        "doc_id long, embedding array<double>")
    rows = mine_bitext_pairs(docs, alts, emb, min_cosine=0.8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert (r["lang_a"], r["lang_b"]) == ("en", "de")
    assert r["cosine"] == round(1 / 2 ** 0.5, 6)
    assert not r["accepted"]  # 0.7071 < 0.8


def test_bitext_pairs_threshold_accepts(spark):
    from crawler_spark.operators.web import mine_bitext_pairs

    docs = spark.createDataFrame(
        [(1, "u1", "en"), (2, "u2", "fr")],
        "doc_id long, url string, lang string")
    alts = spark.createDataFrame([(1, "u2")], "doc_id long, href string")
    emb = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [1.0, 0.0])],
        "doc_id long, embedding array<double>")
    r = mine_bitext_pairs(docs, alts, emb, min_cosine=0.99).collect()[0]
    assert r["cosine"] == 1.0 and r["accepted"]


def test_bitext_pairs_missing_embedding_stays_auditable(spark):
    # a declared pair whose embedding is missing must remain in the
    # audit set (cosine NULL, accepted False), not silently vanish
    from crawler_spark.operators.web import mine_bitext_pairs

    docs = spark.createDataFrame(
        [(1, "u1", "en"), (2, "u2", "fr")],
        "doc_id long, url string, lang string")
    alts = spark.createDataFrame([(1, "u2")], "doc_id long, href string")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "doc_id long, embedding array<double>")
    rows = mine_bitext_pairs(docs, alts, emb, min_cosine=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cosine"] is None and r["accepted"] is False
