"""Web-scale URL / HTML / sitemap column operators — all native Spark SQL
expressions (JVM-side, whole-stage codegen; zero Python in the hot path).

These extend the crawl tier beyond the reference's single-site assumptions
(the reference hard-codes one host and disables URL normalization,
``CrawlerLib/Downloader.fs:58-64``): a general crawler frontier needs full
URL canonicalization (scheme/host case, default ports, tracking params,
param order), visible-text extraction from fetched HTML, and sitemap
ingestion.  Every operator here is a pure column expression or a narrow
projection — no shuffle, no UDF — so at 100 TB they run entirely inside the
scan stage and cost only CPU already paid for decompression.

Regex note: every pattern used here sticks to the RE2 ∩ Java-regex common
subset (no lookarounds, no backreferences) so the DuckDB oracle twins in
``__spark_entry__.py`` can run the *identical* pattern strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.text import h32

# Tracking parameters dropped during canonicalization.  Kept as a single
# RE2-safe alternation applied to the 'key=value' fragment.
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"


def normalize_url(url: Column) -> Column:
    """Full crawl-frontier URL canonicalization, as one codegen expression.

    Steps (each mirrored verbatim in the DuckDB oracle ``url_normalize``):

    1. trim surrounding whitespace; drop the fragment (``#...``);
    2. lowercase the scheme and the authority (host[:port]);
    3. strip the scheme's default port (``:80`` http, ``:443`` https);
    4. empty path → ``/``; strip one trailing slash on non-root paths;
    5. drop tracking query params (``TRACKING_PARAM_RE``), sort the rest
       bytewise, and re-join — so param order never splits a URL's identity;
    6. reassemble scheme://authority path [?query].

    Percent-encoding is deliberately left untouched — the reference's server
    is case-sensitive about its escapes (``Downloader.fs:58-64``), and at
    web scale decoding is lossy without per-site knowledge.
    """
    u = F.regexp_replace(F.trim(url), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    auth = F.lower(F.regexp_extract(rest, "^([^/?#]*)", 1))
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, 1, F.length(auth) - 3),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, 1, F.length(auth) - 4),
    ).otherwise(auth)
    path = F.regexp_extract(rest, "^[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(rest, "[?]([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qsorted = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qsorted == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted)),
    )


# Second-level public suffixes under which registrations happen one label
# deeper (public-suffix-list-lite: the high-traffic cc-SLDs, frozen so the
# rule is deterministic and mirrorable in the DuckDB oracle).
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar",
)


def registered_domain(host: Column) -> Column:
    """Registrable-domain extraction as one codegen expression — the key
    real crawlers enforce politeness budgets on (per-*registered-domain*,
    not per-host: ``img1.shop.example.co.uk`` and ``www.shop.example.co.uk``
    share one server farm and one webmaster).  The reference pins a single
    host (``CrawlerPet911/Utils.fs:13-14``) so never needs this; at
    10^10-URL frontier scale it is the politeness/budget partition key.

    Rule (public-suffix-lite, deterministic): IPv4 literals and hosts with
    ≤2 labels map to themselves; hosts whose last two labels are a known
    second-level suffix (``SECOND_LEVEL_SUFFIXES``) keep three labels;
    everything else keeps two.  Pure split/slice/when — no UDF, no shuffle;
    grouping on the result is one hash exchange on a low-cardinality key.
    """
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    sld = F.array(*[F.lit(s) for s in SECOND_LEVEL_SUFFIXES])
    return (
        F.when(is_ip | (n <= 2), host)
        .when((n >= 3) & F.array_contains(sld, last2), last3)
        .otherwise(last2)
    )


def html_visible_text(html: Column) -> Column:
    """Visible text of an HTML document as a chain of native regexp_replace.

    The full DOM parse kernel (``crawler_spark/html``) exists for the
    reference's field extraction; *this* is the bulk-corpus path — when all
    you need from 100 TB of fetched pages is the training text, a codegen'd
    regex chain runs at scan speed with zero Python workers.  Order:
    comments → script/style blocks → all tags → entities (``&amp;`` last so
    escaped escapes don't double-decode) → whitespace collapse.
    """
    t = F.regexp_replace(html, "(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, "(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, "(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, "<[^>]*>", " ")
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&#39;", "'"), ("&nbsp;", " "),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.replace(t, F.lit("&amp;"), F.lit("&"))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def extract_sitemap_urls(df: DataFrame, xml_col: str = "sitemap_xml",
                         key_cols: tuple = ("host",)) -> DataFrame:
    """Explode ``<loc>`` entries out of sitemap XML documents.

    One narrow generator per input row (regexp_extract_all → explode) — the
    classic frontier-seeding scan.  Returns key_cols + ``url`` (trimmed loc
    text) + ``pos`` (1-based order within the sitemap, because crawl
    schedulers care about sitemap order).
    """
    locs = F.regexp_extract_all(F.col(xml_col), F.lit("<loc>([^<]*)</loc>"), 1)
    return df.select(
        *[F.col(c) for c in key_cols],
        F.posexplode(locs).alias("pos0", "raw_url"),
    ).select(
        *key_cols,
        (F.col("pos0") + 1).alias("pos"),
        F.trim(F.col("raw_url")).alias("url"),
    )


def host_quality_rollup(docs: DataFrame, quality: Column,
                        source_col: str = "source",
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-host (source) crawl-priority aggregates over a document corpus.

    The frontier-scheduling signal a 100 TB crawl actually uses: for each
    host, document count, mean quality, exact-duplicate ratio (docs whose
    md5(text) appears more than once within the host), and a combined
    priority = mean_quality * (1 - dup_ratio).  One hash-partitioned
    two-level aggregation — no windows, no joins back to the raw table.
    """
    per_text = docs.groupBy(
        F.col(source_col).alias("source"), F.md5(F.col(text_col)).alias("th")
    ).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.sum(quality).alias("q_sum"),
    )
    return (
        per_text.groupBy("source")
        .agg(
            F.sum("n_copies").cast("long").alias("n_docs"),
            (F.sum("q_sum") / F.sum("n_copies")).alias("mean_quality"),
            (
                F.sum(F.when(F.col("n_copies") > 1, F.col("n_copies")).otherwise(0))
                / F.sum("n_copies")
            ).alias("dup_ratio"),
        )
        .withColumn(
            "priority",
            F.round(F.col("mean_quality") * (1 - F.col("dup_ratio")), 9),
        )
        .withColumn("mean_quality", F.round("mean_quality", 9))
        .withColumn("dup_ratio", F.round("dup_ratio", 9))
    )


LINK_RE = '<a href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_links(df: DataFrame, html_col: str = "html",
                  key_cols: tuple = ("url",)) -> DataFrame:
    """(page, href, anchor_text, pos) edges out of raw HTML — the link-graph
    feed for ``graph.pagerank`` / frontier discovery.

    Two passes of the SAME anchored pattern (group 1 = href, group 2 =
    anchor text) zipped positionally — ``regexp_extract_all`` yields one
    group per pass, and two scans of an already-decompressed string column
    are cheaper than any UDF round-trip.  Narrow generator, no shuffle.
    """
    pat = F.lit(LINK_RE)
    hrefs = F.regexp_extract_all(F.col(html_col), pat, 1)
    anchors = F.regexp_extract_all(F.col(html_col), pat, 2)
    return df.select(
        *[F.col(c) for c in key_cols],
        F.posexplode(F.arrays_zip(hrefs.alias("href"), anchors.alias("anchor")))
        .alias("pos0", "z"),
    ).select(
        *key_cols,
        (F.col("pos0") + 1).alias("pos"),
        F.col("z.href").alias("href"),
        F.trim(F.col("z.anchor")).alias("anchor"),
    )


def anchor_text_profile(links: DataFrame, href_col: str = "href",
                        anchor_col: str = "anchor") -> DataFrame:
    """Per-target anchor-text profile over a link-edge table: in-link count,
    distinct anchor count, and the dominant anchor (most frequent; ties
    break to the lexicographically smallest — fully deterministic).

    The classic target-description signal (anchor text describes the TARGET
    better than its own page does).  Two map-side-combined aggregations on
    uniform keys — (href, anchor) then href — plus a broadcast-size join
    back for the dominant anchor; no windows.
    """
    per_anchor = links.groupBy(
        F.col(href_col).alias("href"), F.col(anchor_col).alias("anchor")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    per_href = per_anchor.groupBy("href").agg(
        F.sum("cnt").cast("long").alias("n_links"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_anchors"),
        F.max("cnt").alias("top_cnt"),
    )
    top = (
        per_anchor.join(per_href, "href")
        .where(F.col("cnt") == F.col("top_cnt"))
        .groupBy("href")
        .agg(F.min("anchor").alias("top_anchor"))
    )
    return per_href.join(top, "href").select(
        "href", "n_links", "n_distinct_anchors", "top_anchor"
    )


# Default URL-filter lists (RefinedWeb §3.1 / UT1-style, public-knowledge
# categories only; callers pass their real blocklists).  Kept tiny here —
# the operator broadcasts whatever it is given.
URL_BLOCKLIST_DEFAULT = ("badsite.example", "spam-casino.example",
                         "tracker.example")
URL_BADWORDS_DEFAULT = ("casino", "viagra", "xxx", "porn", "webcam")


def url_quality_flags(df: DataFrame, url_col: str = "url",
                      blocklist: tuple = URL_BLOCKLIST_DEFAULT,
                      badwords: tuple = URL_BADWORDS_DEFAULT,
                      max_len: int = 512, max_params: int = 8,
                      max_digit_frac: float = 0.4) -> DataFrame:
    """RefinedWeb-style URL filtering (Penedo et al. 2023 §3.1): per-URL
    quality flags plus the combined keep verdict, as pure codegen column
    expressions — at 100 TB this is a scan-stage filter that prunes fetches
    *before* any byte is downloaded, the cheapest quality lever a crawl has.

    Flags:

    * ``host_blocked``   — registrable host (or any suffix-matching parent
      domain) is on the blocklist;
    * ``bad_word_in_url``— any fragment-word from ``badwords`` appears in
      the lowercased URL;
    * ``too_long``       — total URL length > ``max_len``;
    * ``too_many_params``— query parameter count > ``max_params``;
    * ``digit_heavy``    — digit fraction of the URL > ``max_digit_frac``
      (session-id / tracking-hash shaped URLs);
    * ``non_http``       — scheme is neither http nor https.

    ``url_keep`` is the conjunction of none-of-the-above.  The blocklist
    and badword alternations compile into single RLIKE literals (RE2 ∩
    Java subset, oracle-portable); a production list with 10^6 entries
    would instead broadcast-anti-join on the registrable domain — same
    semantics, and the host column this emits is the join key for that.

    Returns df + (host, n_params, digit_frac, the 6 flags, url_keep).
    """
    import re as _re

    u = F.col(url_col)
    lu = F.lower(u)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(
        F.regexp_extract(F.regexp_replace(u, _SCHEME_RE, ""), "^([^/?#:]*)", 1)
    )
    block_alt = "|".join(_re.escape(b) for b in blocklist)
    host_blocked = host.rlike(f"(^|\\.)({block_alt})$")
    bad_alt = "|".join(_re.escape(w) for w in badwords)
    bad_word = lu.rlike(f"({bad_alt})")
    query = F.regexp_extract(u, "[?]([^#]*)", 1)
    n_params = F.size(F.filter(F.split(query, "&"), lambda p: p != ""))
    n_digits = F.length(F.regexp_replace(u, "[^0-9]", ""))
    digit_frac = F.round(
        n_digits.cast("double") / F.length(u).cast("double"), 6
    )
    too_long = F.length(u) > max_len
    too_many = n_params > max_params
    digit_heavy = digit_frac > max_digit_frac
    non_http = ~scheme.isin("http", "https")
    return df.select(
        "*",
        host.alias("host"),
        n_params.cast("long").alias("n_params"),
        digit_frac.alias("digit_frac"),
        host_blocked.alias("host_blocked"),
        bad_word.alias("bad_word_in_url"),
        too_long.alias("too_long"),
        too_many.alias("too_many_params"),
        digit_heavy.alias("digit_heavy"),
        non_http.alias("non_http"),
        (
            ~host_blocked & ~bad_word & ~too_long & ~too_many
            & ~digit_heavy & ~non_http
        ).alias("url_keep"),
    )


# Block-level boundary tags for main-content segmentation.  Splitting on
# these leaves inline markup (<a>, <b>, <span>…) inside each block, which
# is exactly what the link-density signal needs.
_BLOCK_TAG_RE = ("(?i)</?(?:p|div|li|ul|ol|h[1-6]|td|tr|table|article|"
                 "section|nav|header|footer|aside|br)[^>]*>")


def main_content_blocks(pages: DataFrame, html_col: str = "html",
                        id_col: str = "doc_id", min_words: int = 5,
                        max_link_density: float = 0.33) -> DataFrame:
    """Boilerpipe-style main-content extraction (Kohlschütter et al., WSDM
    2010: word count + link density are the two dominant features): split
    each page into block-level segments, score every block, keep content
    blocks, and reassemble the page's main text in document order.

    A block survives iff its visible word count ≥ ``min_words`` AND its
    link density (characters inside ``<a>…</a>`` / total visible
    characters) ≤ ``max_link_density`` — navigation, headers, footers and
    related-links rails are short and link-dense, body prose is neither.

    All native expressions: one regex split on block boundary tags →
    ``posexplode`` (a narrow generator), per-block regex text cleanup and
    the two scores in the same projection, one bounded per-document
    reassembly aggregate.  No UDF, no corpus-wide shuffle — the only
    exchange is the final groupBy(doc), keyed on the document id.

    Returns (id_col, n_blocks, n_kept, content_text, n_chars_main).
    """
    script_free = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(html_col), "(?s)<!--.*?-->", " "),
            "(?is)<script[^>]*>.*?</script>", " ",
        ),
        "(?is)<style[^>]*>.*?</style>", " ",
    )
    blocks = pages.select(
        F.col(id_col),
        F.posexplode(F.split(script_free, _BLOCK_TAG_RE, -1)).alias(
            "pos", "raw_block"
        ),
    )
    link_chars = F.aggregate(
        F.regexp_extract_all(
            F.col("raw_block"), F.lit("(?is)<a[^>]*>(.*?)</a>"), 1
        ),
        F.lit(0),
        lambda acc, a: acc
        + F.length(F.trim(F.regexp_replace(a, "<[^>]*>", " "))).cast("int"),
    )
    btext = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("raw_block"), "<[^>]*>", " "), r"\s+", " "
        )
    )
    scored = blocks.select(
        id_col,
        "pos",
        btext.alias("btext"),
        F.when(btext == "", F.lit(0))
        .otherwise(F.size(F.split(btext, r"\s+")))
        .cast("long")
        .alias("n_words"),
        link_chars.cast("long").alias("link_chars"),
    ).select(
        "*",
        F.when(
            F.length("btext") == 0, F.lit(0.0)
        )
        .otherwise(
            F.round(
                F.col("link_chars").cast("double")
                / F.length("btext").cast("double"),
                6,
            )
        )
        .alias("link_density"),
    )
    kept = scored.where(
        (F.col("n_words") >= min_words)
        & (F.col("link_density") <= max_link_density)
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "btext"))),
                lambda s: s["btext"],
            ),
            "\n",
        ).alias("content_text"),
    )
    totals = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks")
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_blocks",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("content_text"), F.lit("")).alias("content_text"),
        F.length(F.coalesce(F.col("content_text"), F.lit(""))).cast("long").alias(
            "n_chars_main"
        ),
    )


def _decode_entities(col: Column) -> Column:
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&#39;", "'"), ("&nbsp;", " "),
    ):
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return F.replace(col, F.lit("&amp;"), F.lit("&"))


def extract_page_metadata(pages: DataFrame, html_col: str = "html",
                          id_col: str = "doc_id") -> DataFrame:
    """Page-level metadata a corpus pipeline indexes before any text work:
    ``<title>``, ``<meta name="description">``, ``og:title``,
    ``<link rel="canonical">`` href, and the first ``<h1>`` — each as one
    ``regexp_extract`` (first match, case-insensitive, lazy), entity-decoded
    and whitespace-collapsed.  Pure codegen: at 100 TB this runs inside the
    scan, no shuffle, and feeds dedup (canonical URL beats string-normalized
    URL when present) and quality scoring (title/h1 presence).

    Attribute matching is order-tolerant for the common ``name=…
    content=…`` / ``content=… name=…`` pair via two alternation arms —
    the RE2 ∩ Java subset has no lookarounds, so the arms are spelled out.

    Returns (id_col, title, meta_description, og_title, canonical_url, h1).
    """
    h = F.col(html_col)

    def first(pattern: str, group: int = 1) -> Column:
        raw = F.regexp_extract(h, pattern, group)
        return F.trim(F.regexp_replace(_decode_entities(raw), r"\s+", " "))

    name_then_content = (
        r'(?is)<meta[^>]*\bname\s*=\s*["\']description["\'][^>]*'
        r'\bcontent\s*=\s*["\']([^"\']*)["\']'
    )
    content_then_name = (
        r'(?is)<meta[^>]*\bcontent\s*=\s*["\']([^"\']*)["\'][^>]*'
        r'\bname\s*=\s*["\']description["\']'
    )
    og_a = (
        r'(?is)<meta[^>]*\bproperty\s*=\s*["\']og:title["\'][^>]*'
        r'\bcontent\s*=\s*["\']([^"\']*)["\']'
    )
    og_b = (
        r'(?is)<meta[^>]*\bcontent\s*=\s*["\']([^"\']*)["\'][^>]*'
        r'\bproperty\s*=\s*["\']og:title["\']'
    )
    canon_a = (
        r'(?is)<link[^>]*\brel\s*=\s*["\']canonical["\'][^>]*'
        r'\bhref\s*=\s*["\']([^"\']*)["\']'
    )
    canon_b = (
        r'(?is)<link[^>]*\bhref\s*=\s*["\']([^"\']*)["\'][^>]*'
        r'\brel\s*=\s*["\']canonical["\']'
    )
    meta_desc = F.when(
        first(name_then_content) != "", first(name_then_content)
    ).otherwise(first(content_then_name))
    og_title = F.when(first(og_a) != "", first(og_a)).otherwise(first(og_b))
    canonical = F.when(first(canon_a) != "", first(canon_a)).otherwise(
        first(canon_b)
    )
    return pages.select(
        F.col(id_col),
        first(r"(?is)<title[^>]*>(.*?)</title>").alias("title"),
        meta_desc.alias("meta_description"),
        og_title.alias("og_title"),
        canonical.alias("canonical_url"),
        first(r"(?is)<h1[^>]*>(.*?)</h1>").alias("h1"),
    )


def expand_sitemap_index(sitemaps: DataFrame, url_col: str = "url",
                         xml_col: str = "sitemap_xml",
                         max_depth: int = 3) -> DataFrame:
    """Resolve nested sitemap *indexes* (``<sitemapindex>`` files whose
    ``<loc>`` entries point at further sitemap files — the layout every
    large site uses, and the one :func:`extract_sitemap_urls` alone can't
    follow) down to the page URLs of the leaf ``<urlset>`` files.

    Per depth round: extract the ``<loc>`` children of the current index
    set, join them back to the sitemap table by URL to fetch their XML,
    and split into further indexes vs leaves — a bounded breadth-first
    join loop (``max_depth`` rounds; real indexes are 2 levels), same
    shape as the BFS link crawl.  Joins key on the sitemap URL (uniform);
    nothing is collected to the driver.

    Returns (root_url, url, depth): every page URL found under each root
    index/sitemap, with the depth it was found at (1 = directly in the
    root).
    """
    is_index = F.col(xml_col).rlike("(?is)<\\s*sitemapindex")
    # depth-0 frontier: every input sitemap is its own root
    frontier = sitemaps.select(
        F.col(url_col).alias("root_url"),
        F.col(url_col).alias("cur_url"),
        F.col(xml_col).alias("cur_xml"),
    )
    lookup = sitemaps.select(
        F.col(url_col).alias("cur_url"), F.col(xml_col).alias("cur_xml")
    )
    out = None
    for depth in range(1, max_depth + 1):
        cur_is_index = F.col("cur_xml").rlike("(?is)<\\s*sitemapindex")
        leaves = frontier.where(~cur_is_index)
        leaf_urls = extract_sitemap_urls(
            leaves.withColumnRenamed("cur_xml", "__xml"),
            xml_col="__xml",
            key_cols=("root_url",),
        ).select("root_url", "url", F.lit(depth).cast("long").alias("depth"))
        out = leaf_urls if out is None else out.unionByName(leaf_urls)
        children = (
            extract_sitemap_urls(
                frontier.where(cur_is_index).withColumnRenamed(
                    "cur_xml", "__xml"
                ),
                xml_col="__xml",
                key_cols=("root_url",),
            )
            .select("root_url", F.col("url").alias("cur_url"))
            .join(lookup, "cur_url")  # unresolvable children drop out
        )
        frontier = children
    return out


def crawl_trap_score(pages: DataFrame, url_col: str = "url",
                     text_col: str = "text", min_urls: int = 20,
                     max_dup_ratio: float = 0.5,
                     max_urls_per_template: float = 50.0) -> DataFrame:
    """Per-host crawl-trap detection — the frontier guard against calendar
    pages, session-id permutations, and faceted-search explosions that
    mint unbounded URL spaces over near-constant content.  (The reference
    crawls one closed id range and cannot be trapped,
    ``CrawlerPet911/Utils.fs:26-33``; an open-web frontier at 10^10 URLs
    dies without this signal.)

    Three relational signals per host, one hash-partitioned aggregation:

    * ``content_dup_ratio`` — 1 − distinct(md5(text)) / n_urls: many URLs,
      few distinct payloads (session ids, print views).
    * ``urls_per_template`` — n_urls / distinct(digit-normalized path):
      path templates like ``/2024/01/15/`` collapse to ``/N/N/N/``, so a
      calendar trap shows thousands of URLs per template.
    * ``mean_params`` — faceted-search traps carry ever-growing query
      strings.

    A host is ``trapped`` only with evidence (``n_urls >= min_urls``) AND
    either dup-ratio or template-fanout past its threshold — matching the
    circuit breaker's evidence-floor shape
    (:func:`crawler_spark.operators.politeness.host_circuit_breaker`).

    All expressions are RE2 ∩ Java-regex safe so the DuckDB oracle runs
    identical patterns.  Scale: one groupBy on host; distinct counts are
    exact here — swap ``approx_count_distinct`` in at 10^10 with the same
    plan shape.

    Returns (host, n_urls, n_distinct_content, n_path_templates,
    content_dup_ratio, urls_per_template, mean_params, trapped).
    """
    u = F.col(url_col)
    host = F.lower(
        F.regexp_extract(F.regexp_replace(u, _SCHEME_RE, ""), "^([^/?#:]*)", 1)
    )
    path = F.regexp_extract(
        F.regexp_replace(u, _SCHEME_RE, ""), "^[^/?#]*([^?#]*)", 1
    )
    template = F.regexp_replace(path, "[0-9]+", "N")
    query = F.regexp_extract(u, "[?]([^#]*)", 1)
    n_params = F.size(F.filter(F.split(query, "&"), lambda p: p != ""))
    per = pages.select(
        host.alias("host"),
        F.md5(F.col(text_col)).alias("__ch"),
        template.alias("__tpl"),
        n_params.cast("double").alias("__np"),
    ).groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("__ch").cast("long").alias("n_distinct_content"),
        F.countDistinct("__tpl").cast("long").alias("n_path_templates"),
        F.round(F.avg("__np"), 6).alias("mean_params"),
    )
    dup = F.round(
        1.0 - F.col("n_distinct_content") / F.col("n_urls").cast("double"), 6
    )
    fanout = F.round(
        F.col("n_urls").cast("double") / F.col("n_path_templates"), 6
    )
    return per.select(
        "host", "n_urls", "n_distinct_content", "n_path_templates",
        dup.alias("content_dup_ratio"),
        fanout.alias("urls_per_template"),
        "mean_params",
        (
            (F.col("n_urls") >= F.lit(int(min_urls)))
            & ((dup >= F.lit(float(max_dup_ratio)))
               | (fanout >= F.lit(float(max_urls_per_template))))
        ).alias("trapped"),
    )


def url_alias_clusters(pages: DataFrame, url_col: str = "url",
                       text_col: str = "text") -> DataFrame:
    """Canonical-URL selection over content-duplicate clusters: every URL
    serving byte-identical content joins one cluster, and the cluster's
    canonical member is its shortest URL (ties: lexicographic) — the
    standard mirror/alias collapse a frontier applies before scheduling
    (print views, session-id variants, www/non-www mirrors).  Differs from
    the WARC layer's ``mark_revisits`` (earliest-by-time, archive-format
    policy): this is the scheduler-side policy — shortest URL is the one
    worth recrawling.

    One groupBy on ``md5(text)`` with a ``min_by`` over a length-prefixed
    sort key (lpad(length,10) || url — lexicographic ≡ (length, url), so
    both engines compare identically), then one equi-join back.  No
    windows; both stages hash-partition on the digest.

    Returns (url, canonical_url, cluster_size, is_canonical).
    """
    u = F.col(url_col)
    digest = F.md5(F.col(text_col))
    key = F.concat(F.lpad(F.length(u).cast("string"), 10, "0"), u)
    clusters = (
        pages.select(digest.alias("__d"), u.alias("url"), key.alias("__k"))
        .groupBy("__d")
        .agg(
            F.min_by("url", "__k").alias("canonical_url"),
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
        )
    )
    return (
        pages.select(digest.alias("__d"), u.alias("url"))
        .join(clusters, "__d")
        .select(
            "url", "canonical_url", "cluster_size",
            (F.col("url") == F.col("canonical_url")).alias("is_canonical"),
        )
    )


TABLE_RE = r"(?si)<table\b[^>]*>(.*?)</table>"
TR_RE = r"(?si)<tr\b[^>]*>(.*?)</tr>"
CELL_RE = r"(?si)<t[dh]\b[^>]*>(.*?)</t[dh]>"


def extract_tables(pages: DataFrame, html_col: str = "html",
                   key_cols: tuple = ("url",)) -> DataFrame:
    """WebTables-style relational harvest of HTML ``<table>`` content —
    (page, table, row, col, cell) tuples ready for schema induction or
    numeric fact mining (Cafarella et al., VLDB'08 scale motivation).

    Three nested ``regexp_extract_all`` + ``posexplode`` layers (table →
    tr → td/th), all codegen — each layer scans only the substring its
    parent captured, so the full page is regex-scanned exactly once.  Cell
    text is tag-stripped and whitespace-collapsed.  Narrow generator per
    layer, no shuffle, no UDF; at 100 TB the pattern cost is one pass over
    the already-in-memory html column per layer.

    Indices are 1-based.  Returns (key_cols..., table_idx, row_idx,
    col_idx, cell).
    """
    tables = pages.select(
        *[F.col(c) for c in key_cols],
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(TABLE_RE), 1)
        ).alias("t0", "tbl"),
    )
    rows = tables.select(
        *key_cols,
        (F.col("t0") + 1).alias("table_idx"),
        F.posexplode(
            F.regexp_extract_all(F.col("tbl"), F.lit(TR_RE), 1)
        ).alias("r0", "row"),
    )
    cells = rows.select(
        *key_cols,
        "table_idx",
        (F.col("r0") + 1).alias("row_idx"),
        F.posexplode(
            F.regexp_extract_all(F.col("row"), F.lit(CELL_RE), 1)
        ).alias("c0", "cell_raw"),
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("cell_raw"), r"(?s)<[^>]*>", " "),
            r"\s+", " ",
        )
    )
    return cells.select(
        *key_cols,
        "table_idx",
        "row_idx",
        (F.col("c0") + 1).alias("col_idx"),
        clean.alias("cell"),
    )


JSONLD_RE = (
    r"(?si)<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>"
    r"(.*?)</script>"
)


def extract_jsonld(pages: DataFrame, html_col: str = "html",
                   key_cols: tuple = ("url",),
                   fields: tuple = ("name", "description")) -> DataFrame:
    """schema.org JSON-LD structured-data harvest — the machine-readable
    twin of the reference's scraped card fields (``ParserPet911.fs``
    extracts title/species/geo from markup; modern classifieds publish the
    same facts as ``application/ld+json`` blocks, and a listings crawler
    should prefer them when present).

    One regex pass captures the script bodies (``posexplode`` per block),
    then native ``get_json_object`` pulls ``@type`` plus the requested
    top-level fields — all JVM-side, no Python JSON parsing.  Malformed
    JSON degrades to nulls, never an error (get_json_object semantics) —
    at web scale a fraction of blocks is always broken and must not kill
    the scan.

    Returns (key_cols..., block_idx, item_type, fields...).
    """
    blocks = pages.select(
        *[F.col(c) for c in key_cols],
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(JSONLD_RE), 1)
        ).alias("b0", "block"),
    )
    return blocks.select(
        *key_cols,
        (F.col("b0") + 1).alias("block_idx"),
        F.get_json_object(F.col("block"), "$['@type']").alias("item_type"),
        *[
            F.get_json_object(F.col("block"), f"$.{f}").alias(f)
            for f in fields
        ],
    )


def http_cache_decision(df: DataFrame, now: str,
                        id_col: str = "url_id",
                        fetched_col: str = "fetched_at",
                        cc_col: str = "cache_control",
                        etag_col: str = "etag",
                        lm_col: str = "last_modified") -> DataFrame:
    """RFC 9111-lite revisit decisions — the conditional-request economizer
    a recrawl scheduler runs before spending fetch budget (the reference
    refetches unconditionally; its cache re-validation C4 only compares
    *stored* bytes).  For each cached page decide:

    * ``refetch``          — ``no-store``, or stale with no validator;
    * ``revalidate_etag``  — stale/``no-cache`` with an ETag (If-None-Match);
    * ``revalidate_lm``    — stale/``no-cache`` with only Last-Modified
      (If-Modified-Since);
    * ``fresh``            — within ``max-age`` (no request at all).

    Priority: no-store > no-cache > max-age freshness > validators.  Pure
    when/regexp codegen over the header columns; ``now`` is pinned by the
    caller so decisions are deterministic/replayable (and a whole recrawl
    wave shares one decision timestamp).  Returns (id_col, age_sec,
    max_age, action).
    """
    age = (
        F.unix_timestamp(F.lit(now).cast("timestamp"))
        - F.unix_timestamp(F.col(fetched_col))
    ).cast("long")
    max_age_s = F.regexp_extract(F.coalesce(F.col(cc_col), F.lit("")),
                                 r"max-age=([0-9]+)", 1)
    max_age = F.when(max_age_s != "", max_age_s.cast("long"))
    has_etag = F.col(etag_col).isNotNull()
    has_lm = F.col(lm_col).isNotNull()
    reval = (
        F.when(has_etag, F.lit("revalidate_etag"))
        .when(has_lm, F.lit("revalidate_lm"))
        .otherwise(F.lit("refetch"))
    )
    cc = F.coalesce(F.col(cc_col), F.lit(""))
    action = (
        F.when(cc.contains("no-store"), F.lit("refetch"))
        .when(cc.contains("no-cache"), reval)
        .when(max_age.isNotNull() & (age < max_age), F.lit("fresh"))
        .otherwise(reval)
    )
    return df.select(
        F.col(id_col),
        age.alias("age_sec"),
        max_age.alias("max_age"),
        action.alias("action"),
    )


def mine_url_templates(df: DataFrame, url_col: str = "url",
                       min_urls: int = 2) -> DataFrame:
    """Mine URL path *templates* per host (crawler duplicate-surface map).

    Collapses long hex runs (>=16 chars — session ids, content hashes) to
    ``{hex}`` and digit runs to ``{n}`` in the URL path, then rolls up by
    (host, template).  This is the classic frontier-shaping signal a
    general crawler needs that the reference sidesteps by hard-coding one
    URL scheme (``CrawlerPet911/Utils.fs:20-23`` builds
    ``pet911.ru/card/{id}`` directly): templates with huge ``n_urls`` and
    near-zero distinct content are calendar/session traps to down-weight;
    templates like ``/pet/{n}`` are the listing surfaces to prioritize.

    Pure codegen (two regexp_replace + one hash-partitioned groupBy); at
    100 TB the rollup output is tiny (hosts × templates), so the shuffle
    moves only partial counts (map-side combine).

    Returns (host, template, n_urls, n_distinct_urls, sample_url),
    filtered to templates with >= ``min_urls`` urls; ``sample_url`` is the
    lexicographic min for determinism.
    """
    host = F.regexp_extract(F.col(url_col), _SCHEME_RE + "([^/?#]*)", 2)
    raw_path = F.regexp_extract(F.col(url_col), _SCHEME_RE + r"[^/?#]*([^?#]*)", 2)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    template = F.regexp_replace(
        F.regexp_replace(path, "[0-9a-f]{16,}", "{hex}"),
        "[0-9]+", "{n}",
    )
    return (
        df.select(
            host.alias("host"),
            template.alias("template"),
            F.col(url_col).alias("u"),
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("u").cast("long").alias("n_distinct_urls"),
            F.min("u").alias("sample_url"),
        )
        .where(F.col("n_urls") >= min_urls)
    )


def detect_charset(pages: DataFrame, html_col: str = "html",
                   url_col: str = "url", sniff_bytes: int = 2048) -> DataFrame:
    """Declared-charset sniff from the HTML head (Common-Crawl on-ramp).

    Mirrors the WHATWG prescan: look at the first ``sniff_bytes`` of the
    (lowercased) document for a ``charset=`` declaration — covers both
    ``<meta charset="x">`` and ``<meta http-equiv="content-type"
    content="text/html; charset=x">`` — and fall back to utf-8.  The
    reference decodes everything as UTF-8 unconditionally
    (``CrawlerLib/Downloader.fs:33`` ``Text.Encoding.UTF8.GetString``);
    at web scale ~15%% of pages declare something else, and mis-decoded
    text poisons dedup/LM scoring downstream, so the declared charset is a
    first-class column.

    Pure scan-stage codegen: one substring + one regexp per row, no
    shuffle.  Returns (url_col, charset, declared).
    """
    head = F.lower(F.substring(F.col(html_col).cast("string"), 1, sniff_bytes))
    decl = F.regexp_extract(head, r'charset\s*=\s*["\x27]?([a-z0-9][a-z0-9._-]*)', 1)
    return pages.select(
        F.col(url_col),
        F.when(decl != "", decl).otherwise(F.lit("utf-8")).alias("charset"),
        (decl != "").alias("declared"),
    )


def plan_frontier_shards(frontier: DataFrame, n_shards: int = 8,
                         host_col: str = "host") -> DataFrame:
    """Consistent host→fetcher-shard assignment with a load report.

    The frontier-partitioning contract the north rule asks to be explicit:
    every URL of a host lands on the same shard (politeness state — token
    buckets, robots cache, connection pools — is then shard-local with no
    cross-executor coordination), shards are assigned by the portable
    ``h32(host) % n_shards`` so the plan is stable across runs and
    engines.  The rollup is the pre-flight skew report: ``rel_load`` is
    each shard's URL share relative to perfect balance, so a hot-host
    shard (rel_load >> 1) is visible *before* the fetch wave runs and can
    be salted (``select_wave_salted``) or split.

    One hash-partitioned groupBy over (shard); map-side combine moves only
    partial counts.  Returns (shard, n_hosts, n_urls, rel_load).
    """
    with_shard = frontier.select(
        (h32(F.col(host_col)) % n_shards).alias("shard"),
        F.col(host_col).alias("h"),
    )
    per_shard = with_shard.groupBy("shard").agg(
        F.countDistinct("h").cast("long").alias("n_hosts"),
        F.count(F.lit(1)).cast("long").alias("n_urls"),
    )
    total = frontier.select(F.count(F.lit(1)).cast("double").alias("total_urls"))
    return per_shard.crossJoin(F.broadcast(total)).select(
        "shard",
        "n_hosts",
        "n_urls",
        F.round(F.col("n_urls") * n_shards / F.col("total_urls"), 6).alias("rel_load"),
    )


def discover_feeds(pages: DataFrame, html_col: str = "html",
                   id_cols: tuple = ("doc_id",)) -> DataFrame:
    """RSS/Atom feed autodiscovery over raw HTML — the standard
    ``<link rel="alternate" type="application/rss+xml" …>`` convention a
    crawler uses to find a site's syndication feeds without fetching
    anything extra.

    Pure codegen pipeline: one ``regexp_extract_all`` pulls every
    ``<link …>`` tag out of the page, ``explode`` fans the tags out, and
    three per-tag attribute ``regexp_extract`` s (rel / type / href /
    title) run JVM-side — no Python anywhere, filter-before-explode is
    unnecessary because non-matching tags are dropped by a cheap scalar
    predicate right after the explode (narrow, same stage).

    Returns one row per discovered feed: (*id_cols, feed_url, feed_type,
    feed_title) with ``feed_type ∈ {rss, atom}``.  Scale: per-page work
    is linear in page size, embarrassingly parallel, zero shuffles.
    """
    tags = pages.select(
        *id_cols,
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(r"<link\b[^>]*>"),
                                 0)
        ).alias("tag"),
    )
    rel = F.regexp_extract("tag", r'rel="([^"]*)"', 1)
    typ = F.regexp_extract("tag", r'type="([^"]*)"', 1)
    href = F.regexp_extract("tag", r'href="([^"]*)"', 1)
    title = F.regexp_extract("tag", r'title="([^"]*)"', 1)
    return (
        tags.where(
            (rel == "alternate")
            & typ.rlike(r"^application/(rss|atom)\+xml$")
            & (href != "")
        )
        .select(
            *id_cols,
            href.alias("feed_url"),
            F.when(typ == "application/rss+xml", F.lit("rss"))
            .otherwise(F.lit("atom")).alias("feed_type"),
            title.alias("feed_title"),
        )
    )


def host_dup_rate(docs: DataFrame, text_col: str = "text",
                  host_col: str = "host") -> DataFrame:
    """Per-host duplicate-content rate — the crawl-ops signal that a host
    is serving mirrored/templated/trap content and should lose crawl
    budget (feeds :func:`..operators.politeness.allocate_crawl_budget`
    as a negative weight).

    ``dup_rate = 1 - distinct_texts/pages``: one md5 per page at scan
    stage, then a single two-phase groupBy(host) with an exact
    count_distinct — partial aggregation happens map-side per (host,
    hash), so the shuffle carries at most one row per distinct page per
    host, never the corpus.  No window, no self-join.

    Returns (host, n_pages, n_unique, dup_rate) with dup_rate rounded 6.
    """
    hashed = docs.select(F.col(host_col), F.md5(F.col(text_col)).alias("h"))
    return (
        hashed.groupBy(host_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.count_distinct("h").cast("long").alias("n_unique"),
        )
        .select(
            host_col, "n_pages", "n_unique",
            F.round(
                F.lit(1.0) - F.col("n_unique").cast("double")
                / F.col("n_pages").cast("double"), 6
            ).alias("dup_rate"),
        )
    )


def host_mirror_pairs(docs: DataFrame, text_col: str = "text",
                      host_col: str = "host", min_shared: int = 2,
                      max_hosts_per_hash: int = 32) -> DataFrame:
    """Mirror/CDN detection: pairs of hosts serving many byte-identical
    pages.  A crawler that finds host B mirroring host A stops paying for
    B's fetches — at web scale whole TLD farms are mirrors.

    Shape: (host, content-hash) distinct pairs, self-joined ON THE HASH —
    each bucket is the set of hosts serving one page, so join fan-out is
    quadratic only within a hash bucket, never across the corpus.  The
    ``max_hosts_per_hash`` guard drops hashes served by more hosts than
    any plausible mirror set (boilerplate/error pages — the classic hot
    key) BEFORE the self-join; the drop is observable in the plan as a
    pre-join semi filter, the exact skew treatment
    :func:`..operators.dedup.minhash_lsh_candidates` uses for bands.

    Returns (host_a, host_b, shared_pages) with host_a < host_b and
    shared_pages >= min_shared, ordered for stable output.
    """
    hh = docs.select(
        F.col(host_col).alias("host"), F.md5(F.col(text_col)).alias("h")
    ).distinct()
    small = (
        hh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") <= max_hosts_per_hash)
        .select("h")
    )
    hh = hh.join(small, "h", "left_semi")
    a = hh.select(F.col("h"), F.col("host").alias("host_a"))
    b = hh.select(F.col("h"), F.col("host").alias("host_b"))
    return (
        a.join(b, "h")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_pages"))
        .where(F.col("shared_pages") >= min_shared)
        .orderBy("host_a", "host_b")
    )


def focused_crawl_scores(links: DataFrame, topic_terms: list,
                         href_col: str = "href",
                         anchor_col: str = "anchor",
                         link_id_cols: tuple = ("doc_id", "pos")) -> DataFrame:
    """Focused-crawl frontier scoring (Chakrabarti et al., "Focused
    crawling: a new approach to topic-specific Web resource discovery",
    WWW 1999 — public algorithm): rank UNVISITED urls by how topical
    their incoming anchor text is, so the crawler spends budget where the
    topic lives instead of breadth-first.

    ``score = topic_hits / anchor_terms`` aggregated over every in-link:
    anchors tokenize at scan stage, the broadcast topic set marks hits via
    ``array_contains``-free ``isin`` (a literal IN list — whole-stage
    codegen), and one groupBy(href) folds (hits, terms, in-links).  The
    anchor stream shuffles once on the target url; no window, no join
    against the corpus.

    ``link_id_cols`` names the columns that identify ONE link edge (the
    :func:`extract_links` output carries ``(page id, pos)``) so two
    in-links with identical anchor text still count as two in-links.

    Returns (href, n_inlinks, topic_hits, anchor_terms, score) with score
    rounded 6 (0.0 for targets whose anchors carry no terms).  Links with
    an EMPTY anchor contribute nothing — a target referenced only by
    anchorless links emits no row and keeps the crawler's default
    priority (no topical evidence either way).
    """
    terms = [t.lower() for t in topic_terms]
    toks = F.split(F.trim(F.lower(F.col(anchor_col))), r"\s+")
    exploded = links.select(
        F.col(href_col).alias("href"),
        F.explode(
            F.when(F.trim(F.col(anchor_col)) == "", F.array())
            .otherwise(toks)
        ).alias("tok"),
        F.md5(F.concat_ws(
            "\x01", *[F.col(c).cast("string") for c in link_id_cols]
        )).alias("__link"),
    )
    marked = exploded.withColumn(
        "hit", F.when(F.col("tok").isin(terms), 1).otherwise(0)
    )
    return (
        marked.groupBy("href")
        .agg(
            F.count_distinct("__link").cast("long").alias("n_inlinks"),
            F.sum("hit").cast("long").alias("topic_hits"),
            F.count(F.lit(1)).cast("long").alias("anchor_terms"),
        )
        .select(
            "href", "n_inlinks", "topic_hits", "anchor_terms",
            F.when(
                F.col("anchor_terms") == 0, F.lit(0.0)
            ).otherwise(
                F.round(F.col("topic_hits").cast("double")
                        / F.col("anchor_terms").cast("double"), 6)
            ).alias("score"),
        )
    )


def soft404_scores(pages: DataFrame, html_col: str = "html",
                   thin_chars: int = 120) -> DataFrame:
    """Soft-404 detection: pages served with HTTP 200 whose *content* is
    an error page — the classic crawl-corpus poison (Bar-Yossef et al.,
    WWW 2004, "Sic transit gloria telae" named the problem; production
    crawlers gate every new host on it).  A crawler that can't spot them
    indexes millions of identical "page not found" bodies and wastes
    recrawl budget on URLs that effectively don't exist.

    Heuristic signal set, all computed in ONE codegen'd projection over
    the page scan (no Python, no shuffle, no join):

    - ``phrase_hits``: count of distinct error phrases present in the
      lowercased visible text ("page not found", "404", "does not
      exist", "no longer available", "error occurred");
    - ``title_error``: the <title> itself carries an error phrase — the
      strongest single signal (server templates title their error pages);
    - ``thin``: visible text shorter than ``thin_chars`` — error pages
      are near-empty once boilerplate is stripped.

    Verdict: ``is_soft404 = title_error OR phrase_hits >= 2 OR
    (phrase_hits >= 1 AND thin)`` — one strong signal, or two weak, or a
    weak one on a thin page.  Pure flags, deliberately threshold-simple:
    the intended 100 TB use is as a SCAN-STAGE filter column feeding the
    clean-corpus anti-join, exactly like ``url_quality_flags``.

    Returns all input key columns except the html plus (clean_len,
    phrase_hits, title_error, thin, is_soft404).
    """
    text_lc = F.lower(html_visible_text(F.col(html_col)))
    title_lc = F.lower(
        F.regexp_extract(F.col(html_col), "(?is)<title[^>]*>(.*?)</title>", 1)
    )
    phrases = ("page not found", "404", "does not exist",
               "no longer available", "error occurred")
    hits = None
    for ph in phrases:
        flag = F.when(F.contains(text_lc, F.lit(ph)), 1).otherwise(0)
        hits = flag if hits is None else hits + flag
    title_err = F.lit(False)
    for ph in phrases:
        title_err = title_err | F.contains(title_lc, F.lit(ph))
    clean_len = F.length(F.trim(text_lc))
    thin = clean_len < thin_chars
    keep = [c for c in pages.columns if c != html_col]
    hits_c = hits.cast("int")
    return pages.select(
        *keep,
        clean_len.cast("long").alias("clean_len"),
        hits_c.alias("phrase_hits"),
        title_err.alias("title_error"),
        thin.alias("thin"),
        (title_err | (hits_c >= 2) | ((hits_c >= 1) & thin))
        .alias("is_soft404"),
    )


def sitemap_lastmod_entries(df: DataFrame, xml_col: str = "sitemap_xml",
                            key_cols: tuple = ("host",)) -> DataFrame:
    """Explode sitemap ``<url>`` blocks into (url, lastmod) rows.

    Extends :func:`extract_sitemap_urls` (loc-only) with the
    ``<lastmod>`` freshness field — the signal the sitemaps protocol
    exists to carry: a crawler that ignores it either refetches
    everything (budget burn) or goes stale.  One ``regexp_extract_all``
    of the ``(?s)<url>…</url>`` blocks → explode → two per-block
    ``regexp_extract`` projections, all codegen, zero Python, zero
    shuffle; linear in sitemap bytes.

    Returns key_cols + (pos, url, lastmod) — ``lastmod`` is the raw
    trimmed string ('' when the block has none; schedulers decide the
    parse/fallback policy).
    """
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit("(?s)<url>(.*?)</url>"), 1
    )
    return df.select(
        *[F.col(c) for c in key_cols],
        F.posexplode(blocks).alias("pos0", "block"),
    ).select(
        *key_cols,
        (F.col("pos0") + 1).alias("pos"),
        F.trim(F.regexp_extract("block", "<loc>([^<]*)</loc>", 1))
        .alias("url"),
        F.trim(F.regexp_extract("block", "<lastmod>([^<]*)</lastmod>", 1))
        .alias("lastmod"),
    )


def recrawl_due_from_sitemap(entries: DataFrame, store: DataFrame,
                             url_col: str = "url",
                             lastmod_col: str = "lastmod",
                             fetched_col: str = "fetched_at") -> DataFrame:
    """Sitemap-freshness recrawl planning: join announced ``lastmod``
    against the store's last-fetch time and emit the due list with a
    reason — ``never_fetched`` (no store row) or ``modified``
    (lastmod strictly newer than the fetch).  This is the
    cheap-freshness complement to the change-rate-adaptive
    :func:`crawler_spark.operators.graph.recrawl_schedule`: that one
    infers an interval from observed history, this one trusts the
    publisher's declaration when there is one.

    Epoch-integer comparison (``unix_timestamp`` on date strings —
    caller pins the session to UTC) so the DuckDB twin is bit-exact; an
    unparseable/empty lastmod yields NULL epoch and the conservative
    verdict ``due = false`` for fetched pages (a missing declaration is
    not evidence of change — the adaptive scheduler owns those).

    ONE hash join on url (the sitemap side is per-host-bounded; the
    store side is the big table — at 10^10 pages pre-bucket the store
    by url so this join co-locates with every other store join).
    Returns (url, lastmod_epoch, fetched_epoch, reason, due).
    """
    lm = entries.select(
        F.col(url_col).alias("url"),
        F.unix_timestamp(
            F.try_to_timestamp(F.col(lastmod_col), F.lit("yyyy-MM-dd"))
        ).cast("long").alias("lastmod_epoch"),
    )
    st = store.select(
        F.col(url_col).alias("url"),
        F.unix_timestamp(
            F.try_to_timestamp(F.col(fetched_col), F.lit("yyyy-MM-dd"))
        ).cast("long").alias("fetched_epoch"),
    )
    j = lm.join(st, "url", "left")
    reason = (
        F.when(F.col("fetched_epoch").isNull(), F.lit("never_fetched"))
        .when(
            F.col("lastmod_epoch").isNotNull()
            & (F.col("lastmod_epoch") > F.col("fetched_epoch")),
            F.lit("modified"),
        )
    )
    return j.select(
        "url", "lastmod_epoch", "fetched_epoch",
        reason.alias("reason"),
        reason.isNotNull().alias("due"),
    )


def extract_rel_next(pages: DataFrame, html_col: str = "html",
                     url_col: str = "url") -> DataFrame:
    """Per-page ``<link rel="next">`` href (order-tolerant attribute
    arms, same RE2-safe shape as the canonical extractor).  Empty string
    when the page declares none.  Returns (url, next_url)."""
    h = F.col(html_col)
    a = F.regexp_extract(
        h,
        r'(?is)<link[^>]*\brel\s*=\s*["\']next["\'][^>]*'
        r'\bhref\s*=\s*["\']([^"\']*)["\']',
        1,
    )
    b = F.regexp_extract(
        h,
        r'(?is)<link[^>]*\bhref\s*=\s*["\']([^"\']*)["\'][^>]*'
        r'\brel\s*=\s*["\']next["\']',
        1,
    )
    nxt = F.when(a != "", a).otherwise(b)
    return pages.select(F.col(url_col).alias("url"),
                        F.trim(nxt).alias("next_url"))


def pagination_chains(rel_next: DataFrame, url_col: str = "url",
                      next_col: str = "next_url",
                      max_hops: int = 64) -> DataFrame:
    """Stitch ``rel=next`` pagination into (page, chain_head, position)
    — the crawl-side join that turns "50 paginated fragments" into one
    logical document before text assembly, and tells the scheduler that
    fetching page 1 implies 49 more.

    Pointer doubling WITH distance accumulation over the reversed
    edges (each page walks BACK toward the chain head): per round every
    mapping (u → ancestor, d hops) substitutes its ancestor's own
    current mapping and adds the distances, so reachable-prefix length
    doubles per round — ``ceil(log2(max_hops))`` self-join rounds cover
    chains to ``max_hops`` at any scale (6 rounds for 64), per-round
    lineage truncation.  Cycles (a malformed next-loop) exhaust the hop
    budget and keep a deterministic in-cycle ancestor — the trap
    detector's department, documented like :func:`resolve_redirects`.

    Pages that appear only as someone's next target still resolve
    (they're chain members); heads report themselves at position 0.
    Returns (url, chain_head, position).
    """
    e = rel_next.where(
        (F.col(next_col) != "") & F.col(next_col).isNotNull()
        & (F.col(next_col) != F.col(url_col))
    )
    # reversed: walk from a page back to its predecessor
    m = e.select(F.col(next_col).alias("u"), F.col(url_col).alias("v"),
                 F.lit(1).alias("d"))
    nodes = (
        rel_next.select(F.col(url_col).alias("u"))
        .unionByName(e.select(F.col(next_col).alias("u")))
        .distinct()
    )
    rounds = max(1, (max_hops - 1).bit_length())
    for _ in range(rounds):
        nxt = m.select(F.col("u").alias("u2"), F.col("v").alias("v2"),
                       F.col("d").alias("d2"))
        m = (
            m.join(nxt, m["v"] == nxt["u2"], "left")
            .select(
                "u",
                F.coalesce(F.col("v2"), F.col("v")).alias("v"),
                (F.col("d")
                 + F.coalesce(F.col("d2"), F.lit(0))).alias("d"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        nodes.join(m, "u", "left")
        .select(
            F.col("u").alias("url"),
            F.coalesce(F.col("v"), F.col("u")).alias("chain_head"),
            F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("position"),
        )
    )


def extract_hreflang(pages: DataFrame, html_col: str = "html",
                     id_col: str = "doc_id") -> DataFrame:
    """Explode ``<link rel="alternate" hreflang=… href=…>`` tags into
    (id, hreflang, href) rows — the multilingual-cluster signal: a
    pipeline that ignores it dedups translations against each other or
    trains a "multilingual" mix that is one site's translation farm.

    One ``regexp_extract_all`` over the ``<link …>`` tags, explode,
    then per-tag attribute extracts with a rel=alternate guard — all
    codegen, zero shuffles, linear in page bytes (the feed-discovery
    shape).  Tag attribute order is tolerated (hreflang/href extracted
    independently per tag).  Returns (id_col, hreflang, href),
    lowercased language tags, document order preserved via ``pos``.
    """
    tags = F.regexp_extract_all(
        F.col(html_col), F.lit(r"(?i)(<link[^>]*>)"), 1
    )
    ex = pages.select(
        F.col(id_col), F.posexplode(tags).alias("pos0", "tag")
    ).where(
        F.col("tag").rlike(r'(?i)\brel\s*=\s*["\']alternate["\']')
        & F.col("tag").rlike(r"(?i)\bhreflang\s*=")
    )
    return ex.select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        F.lower(
            F.regexp_extract(
                "tag", r'(?i)\bhreflang\s*=\s*["\']([^"\']*)["\']', 1
            )
        ).alias("hreflang"),
        F.regexp_extract(
            "tag", r'(?i)\bhref\s*=\s*["\']([^"\']*)["\']', 1
        ).alias("href"),
    )


_MONTHS = ("january", "february", "march", "april", "may", "june",
           "july", "august", "september", "october", "november",
           "december")

_ISO_DATE_RE = r"\b((?:19|20)\d{2})-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])\b"


def extract_publish_date(pages: DataFrame, html_col: str = "html",
                         id_col: str = "doc_id") -> DataFrame:
    """First-published date of a page, normalized to ``yyyy-MM-dd`` — the
    freshness signal corpus curricula and recrawl schedulers weight by
    (a 2015 tutorial and a 2015 news flash look identical without it).

    Three extraction arms, first hit wins, each ONE codegen
    ``regexp_extract`` over the raw bytes (no DOM, no visible-text
    pass):

    1. ``meta`` — ``<meta property="article:published_time"
       content="ISO…">`` (both attribute orders), first 10 chars;
    2. ``iso`` — first calendar-valid ``yyyy-mm-dd`` literal anywhere
       (month/day ranges enforced IN the pattern, so "2024-19-99" can't
       poison the corpus date histogram);
    3. ``textual`` — first "March 5, 2024"-style date, normalized via a
       month-name array lookup + zero-padded day.

    ``date_source`` records which arm fired ('' = undated).  Returns
    (id_col, pub_date, date_source).
    """
    h = F.col(html_col)
    meta_a = F.regexp_extract(
        h,
        r'(?is)<meta[^>]*\bproperty\s*=\s*["\']article:published_time["\']'
        r'[^>]*\bcontent\s*=\s*["\']([^"\']*)["\']',
        1,
    )
    meta_b = F.regexp_extract(
        h,
        r'(?is)<meta[^>]*\bcontent\s*=\s*["\']([^"\']*)["\'][^>]*'
        r'\bproperty\s*=\s*["\']article:published_time["\']',
        1,
    )
    meta = F.when(meta_a != "", meta_a).otherwise(meta_b)
    meta10 = F.substring(meta, 1, 10)
    iso = F.regexp_extract(h, _ISO_DATE_RE, 0)
    tpat = (r"(?i)\b(" + "|".join(_MONTHS)
            + r")\s+(\d{1,2}),\s*((?:19|20)\d{2})\b")
    t_mon = F.lower(F.regexp_extract(h, tpat, 1))
    t_day = F.regexp_extract(h, tpat, 2)
    t_year = F.regexp_extract(h, tpat, 3)
    mon_num = F.array_position(
        F.array(*[F.lit(m) for m in _MONTHS]), t_mon
    )
    textual = F.concat(
        t_year, F.lit("-"),
        F.lpad(mon_num.cast("string"), 2, "0"), F.lit("-"),
        F.lpad(t_day, 2, "0"),
    )
    pub = (
        F.when(meta10 != "", meta10)
        .when(iso != "", iso)
        .when(t_mon != "", textual)
        .otherwise(F.lit(""))
    )
    src = (
        F.when(meta10 != "", F.lit("meta"))
        .when(iso != "", F.lit("iso"))
        .when(t_mon != "", F.lit("textual"))
        .otherwise(F.lit(""))
    )
    return pages.select(F.col(id_col), pub.alias("pub_date"),
                        src.alias("date_source"))


def robots_meta_directives(pages: DataFrame, html_col: str = "html",
                           id_col: str = "doc_id") -> DataFrame:
    """Page-level robots directives — the in-page half of the politeness
    contract that robots.txt (site-level, `operators/robots.py`) cannot
    carry: ``<meta name="robots" content="noindex, nofollow">`` tells a
    compliant pipeline to keep the page out of the corpus (noindex) and
    to drop its outlinks from the frontier (nofollow); per-link
    ``rel="nofollow"`` does the same for single edges.

    One codegen projection: meta content extracted with order-tolerant
    attribute arms, flags by substring on the lowercased directive list
    (``none`` implies both, per the de-facto standard); link counts via
    two ``regexp_extract_all`` sizes (total ``<a href`` tags vs tags
    carrying nofollow in rel).  No shuffle, no DOM.

    Returns (id_col, robots_content, noindex, nofollow, n_links,
    n_nofollow_links).
    """
    h = F.col(html_col)
    a = F.regexp_extract(
        h,
        r'(?is)<meta[^>]*\bname\s*=\s*["\']robots["\'][^>]*'
        r'\bcontent\s*=\s*["\']([^"\']*)["\']',
        1,
    )
    b = F.regexp_extract(
        h,
        r'(?is)<meta[^>]*\bcontent\s*=\s*["\']([^"\']*)["\'][^>]*'
        r'\bname\s*=\s*["\']robots["\']',
        1,
    )
    content = F.lower(F.trim(F.when(a != "", a).otherwise(b)))
    noindex = F.contains(content, F.lit("noindex")) | F.contains(
        content, F.lit("none")
    )
    nofollow = F.contains(content, F.lit("nofollow")) | F.contains(
        content, F.lit("none")
    )
    n_links = F.size(
        F.regexp_extract_all(h, F.lit(r"(?is)(<a\s[^>]*\bhref\s*=)"), 1)
    )
    n_nf = F.size(
        F.regexp_extract_all(
            h,
            F.lit(r'(?is)(<a\s[^>]*\brel\s*=\s*["\'][^"\']*nofollow'
                  r'[^"\']*["\'][^>]*>)'),
            1,
        )
    )
    return pages.select(
        F.col(id_col),
        content.alias("robots_content"),
        noindex.alias("noindex"),
        nofollow.alias("nofollow"),
        n_links.cast("long").alias("n_links"),
        n_nf.cast("long").alias("n_nofollow_links"),
    )


def orphan_pages(pages: DataFrame, links: DataFrame, sitemap: DataFrame,
                 url_col: str = "url", target_col: str = "href"
                 ) -> DataFrame:
    """Orphan-page report: pages reachable by neither the link graph nor
    the sitemap — the crawl-ops audit that finds content a BFS crawler
    silently never refreshes (reachable only via search/redirects) and
    that a migration left stranded.

    Two broadcast-or-hash anti-join-shaped left joins against the
    DISTINCT in-link target set and the sitemap URL set (both
    pre-deduped, so the join keys are unique — no fan-out), one
    projection: ``orphan = no in-links AND not in sitemap``.  At 10^10
    pages this is the same shape as the seen-filter anti-join the crawl
    job already runs per wave.

    Returns (url, n_inlinks, in_sitemap, orphan).
    """
    tgt = (
        links.select(F.col(target_col).alias("url"))
        .groupBy("url")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inlinks"))
    )
    sm = sitemap.select(F.col(url_col).alias("url")).distinct().withColumn(
        "in_sitemap", F.lit(True)
    )
    return (
        pages.select(F.col(url_col).alias("url"))
        .join(tgt, "url", "left")
        .join(sm, "url", "left")
        .select(
            "url",
            F.coalesce("n_inlinks", F.lit(0)).cast("long")
            .alias("n_inlinks"),
            F.coalesce("in_sitemap", F.lit(False)).alias("in_sitemap"),
            ((F.coalesce("n_inlinks", F.lit(0)) == 0)
             & ~F.coalesce("in_sitemap", F.lit(False))).alias("orphan"),
        )
    )


def extract_microdata(pages: DataFrame, html_col: str = "html",
                      id_col: str = "doc_id") -> DataFrame:
    """HTML-microdata (schema.org ``itemscope``/``itemprop``) harvest —
    the third structured-data syntax next to JSON-LD
    (:func:`extract_jsonld`) and meta tags
    (:func:`extract_page_metadata`); older listing sites publish ONLY
    this one, so a corpus pipeline without it loses their typed facts.

    Flat extraction contract (deliberately — full microdata nesting
    needs a DOM walk; the overwhelming real-world use is one item per
    page with flat props): the page's first ``itemtype`` URL, plus one
    row per ``itemprop`` with its value from, in priority order, the
    ``content`` attribute (meta-style) or the tag's inner text (first
    200 chars, tags stripped).  Two ``regexp_extract_all`` passes
    zipped positionally (the ``extract_links`` shape) — all codegen,
    zero Python, zero shuffles, linear in page bytes.

    Returns (id_col, item_type, pos, prop, value).
    """
    h = F.col(html_col)
    item_type = F.regexp_extract(
        h, r'(?is)\bitemtype\s*=\s*["\']([^"\']*)["\']', 1
    )
    # one pattern, two group pulls, zipped: tags carrying itemprop
    pat = F.lit(
        r'(?is)<(?:meta|[a-z][a-z0-9]*)\b[^>]*\bitemprop\s*=\s*'
        r'["\']([^"\']*)["\'][^>]*?(?:\bcontent\s*=\s*'
        r'["\']([^"\']*)["\'][^>]*)?>([^<]{0,200})'
    )
    props = F.regexp_extract_all(h, pat, 1)
    contents = F.regexp_extract_all(h, pat, 2)
    texts = F.regexp_extract_all(h, pat, 3)
    z = F.arrays_zip(props.alias("prop"), contents.alias("content"),
                     texts.alias("text"))
    ex = pages.select(
        F.col(id_col),
        item_type.alias("item_type"),
        F.posexplode(z).alias("pos0", "z"),
    )
    value = F.when(F.col("z.content") != "", F.col("z.content")).otherwise(
        F.trim(F.regexp_replace(F.col("z.text"), r"\s+", " "))
    )
    return ex.select(
        id_col,
        "item_type",
        (F.col("pos0") + 1).alias("pos"),
        F.col("z.prop").alias("prop"),
        value.alias("value"),
    )


def declared_language(pages: DataFrame, html_col: str = "html",
                      id_col: str = "doc_id") -> DataFrame:
    """Primary subtag of the ``<html lang=…>`` declaration, lowercased
    ('' when undeclared) — one ``regexp_extract``.  Returns
    (id_col, declared_lang)."""
    lang = F.regexp_extract(
        F.col(html_col),
        r'(?is)<html[^>]*\blang\s*=\s*["\']([A-Za-z]{2,3})(?:[-_][^"\']*)?'
        r'["\']',
        1,
    )
    return pages.select(F.col(id_col), F.lower(lang).alias("declared_lang"))


def parked_page_scores(pages: DataFrame, html_col: str = "html",
                       id_col: str = "doc_id",
                       thin_chars: int = 200) -> DataFrame:
    """Parked-domain / ad-farm page detection — the crawl-ops filter for
    the registrar landing pages and link farms that flood any frontier
    fed by expired-domain backlinks: near-zero prose, wall-to-wall
    links, and the telltale sales pitch.

    Signals, one codegen projection (the :func:`soft404_scores` shape):
    ``sale_phrase`` ("domain is for sale" / "buy this domain" / "domain
    parking" / "related searches" in the visible text), ``n_links``
    (anchor-tag count), ``text_chars`` (visible-text length), and
    ``link_heavy`` = more than one link per 40 visible chars with at
    least 5 links.  Verdict: ``is_parked = sale_phrase OR (link_heavy
    AND text_chars < thin_chars)``.

    Returns (id_col, text_chars, n_links, sale_phrase, link_heavy,
    is_parked).
    """
    h = F.col(html_col)
    text_lc = F.lower(html_visible_text(h))
    tc = F.length(text_lc)
    n_links = F.size(
        F.regexp_extract_all(h, F.lit(r"(?is)(<a\s[^>]*\bhref\s*=)"), 1)
    )
    phrases = ("domain is for sale", "buy this domain", "domain parking",
               "related searches")
    sale = F.lit(False)
    for ph in phrases:
        sale = sale | F.contains(text_lc, F.lit(ph))
    link_heavy = (n_links >= 5) & (n_links * 40 > tc)
    return pages.select(
        F.col(id_col),
        tc.cast("long").alias("text_chars"),
        n_links.cast("long").alias("n_links"),
        sale.alias("sale_phrase"),
        link_heavy.alias("link_heavy"),
        (sale | (link_heavy & (tc < thin_chars))).alias("is_parked"),
    )


def mine_bitext_pairs(docs: DataFrame, alternates: DataFrame,
                      embeddings: DataFrame, min_cosine: float = 0.0,
                      id_col: str = "doc_id", url_col: str = "url",
                      lang_col: str = "lang",
                      vec_col: str = "embedding") -> DataFrame:
    """Bitext candidate mining: turn declared translation links into
    scored cross-lingual document pairs — the CCMatrix/ParaCrawl-style
    step that harvests parallel training data from a web crawl (the
    reference crawler is monolingual; a Common-Crawl-scale corpus is
    not).

    Inputs: ``docs`` (id, url, lang), ``alternates`` (id, hreflang,
    href) as produced by :func:`extract_hreflang`, and ``embeddings``
    (id, vec) from any sentence-embedding pass (LASER/LaBSE at
    production scale; any deterministic vector here).

    Plan shape, all codegen / hash joins, no UDF and no cross join:

    1. resolve each alternate's ``href`` against ``docs.url`` (hash
       join on the URL — both sides partition by the join key, nothing
       broadcast-sized is assumed at 100 TB);
    2. keep genuinely cross-lingual edges (``src.lang != dst.lang``),
       canonicalize the unordered pair as (min_id, max_id) — the langs
       swap with the ids, so they ride along and the pair needs NO
       re-join against docs — and ``DISTINCT`` so A→B and B→A
       declarations collapse to one candidate;
    3. score each candidate with embedding cosine (two hash joins on
       the id + one ``zip_with``/``aggregate`` dot product, JVM-side);
       ``accepted = cosine >= min_cosine`` carries the margin decision
       without dropping rows the caller may want to audit.

    Returns (doc_a, doc_b, lang_a, lang_b, cosine, accepted) — doc_a <
    doc_b, cosine rounded to 6 d.p. for cross-engine determinism.
    """
    from crawler_spark.operators.similarity import cosine_expr

    src = docs.select(F.col(id_col).alias("src_id"),
                      F.col(lang_col).alias("src_lang"))
    dst = docs.select(F.col(id_col).alias("dst_id"),
                      F.col(url_col).alias("dst_url"),
                      F.col(lang_col).alias("dst_lang"))
    edges = (
        alternates.select(F.col(id_col).alias("src_id"),
                          F.col("href").alias("dst_url"))
        .join(src, "src_id")
        .join(dst, "dst_url")
        .where(F.col("src_lang") != F.col("dst_lang"))
    )
    fwd = F.col("src_id") <= F.col("dst_id")
    pairs = edges.select(
        F.least("src_id", "dst_id").alias("doc_a"),
        F.greatest("src_id", "dst_id").alias("doc_b"),
        F.when(fwd, F.col("src_lang")).otherwise(F.col("dst_lang"))
        .alias("lang_a"),
        F.when(fwd, F.col("dst_lang")).otherwise(F.col("src_lang"))
        .alias("lang_b"),
    ).distinct()
    ea = embeddings.select(F.col(id_col).alias("doc_a"),
                           F.col(vec_col).alias("va"))
    eb = embeddings.select(F.col(id_col).alias("doc_b"),
                           F.col(vec_col).alias("vb"))
    # LEFT joins: a candidate missing an embedding row (normal at
    # production scale — the embedding pass lags the crawl) stays in
    # the audit set with cosine NULL / accepted false instead of
    # silently vanishing
    scored = (
        pairs.join(ea, "doc_a", "left").join(eb, "doc_b", "left")
        .select(
            "doc_a", "doc_b", "lang_a", "lang_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), 6)
            .alias("cosine"),
        )
    )
    return scored.withColumn(
        "accepted",
        F.coalesce(F.col("cosine") >= F.lit(float(min_cosine)),
                   F.lit(False)),
    )
