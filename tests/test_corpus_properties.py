"""Property tests: the distributed corpus/graph operators must agree with
straightforward single-process Python references on arbitrary inputs.
Spark sessions are expensive, so each property draws all its examples
first and runs them through ONE DataFrame evaluation per example batch."""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# small alphabet → high collision rate → frequent lines/edges actually occur
_LINE = st.sampled_from(["alpha", "beta", "gamma", "delta", ""])
_DOC = st.lists(_LINE, min_size=1, max_size=5).map("\n".join)


def _py_remove_frequent_lines(texts: list[str], min_df: int = 2):
    df_count: Counter = Counter()
    for t in texts:
        df_count.update(set(t.split("\n")))
    frequent = {line for line, c in df_count.items() if c >= min_df}
    out = {}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [ln for ln in lines if ln not in frequent]
        out[i] = ("\n".join(kept), len(lines), len(kept))
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_remove_frequent_lines_matches_python_reference(spark, texts):
    from crawler_spark.operators.corpus import remove_frequent_lines

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_kept"])
        for r in remove_frequent_lines(docs).collect()
    }
    assert got == _py_remove_frequent_lines(texts)


def _py_components(pairs: list[tuple[int, int]]):
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    label = {}
    for start in adj:
        if start in label:
            continue
        stack, comp = [start], []
        seen = {start}
        while stack:
            v = stack.pop()
            comp.append(v)
            for u in adj[v]:
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        m = min(comp)
        for v in comp:
            label[v] = m
    return label


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=12,
))
def test_connected_components_matches_python_reference(spark, pairs):
    from crawler_spark.operators.dedup import connected_components

    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["node"]: r["cluster_id"]
           for r in connected_components(df).collect()}
    assert got == _py_components(pairs)


def _py_pack(ids_tokens, target):
    # single-bucket greedy packing reference
    out = {}
    cum = 0
    for i, n in sorted(ids_tokens):
        out[i] = (cum, cum // target)
        cum += n
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=0, max_value=50),
                min_size=1, max_size=12),
       st.integers(min_value=1, max_value=80))
def test_pack_token_shards_matches_python_reference(spark, tok_counts, target):
    from crawler_spark.operators.corpus import pack_token_shards

    docs = spark.createDataFrame(
        list(enumerate(tok_counts)), "doc_id long, n_tokens long"
    )
    got = {r["doc_id"]: (r["start_offset"], r["shard_seq"])
           for r in pack_token_shards(
               docs, target_tokens=target, n_buckets=1).collect()}
    assert got == _py_pack(list(enumerate(tok_counts)), target)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.sampled_from(["a", "b", "c", "dd", "eee"]),
                min_size=1, max_size=10))
def test_unigram_logprob_matches_python_reference(spark, token_lists):
    import math

    from crawler_spark.operators.corpus import unigram_logprob

    texts = [" ".join([t]) for t in token_lists]  # one token per doc
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    counts = Counter(token_lists)
    total = len(token_lists)
    got = {r["doc_id"]: r["nll"] for r in unigram_logprob(docs).collect()}
    want = {i: round(-math.log(counts[t] / total), 6)
            for i, t in enumerate(token_lists)}
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=30, unique=True),
       st.integers(min_value=1, max_value=5_000))
def test_mix_sources_nests_across_budgets(spark, ids, budget):
    """The salted-h32 gate must make a smaller budget's sample a SUBSET of
    a larger budget's sample for the same source (nested samples)."""
    from crawler_spark.operators.corpus import mix_sources

    docs = spark.createDataFrame(
        [(i, "s", "tok tok tok") for i in ids],
        "doc_id long, source string, text string",
    )
    small = {r["doc_id"] for r in
             mix_sources(docs, {"s": 1.0}, token_budget=budget).collect()}
    large = {r["doc_id"] for r in
             mix_sources(docs, {"s": 1.0}, token_budget=budget * 4).collect()}
    assert small <= large


# --------------------------------------------------- url canonicalization

_URL_SCHEME = st.sampled_from(["http", "HTTP", "https", "HtTpS"])
_URL_HOST = st.sampled_from(
    ["Example.COM", "sub.ex.org", "H.io:80", "H.io:443", "h.io:8080"]
)
_URL_PATH = st.sampled_from(["", "/", "/A/b", "/A/b/", "/p%20q", "//x/"])
_URL_PARAM = st.sampled_from(
    ["a=1", "B=2", "utm_source=x", "utm_x=y", "fbclid=f", "ref=r", "z="]
)
_URL_FRAG = st.sampled_from(["", "#f", "#a/b?c=1"])


@st.composite
def _messy_url(draw):
    scheme = draw(_URL_SCHEME)
    host = draw(_URL_HOST)
    path = draw(_URL_PATH)
    params = draw(st.lists(_URL_PARAM, max_size=4))
    frag = draw(_URL_FRAG)
    q = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{path}{q}{frag}"


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_messy_url(), min_size=1, max_size=20))
def test_normalize_url_idempotent_and_invariant(spark, urls):
    """normalize(normalize(u)) == normalize(u), and the canonical form never
    carries a fragment, a tracking param, a default port, or an unsorted
    query — for arbitrary compositions of messy URL parts."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.web import normalize_url

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        "u",
        normalize_url(F.col("u")).alias("c1"),
        normalize_url(normalize_url(F.col("u"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r["c2"] == r["c1"], (r["u"], r["c1"], r["c2"])
        c = r["c1"]
        assert "#" not in c
        assert "utm_" not in c and "fbclid" not in c and "ref=" not in c
        scheme, rest = c.split("://", 1)
        assert scheme == scheme.lower()
        authority = rest.split("/", 1)[0].split("?", 1)[0]
        assert authority == authority.lower()
        if scheme == "http":
            assert not authority.endswith(":80")
        if scheme == "https":
            assert not authority.endswith(":443")
        if "?" in c:
            q = c.split("?", 1)[1]
            parts = q.split("&")
            assert parts == sorted(parts) and all(parts)


# URL strategy: compose scheme/host-case/port/path/params/fragment variants
# that exercise every normalize_url rule, including tracking params and
# param-order permutations.
_URL = st.builds(
    lambda scheme, host, port, path, params, frag: (
        scheme + "://" + host + port + path
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.sampled_from(["Ex.COM", "a.b.Example.org", "x.io"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/", "/A/b", "/A/b/", "/p%2Fq"]),
    st.lists(
        st.sampled_from(["a=1", "b=2", "utm_source=x", "fbclid=y", "z="]),
        max_size=4,
    ),
    st.sampled_from(["", "#frag", "#a#b"]),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_URL, min_size=1, max_size=12))
def test_normalize_url_idempotent(spark, urls):
    """normalize(normalize(u)) == normalize(u) — canonicalization must be
    a projection, or frontier identities churn between waves."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.web import normalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(normalize_url(F.col("url")).alias("n1"))
    twice = once.select(
        F.col("n1"), normalize_url(F.col("n1")).alias("n2")
    ).collect()
    for r in twice:
        assert r["n1"] == r["n2"], (r["n1"], r["n2"])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_URL, min_size=1, max_size=12))
def test_normalize_url_order_and_tracking_invariance(spark, urls):
    """Permuting query params or appending a tracking param never changes
    the canonical identity."""
    import random

    from pyspark.sql import functions as F

    from crawler_spark.operators.web import normalize_url

    rng = random.Random(42)
    variants = []
    for u in urls:
        base, q = (u.split("?", 1) + [""])[:2]
        q = q.split("#", 1)[0]
        frag = u[len(base) + 1 + len(q):] if "?" in u else ""
        params = [p for p in q.split("&") if p]
        rng.shuffle(params)
        params.append("utm_medium=shuffle")
        variants.append(base + "?" + "&".join(params) + frag)
    df = spark.createDataFrame(
        list(zip(urls, variants)), "u string, v string"
    )
    rows = df.select(
        normalize_url(F.col("u")).alias("nu"),
        normalize_url(F.col("v")).alias("nv"),
    ).collect()
    for r in rows:
        assert r["nu"] == r["nv"], (r["nu"], r["nv"])


def test_registered_domain_subdomain_invariance(spark):
    """Prepending labels never changes the registered domain (for non-IP,
    ≥2-label hosts)."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.web import registered_domain

    hosts = ["example.com", "example.co.uk", "site.net", "x.com.au"]
    rows = [(h, "www." + h, "a.b." + h) for h in hosts]
    df = spark.createDataFrame(rows, "h string, w string, ab string")
    out = df.select(
        registered_domain(F.col("h")).alias("d0"),
        registered_domain(F.col("w")).alias("d1"),
        registered_domain(F.col("ab")).alias("d2"),
    ).collect()
    for r in out:
        assert r["d0"] == r["d1"] == r["d2"], r


# ---------------------------------------------------------------------------
# BPE: every training strategy must produce the identical merge table
# ---------------------------------------------------------------------------


def _py_bpe_sequential(word_counts: dict[str, int], merges: int):
    """Pure-python sequential reference: most-frequent adjacent pair
    (count desc, 'a b' text asc), greedy left-to-right non-overlapping
    merge — the contract all engine strategies replay bit-exactly."""
    vocab = {tuple(w): n for w, n in word_counts.items()}
    out = []
    for r in range(1, merges + 1):
        counts: Counter = Counter()
        for syms, n in vocab.items():
            for p in zip(syms, syms[1:]):
                counts[p] += n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        (a, b), c = best
        out.append((r, a, b, c))
        ab = a + b
        new_vocab: dict = {}
        for syms, n in vocab.items():
            acc: list = []
            for s in syms:
                if acc and acc[-1] == a and s == b:
                    acc[-1] = ab
                else:
                    acc.append(s)
            new_vocab[tuple(acc)] = new_vocab.get(tuple(acc), 0) + n
        vocab = new_vocab
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="abc0", min_size=1, max_size=7),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
    ),
    merges=st.integers(min_value=1, max_value=6),
    batch_size=st.sampled_from([1, 2, 4, 8]),
)
def test_bpe_strategies_all_match_sequential_reference(
    spark, words, merges, batch_size
):
    from crawler_spark.operators.corpus import bpe_train

    wc: dict[str, int] = {}
    for w, n in words:
        wc[w] = wc.get(w, 0) + n
    text = " ".join(w for w, n in wc.items() for _ in range(n))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    expect = _py_bpe_sequential(wc, merges)

    rel = bpe_train(docs, merges=merges, strategy="relational",
                    batch_size=batch_size).collect()
    assert [tuple(r) for r in rel] == expect

    loc = bpe_train(docs, merges=merges, strategy="local").collect()
    assert [tuple(r) for r in loc] == expect


_WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps",
                         "zeta", "eta", "theta"])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_WORD, min_size=1, max_size=120),
       st.sampled_from([(8, 4), (16, 8), (10, 10), (5, 2)]))
def test_chunk_passages_coverage_and_alignment_property(spark, words, wp):
    from crawler_spark.operators.corpus import chunk_passages

    window, stride = wp
    n = len(words)
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    rows = sorted(chunk_passages(docs, window=window, stride=stride)
                  .collect(), key=lambda r: r["chunk_id"])
    # chunk-count formula
    import math
    expect = 1 if n <= window else math.ceil((n - window) / stride) + 1
    assert len(rows) == expect
    # full coverage, no over-run, exact windows on long docs
    covered = set()
    for r in rows:
        assert r["start_tok"] + r["n_tok"] <= n
        if n >= window:
            assert r["n_tok"] == window
        assert r["passage"].split(" ") == \
            words[r["start_tok"]:r["start_tok"] + r["n_tok"]]
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
    assert covered == set(range(n))
    # last chunk right-aligned
    assert rows[-1]["start_tok"] + rows[-1]["n_tok"] == n


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(min_value=2, max_value=6),
       st.integers(min_value=1, max_value=3),
       st.integers(min_value=2, max_value=5))
def test_trim_repeated_ngrams_periodic_collapse_property(
        spark, phrase_len_sel, period, reps):
    from crawler_spark.operators.corpus import trim_repeated_ngrams

    # phrase of `period` distinct words repeated `reps` times collapses
    # to one copy; a unique-token prefix/suffix survives untouched
    phrase = [f"p{i}" for i in range(period)]
    words = ["pre0", "pre1"] + phrase * reps + ["suf0"]
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    row = trim_repeated_ngrams(docs, max_n=3).collect()[0]
    assert row["clean_text"] == " ".join(["pre0", "pre1"] + phrase + ["suf0"])
    assert row["n_removed"] == period * (reps - 1)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=25, max_size=90, unique=True),
       st.integers(min_value=0, max_value=2**31))
def test_span_corruption_reconstruction_property(spark, nums, doc_id):
    from crawler_spark.operators.corpus import span_corruption

    words = [f"w{v}" for v in nums]       # unique tokens: exact splice-back
    docs = spark.createDataFrame([(doc_id, " ".join(words))],
                                 "doc_id long, text string")
    row = span_corruption(docs).collect()[0]
    assert row["n_spans"] == len(words) // 20
    spans, cur = {}, None
    for tok in (row["target_text"].split(" ") if row["target_text"] else []):
        if tok.startswith("<extra_id_"):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    rebuilt = []
    for tok in row["input_text"].split(" "):
        rebuilt.extend(spans.get(tok, [tok]))
    assert rebuilt == words
