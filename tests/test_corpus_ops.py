"""Tests for corpus-hygiene operators: boilerplate detection/removal,
deterministic hash sampling, PII redaction (operators/corpus.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.corpus import (
    boilerplate_shingle_stats,
    gopher_quality_flags,
    hash_sample,
    pii_match_counts,
    redact_pii,
    remove_frequent_lines,
    substring_dup_spans,
)


@pytest.fixture(scope="module")
def lined_docs(spark):
    header = "site navigation home about contact"
    footer = "copyright two thousand responsive footer"
    rows = [
        (0, f"{header}\nunique story about a lost tabby cat\n{footer}"),
        (1, f"{header}\ndifferent content entirely here\n{footer}"),
        (2, f"{header}\nthird page body text\nthird page extra line\n{footer}"),
        (3, "standalone document with no boilerplate at all"),
        (4, f"{header}\n{footer}"),  # boilerplate-only page
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_frequent_lines_strips_header_footer(lined_docs):
    out = {r["doc_id"]: r for r in remove_frequent_lines(lined_docs).collect()}
    assert out[0]["clean_text"] == "unique story about a lost tabby cat"
    assert out[0]["n_lines"] == 3 and out[0]["n_kept"] == 1
    # multi-line survivor keeps original order
    assert out[2]["clean_text"] == "third page body text\nthird page extra line"
    # untouched document passes through byte-identical
    assert out[3]["clean_text"] == lined_docs.where("doc_id = 3").first()["text"]
    # boilerplate-only page survives as an empty row, not a dropped doc
    assert out[4]["clean_text"] == "" and out[4]["n_kept"] == 0


def test_remove_frequent_lines_in_doc_repeat_counts_once(spark):
    # a line repeated INSIDE one doc is df=1 — must NOT be removed
    docs = spark.createDataFrame(
        [(0, "echo\necho\nbody"), (1, "other text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["clean_text"]
           for r in remove_frequent_lines(docs).collect()}
    assert out[0] == "echo\necho\nbody"


def test_boilerplate_shingle_stats(spark):
    shared = "the quick brown fox jumps high"      # 4 shared 3-shingles
    docs = spark.createDataFrame(
        [(0, shared), (1, shared), (2, "completely unrelated words land here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in boilerplate_shingle_stats(docs).collect()}
    assert out[0]["n_shingles"] == 4 and out[0]["n_boiler"] == 4
    assert out[0]["boiler_frac"] == 1.0
    assert out[2]["n_boiler"] == 0 and out[2]["boiler_frac"] == 0.0


def test_hash_sample_deterministic_and_nested(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s10 = {r["doc_id"] for r in hash_sample(df, "doc_id", 1000).collect()}
    s10_again = {r["doc_id"] for r in hash_sample(df, "doc_id", 1000).collect()}
    assert s10 == s10_again                       # reproducible
    assert 300 <= len(s10) <= 700                 # ~10% of 5000
    s20 = {r["doc_id"] for r in hash_sample(df, "doc_id", 2000).collect()}
    assert s10 <= s20                             # nested: superset at 2x rate
    other = {r["doc_id"] for r in hash_sample(df, "doc_id", 1000, salt="x").collect()}
    assert other != s10                           # salts give independent samples


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame(
        [(0, "mail bob.smith+tag@corp.example.com or call +1 555-0123 99 "
             "from host 192.168.1.44 today"),
         (1, "no pii in this row at all")],
        "doc_id long, text string",
    )
    n_emails, n_phones, n_ips = pii_match_counts(F.col("text"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", redact_pii(F.col("text")).alias("clean"),
        n_emails.alias("e"), n_phones.alias("p"), n_ips.alias("i"),
    ).collect()}
    assert out[0]["clean"] == (
        "mail <EMAIL> or call <PHONE> from host <IP> today"
    )
    assert (out[0]["e"], out[0]["p"], out[0]["i"]) == (1, 1, 1)
    assert out[1]["clean"] == "no pii in this row at all"
    assert (out[1]["e"], out[1]["p"], out[1]["i"]) == (0, 0, 0)


def test_substring_dup_spans_coverage(spark):
    shared = "a b c d e f g h"                    # one shared 8-token window
    docs = spark.createDataFrame(
        [(0, f"{shared} unique tail zero"),       # 11 tokens, dup covers 1-8
         (1, f"prefix one two {shared}"),         # 11 tokens, dup covers 4-11
         (2, "entirely fresh words with no overlap anywhere in them at all"),
         (3, "tiny doc"),                         # exact short dup pair:
         (4, "tiny doc")],                        # whole text = the window
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r
           for r in substring_dup_spans(docs, window_k=8).collect()}
    assert (out[0]["n_tokens"], out[0]["n_dup_tokens"]) == (11, 8)
    assert out[0]["dup_frac"] == round(8 / 11, 6)
    assert (out[1]["n_tokens"], out[1]["n_dup_tokens"]) == (11, 8)
    assert out[2]["n_dup_tokens"] == 0 and out[2]["dup_frac"] == 0.0
    # sub-window_k exact duplicates still register at full coverage
    assert out[3]["dup_frac"] == 1.0 and out[4]["dup_frac"] == 1.0


def test_substring_dup_spans_within_doc_repeat_is_not_dup(spark):
    # the SAME window repeated inside ONE doc is df=1 — not cross-doc dup
    docs = spark.createDataFrame(
        [(0, "x y z w x y z w"), (1, "other words completely")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_dup_tokens"]
           for r in substring_dup_spans(docs, window_k=4).collect()}
    assert out[0] == 0


def test_gopher_quality_flags_fields(spark):
    body = " ".join(f"word{i:03d}" for i in range(60))   # 60 words, len 7 each
    docs = spark.createDataFrame(
        [(0, body),
         (1, "one two one two one two"),                 # top2 'one two' 3/5
         (2, "x\nx\ny"),                                 # dup lines 1/3
         (3, "- item\n- second\nplain body line here")], # bullets 2/3
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert out[0]["n_words"] == 60 and out[0]["mean_word_len"] == 7.0
    assert out[0]["dup_line_frac"] == 0.0
    assert out[1]["top2_frac"] == 0.6 and out[1]["mean_word_len"] == 3.0
    assert out[2]["dup_line_frac"] == round(1 / 3, 6)
    assert out[3]["bullet_frac"] == round(2 / 3, 6)
    # the 60-word doc passes every rule except none → keep unless top2 high
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False                       # too short + repetitive


def test_pack_token_shards_greedy_within_bucket(spark):
    from crawler_spark.operators.corpus import pack_token_shards

    # one bucket so packing order is fully deterministic by doc_id
    docs = spark.createDataFrame(
        [(i, 40) for i in range(10)], "doc_id long, n_tokens long"
    )
    out = pack_token_shards(docs, target_tokens=100, n_buckets=1).collect()
    by_id = {r["doc_id"]: r for r in out}
    # starting offsets 0,40,80,... -> shard flips when start crosses 100
    assert [by_id[i]["start_offset"] for i in range(10)] == [
        40 * i for i in range(10)
    ]
    assert [by_id[i]["shard_seq"] for i in range(10)] == [
        (40 * i) // 100 for i in range(10)
    ]
    assert all(r["bucket"] == 0 for r in out)


def test_pack_token_shards_no_global_sort(spark):
    from crawler_spark.operators.corpus import pack_token_shards

    docs = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, n_tokens long"
    )
    plan = pack_token_shards(docs, n_buckets=8)._jdf.queryExecution() \
        .executedPlan().toString()
    # the window must partition by bucket (hashpartitioning), never collapse
    # to a single partition (the scale-killer this op is designed to avoid)
    assert "SinglePartition" not in plan
    assert "hashpartitioning(bucket" in plan


def test_unigram_logprob_scores_rare_docs_higher(spark):
    import math

    from crawler_spark.operators.corpus import unigram_logprob

    docs = spark.createDataFrame(
        [(0, "common common common"), (1, "rare")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    # corpus: common x3, rare x1, total 4
    assert out[0]["n_tokens"] == 3 and out[1]["n_tokens"] == 1
    assert out[0]["nll"] == round(-math.log(3 / 4), 6)
    assert out[1]["nll"] == round(-math.log(1 / 4), 6)
    assert out[1]["nll"] > out[0]["nll"]


def test_ngram_vocab_topk_order_and_ties(spark):
    from crawler_spark.operators.corpus import ngram_vocab_topk

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "z")],  # 1-token doc -> gram "z"
        "doc_id long, text string",
    )
    rows = [(r["gram"], r["c"]) for r in ngram_vocab_topk(docs, n=2, k=4).collect()]
    # "a b" occurs 3x; ties at c=1 break by gram text ascending
    assert rows[0] == ("a b", 3)
    assert rows[1:] == sorted(rows[1:], key=lambda t: t[0])
    assert ("z", 1) in rows or len(rows) == 4


def test_ngram_vocab_topk_uses_take_ordered(spark):
    from crawler_spark.operators.corpus import ngram_vocab_topk

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = ngram_vocab_topk(docs)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_decontaminate_flags_ngram_overlap(spark):
    from crawler_spark.operators.corpus import decontaminate

    leak = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 words
    train = spark.createDataFrame(
        [
            (0, f"prefix words here {leak} suffix tail words"),
            (1, "totally unrelated training document body text"),
            (2, "short doc"),  # < 8 tokens -> collapses to one full-string gram
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"eval question mentions {leak} verbatim")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(train, ev, n=8).collect()}
    assert out == {0: True, 1: False, 2: False}


def test_tfidf_top_terms_ranks_distinctive_words(spark):
    from crawler_spark.operators.corpus import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (0, "shared shared zebra zebra zebra"),
            (1, "shared shared other other"),
            (2, "shared common words"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'shared' appears in all docs (idf=0) so the doc-unique term wins
    assert top[0] == "zebra" and top[1] == "other"
    assert all(r["rank"] == 1 for r in out)


def test_mix_sources_rates_and_determinism(spark):
    from crawler_spark.operators.corpus import mix_sources

    docs = spark.createDataFrame(
        [(i, "srcA" if i < 40 else "srcB", "tok " * 10) for i in range(60)],
        "doc_id long, source string, text string",
    )
    # srcA: 400 tokens total, weight 0.5 of a 200-token budget -> bp 2500
    # srcB: 200 tokens, weight 0.5 -> bp 5000
    out = mix_sources(docs, {"srcA": 0.5, "srcB": 0.5}, token_budget=200)
    rows = out.collect()
    bps = {r["source"]: r["bp"] for r in rows}
    assert bps.get("srcA", 2500) == 2500 and bps.get("srcB", 5000) == 5000
    # deterministic: identical result on re-run
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in out.collect()
    )
    # oversubscribed source caps at 100%
    rich = mix_sources(docs, {"srcA": 1.0, "srcB": 1.0}, token_budget=10_000)
    assert {r["bp"] for r in rich.collect()} == {10000}
    assert rich.count() == 60


def test_mix_sources_unweighted_source_dropped(spark):
    from crawler_spark.operators.corpus import mix_sources

    docs = spark.createDataFrame(
        [(0, "srcA", "a b c"), (1, "srcZ", "d e f")],
        "doc_id long, source string, text string",
    )
    out = mix_sources(docs, {"srcA": 1.0}, token_budget=100).collect()
    assert all(r["source"] == "srcA" for r in out)


# ---------------------------------------------------- ccnet bucketing

def test_ccnet_bucket_tertiles_and_tie_stability(spark):
    from crawler_spark.operators.corpus import ccnet_bucket

    # 9 docs, en: scores 1..9 -> 3/3/3 split; ties (score 5 twice in ru)
    rows = [(i, "en", float(i)) for i in range(1, 10)]
    rows += [(10, "ru", 1.0), (11, "ru", 5.0), (12, "ru", 5.0), (13, "ru", 9.0)]
    scored = spark.createDataFrame(rows, "doc_id long, lang string, nll double")
    out = {r["doc_id"]: r["bucket"] for r in ccnet_bucket(scored).collect()}
    assert [out[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    # ru: n=4, k1=ceil(4/3)=2 -> t1 = 2nd smallest = 5.0; equal scores
    # share a bucket (histogram semantics), so BOTH 5.0 docs are head
    assert out[10] == "head" and out[11] == "head" and out[12] == "head"
    assert out[13] == "tail" or out[13] == "middle"  # t2 = ceil(8/3)=3rd = 5.0 -> 9.0 is tail
    assert out[13] == "tail"


def test_ccnet_bucket_window_runs_on_histogram_not_docs(spark):
    """The only window in the plan must consume the (lang, score) aggregate,
    not raw documents — i.e. a HashAggregate appears below the Window."""
    from crawler_spark.operators.corpus import ccnet_bucket

    scored = spark.createDataFrame(
        [(i, "en", float(i % 4)) for i in range(40)],
        "doc_id long, lang string, nll double",
    )
    plan = ccnet_bucket(scored)._jdf.queryExecution().executedPlan().toString()
    win_pos = plan.index("Window")
    assert "HashAggregate" in plan[win_pos:]  # aggregate feeds the window


# ---------------------------------------------------- normalized dedup

def test_normalized_dedup_collapses_case_and_punct(spark):
    from crawler_spark.operators.corpus import normalized_dedup

    docs = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO WORLD."),
            (4, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in normalized_dedup(docs).collect()}
    assert out[1]["keep_id"] == 1 and out[1]["is_kept"]
    assert out[2]["keep_id"] == 1 and not out[2]["is_kept"]
    assert out[3]["group_size"] == 3
    assert out[4]["is_kept"] and out[4]["group_size"] == 1


# ---------------------------------------------------- inverted index

def test_inverted_index_postings_sorted_and_min_df(spark):
    from crawler_spark.operators.corpus import inverted_index

    docs = spark.createDataFrame(
        [
            (3, "spark shuffle spark"),   # 'spark' counted once per doc
            (1, "spark join"),
            (2, "spark filter join"),
        ],
        "doc_id long, text string",
    )
    rows = {r["token"]: r for r in inverted_index(docs, min_df=2).collect()}
    assert set(rows) == {"spark", "join"}
    assert rows["spark"]["df"] == 3 and rows["spark"]["postings"] == "1,2,3"
    assert rows["join"]["df"] == 2 and rows["join"]["postings"] == "1,2"


# ---------------------------------------------------------------------------
# keep-first line dedup
# ---------------------------------------------------------------------------

def test_dedup_lines_keep_first_semantics(spark):
    from crawler_spark.operators.corpus import dedup_lines_keep_first

    docs = spark.createDataFrame(
        [
            (0, "alpha\nshared line\nbeta"),
            (1, "shared line\ngamma"),          # loses 'shared line' to doc 0
            (2, "shared line"),                  # loses everything
            (3, "delta\ndelta"),                 # in-doc repeat: first pos wins
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines_keep_first(docs).collect()}
    assert out[0]["clean_text"] == "alpha\nshared line\nbeta"
    assert out[1]["clean_text"] == "gamma"
    assert out[2]["clean_text"] == "" and out[2]["n_kept"] == 0
    # first occurrence within a doc wins; the later copy is dropped
    assert out[3]["clean_text"] == "delta"
    assert out[3]["n_lines"] == 2 and out[3]["n_kept"] == 1
    # corpus-wide: every distinct line survives exactly once
    kept_lines = [
        ln
        for r in out.values()
        if r["clean_text"]
        for ln in r["clean_text"].split("\n")
    ]
    assert sorted(kept_lines) == sorted(set(kept_lines))
    assert set(kept_lines) == {"alpha", "shared line", "beta", "gamma", "delta"}


# ---------------------------------------------------------------------------
# bigram LM NLL
# ---------------------------------------------------------------------------

def test_bigram_logprob_values(spark):
    import math

    from crawler_spark.operators.corpus import bigram_logprob

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "x")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs, lam=0.9).collect()}
    # doc 2 has a single token -> no bigram positions -> excluded
    assert 2 not in out
    # corpus: tokens a,b,a,b,a,b,c,x  -> N=8; c(a)=3 c(b)=3 c(c)=1 c(x)=1
    # bigram instances: (a,b)x3, (b,a)x1, (b,c)x1
    # left-context counts over instances: c1(a)=3, c1(b)=2
    def p(c12, c1, c2, n=8, lam=0.9, d=0.75):
        return lam * max(c12 - d, 0.0) / c1 + (1 - lam) * c2 / n

    exp0 = -(2 * math.log(p(3, 3, 3)) + math.log(p(1, 2, 3))) / 3
    assert out[0]["n_bigrams"] == 3
    assert abs(out[0]["nll"] - round(exp0, 6)) < 1e-9
    exp1 = -(math.log(p(3, 3, 3)) + math.log(p(1, 2, 1))) / 2
    assert out[1]["n_bigrams"] == 2
    assert abs(out[1]["nll"] - round(exp1, 6)) < 1e-9


def test_bigram_logprob_ranks_typical_text_lower(spark):
    from crawler_spark.operators.corpus import bigram_logprob

    rows = [(i, "the cat sat on the mat") for i in range(8)]
    rows.append((99, "zq xv qj zz kk"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["nll"] for r in bigram_logprob(docs).collect()}
    assert out[0] < out[99]  # repeated common text scores as more probable


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

def test_dsir_importance_directionality(spark):
    from crawler_spark.operators.corpus import dsir_importance, dsir_topk

    raw = spark.createDataFrame(
        [
            (0, "science method experiment result analysis"),
            (1, "science theory experiment evidence data"),
            (2, "buy cheap pills online casino bonus"),
            (3, "click here free offer deal now"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [
            (100, "science experiment analysis evidence theory"),
            (101, "method result data experiment science"),
        ],
        "doc_id long, text string",
    )
    w = dsir_importance(raw, target, n_buckets=256)
    out = {r["doc_id"]: r for r in w.collect()}
    assert set(out) == {0, 1, 2, 3}
    # target-like docs outweigh spam under the target model
    assert min(out[0]["logw"], out[1]["logw"]) > max(
        out[2]["logw"], out[3]["logw"]
    )
    # n_feats = unigrams + bigrams = n + (n-1) for n>=2
    assert out[0]["n_feats"] == 5 + 4
    top = dsir_topk(w, 2).collect()
    assert {r["doc_id"] for r in top} == {0, 1}


def test_dsir_importance_single_token_doc(spark):
    from crawler_spark.operators.corpus import dsir_importance

    raw = spark.createDataFrame(
        [(0, "word"), (1, "two words")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "word")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in dsir_importance(raw, target).collect()}
    # 1-token doc: the bigram transform degrades to the full token string
    # (greatest(n-1,1) start sequence) -> 1 unigram + 1 "bigram" feature
    assert out[0]["n_feats"] == 2
    assert out[1]["n_feats"] == 3


# ---------------------------------------------------------------------------
# LR quality classifier (relational training)
# ---------------------------------------------------------------------------

def test_lr_quality_classifier_learns_the_gate(spark):
    from crawler_spark.functions.text import quality_score
    from crawler_spark.operators.corpus import (
        lr_quality_scores,
        train_lr_quality,
    )

    good = ("the quick brown fox jumps over the lazy dog and runs on "
            "through the field of green grass to find a warm home") * 2
    junk = "@@## $$%% !!?? ;;:: ^^&&"
    docs = spark.createDataFrame(
        [(i, good + f" tail{i}") for i in range(20)]
        + [(100 + i, junk + f" x{i}") for i in range(20)],
        "doc_id long, text string",
    )
    w = train_lr_quality(docs)
    assert len(w) == 4
    scored = lr_quality_scores(docs, w)
    labels = docs.select(
        "doc_id",
        (quality_score(F.col("text")) >= 0.65).alias("y"),
    )
    joined = scored.join(labels, "doc_id").collect()
    acc = sum(r["lr_keep"] == r["y"] for r in joined) / len(joined)
    assert acc >= 0.9
    # the two classes actually separate in p_keep
    p_good = [r["p_keep"] for r in joined if r["doc_id"] < 100]
    p_junk = [r["p_keep"] for r in joined if r["doc_id"] >= 100]
    assert min(p_good) > max(p_junk)


def test_lr_training_is_deterministic(spark):
    from crawler_spark.operators.corpus import train_lr_quality

    docs = spark.createDataFrame(
        [(i, f"some words the and of text number {i} run") for i in range(30)],
        "doc_id long, text string",
    )
    w1 = train_lr_quality(docs, iters=3)
    w2 = train_lr_quality(docs.repartition(7), iters=3)
    assert w1 == w2  # 12-d.p. gradient quantization kills partition order


def test_decontaminate_bloom_equals_exact(spark):
    from crawler_spark.operators.corpus import decontaminate, decontaminate_bloom

    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(0, f"prefix words {eval_text} suffix words here"),   # contaminated
         (1, "totally unrelated text with no overlap at all whatsoever"),
         (2, eval_text),                                       # exact overlap
         (3, "short doc")],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, eval_text)], "doc_id long, text string"
    )
    exact = {r["doc_id"]: r for r in decontaminate(docs, evals).collect()}
    bloom = {r["doc_id"]: r for r in decontaminate_bloom(docs, evals).collect()}
    assert exact.keys() == bloom.keys()
    for k in exact:
        assert (exact[k]["n_grams"], exact[k]["contaminated"]) == (
            bloom[k]["n_grams"], bloom[k]["contaminated"]
        )
    assert bloom[0]["contaminated"] and bloom[2]["contaminated"]
    assert not bloom[1]["contaminated"] and not bloom[3]["contaminated"]


def test_bm25_topk_ranking(spark):
    import math

    from crawler_spark.operators.corpus import bm25_topk

    docs = spark.createDataFrame(
        [(0, "spark spark spark engine"),        # tf=3, short
         (1, "spark engine " + "filler " * 20),  # tf=1, long
         (2, "nothing relevant here at all"),
         (3, "spark")],                          # tf=1, shortest
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["spark"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 2 not in ids                     # no query term -> never returned
    assert ids[0] in (0, 3)                 # high-tf or shortest doc leads
    assert ids.index(1) == len(ids) - 1     # the long tf=1 doc ranks last
    # hand-check doc 3: dl=1, tf=1, df=3, N=4, avgdl=32/4=8
    idf = math.log(1 + (4 - 3 + 0.5) / (3 + 0.5))
    s3 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 1 / 8.0))
    got3 = [r["score"] for r in out if r["doc_id"] == 3][0]
    assert abs(got3 - round(s3, 6)) < 1e-9
    # top-k boundary honors (score desc, id asc)
    top2 = [r["doc_id"] for r in bm25_topk(docs, ["spark"], k=2).collect()]
    assert top2 == ids[:2]


def test_length_profile_percentiles(spark):
    from crawler_spark.operators.corpus import length_profile

    docs = spark.createDataFrame(
        [("s1", v) for v in (10, 20, 30, 40)] + [("s2", 5)],
        "source string, n_chars long",
    )
    out = {r["source"]: r for r in length_profile(docs).collect()}
    # linear interpolation: p50 of [10,20,30,40] = 25.0
    assert out["s1"]["n"] == 4 and out["s1"]["p50"] == 25.0
    assert out["s1"]["p25"] == 17.5 and out["s1"]["p95"] == 38.5
    assert out["s2"]["p25"] == out["s2"]["p95"] == 5.0


def test_bpe_train_classic_corpus(spark):
    from crawler_spark.operators.corpus import bpe_train

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = bpe_train(docs, merges=4).collect()
    got = [(r["merge_round"], r["sym_a"], r["sym_b"], r["pair_count"])
           for r in out]
    # pair counts weight by word frequency: 'e s' and 's t' both 9, tie
    # breaks by pair text -> 'e s' first, then the new 'es' pairs with 't'
    assert got[0] == (1, "e", "s", 9)
    assert got[1] == (2, "es", "t", 9)
    # after 'est', 'w e' survives only in lower (2) — newest is now
    # 'n e w est' — so 'l o' (low 5 + lower 2 = 7) wins round 3, and the
    # new 'lo' pairs with 'w' for round 4
    assert got[2] == (3, "l", "o", 7)
    assert got[3] == (4, "lo", "w", 7)
    assert len(got) == 4


def test_bpe_train_deterministic_under_repartition(spark):
    from crawler_spark.operators.corpus import bpe_train

    docs = spark.createDataFrame(
        [(i, "banana bandana ban an a na") for i in range(6)],
        "doc_id long, text string",
    )
    a = bpe_train(docs, merges=3).collect()
    b = bpe_train(docs.repartition(5), merges=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bpe_encode_classic_corpus(spark):
    from crawler_spark.operators.corpus import bpe_encode, bpe_train

    train_text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    train = spark.createDataFrame([(0, train_text)], "doc_id long, text string")
    rules = [
        (r["sym_a"], r["sym_b"]) for r in bpe_train(train, merges=4).collect()
    ]
    # merges: (e,s) (es,t) (l,o) (lo,w) — low→1 tok, lower→low e r = 3,
    # newest→n e w est = 4
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "low low")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bpe_encode(docs, rules).collect()}
    assert out[1]["n_words"] == 3 and out[1]["n_tokens"] == 1 + 3 + 4
    # compression: 14 word chars / 8 tokens
    assert out[1]["compression"] == 1.75
    assert out[2]["n_tokens"] == 2 and out[2]["compression"] == 3.0


def test_bpe_encode_untrained_word_falls_back_to_chars(spark):
    from crawler_spark.operators.corpus import bpe_encode

    docs = spark.createDataFrame(
        [(1, "a-b! see")], "doc_id long, text string"
    )
    # no rules: trained-alphabet words split to chars, others to chars via
    # the fallback — 'a-b!' is 4 chars, 'see' is 3 single-char symbols
    out = bpe_encode(docs, []).collect()[0]
    assert out["n_words"] == 2 and out["n_tokens"] == 7
    assert out["compression"] == 1.0


def test_bpe_merge_fold_handles_runs(spark):
    # 'a a a a' with best pair 'a a' must merge greedily LTR -> 'aa aa',
    # never the overlapping 'a aa a'
    from crawler_spark.operators.corpus import bpe_train

    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aa")], "doc_id long, text string"
    )
    out = bpe_train(docs, merges=2).collect()
    assert (out[0]["sym_a"], out[0]["sym_b"]) == ("a", "a")
    # round 2: sequences are now 'aa aa' (x2 words) and 'aa' -> best 'aa aa'
    assert (out[1]["sym_a"], out[1]["sym_b"]) == ("aa", "aa")


def test_phrase_search_positions_and_counts(spark):
    from crawler_spark.operators.corpus import phrase_search

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta alpha beta gamma"),  # 2 matches
            (1, "beta gamma alpha"),                         # wrong order
            (2, "ALPHA  Beta   GAMMA tail"),                 # case/ws robust
            (3, "alpha beta"),                               # incomplete
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r
           for r in phrase_search(docs, ["alpha", "beta", "gamma"]).collect()}
    assert set(out) == {0, 2}
    assert out[0]["n_matches"] == 2 and out[0]["first_pos"] == 1
    assert out[2]["n_matches"] == 1 and out[2]["first_pos"] == 1


def test_phrase_search_repeated_term(spark):
    from crawler_spark.operators.corpus import phrase_search

    docs = spark.createDataFrame(
        [(0, "the the end"), (1, "the end the")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, ["the", "the"]).collect()}
    assert out == {0: 1}


def test_script_fractions_mixed_scripts(spark):
    from pyspark.sql import functions as F

    from crawler_spark.functions.text import script_fractions

    docs = spark.createDataFrame(
        [(0, "abc где 汉字 12 !"), (1, "only latin words")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r
           for r in docs.select("doc_id",
                                *script_fractions(F.col("text"))).collect()}
    r0 = out[0]
    assert r0["n_chars"] == 15
    assert r0["latin_frac"] == round(3 / 15, 6)
    assert r0["cyrillic_frac"] == round(3 / 15, 6)
    assert r0["cjk_frac"] == round(2 / 15, 6)
    assert r0["digit_frac"] == round(2 / 15, 6)
    assert r0["space_frac"] == round(4 / 15, 6)
    assert r0["other_frac"] == round(1 / 15, 6)      # the '!'
    assert out[1]["other_frac"] == 0.0


def test_clean_corpus_funnel_monotone_and_consistent(spark):
    from crawler_spark.operators.corpus import clean_corpus, clean_corpus_funnel

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog near town"),
            (1, "the quick brown fox jumps over the lazy dog near town"),
            (2, "a completely different sentence about spark shuffles here"),
            (3, "x"),                                   # fails quality gate
        ],
        "doc_id long, text string",
    )
    funnel = {r["stage"]: r["n_docs"]
              for r in clean_corpus_funnel(docs, quality_min=0.3).collect()}
    assert funnel["input"] == 4
    # monotone non-increasing through the stages
    order = ["input", "gated", "line_cleaned", "exact_deduped",
             "near_deduped"]
    vals = [funnel[s] for s in order]
    assert vals == sorted(vals, reverse=True)
    # final stage count equals what clean_corpus actually emits
    assert funnel["near_deduped"] == clean_corpus(
        docs, quality_min=0.3
    ).count()
    assert funnel["exact_deduped"] < funnel["gated"]    # the dup collapsed


def test_char_entropy_golden_values(spark):
    import math

    from crawler_spark.operators.corpus import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "aaaa"),              # one symbol -> 0 bits
            (2, "abab"),              # two equiprobable -> 1 bit
            (3, "abcd"),              # four equiprobable -> 2 bits
            (4, ""),                  # empty -> 0, no div-by-zero
            (5, "AAaa!!"),            # case-folded, '!' outside alphabet
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert out[1]["entropy_bits"] == 0.0 and out[1]["alpha_chars"] == 4
    assert abs(out[2]["entropy_bits"] - 1.0) < 1e-9
    assert abs(out[3]["entropy_bits"] - 2.0) < 1e-9
    assert out[4]["alpha_chars"] == 0 and out[4]["entropy_bits"] == 0.0
    # 'AAaa!!' -> 4 'a' counted, '!' ignored
    assert out[5]["alpha_chars"] == 4 and out[5]["entropy_bits"] == 0.0
    # prose sits strictly between the degenerate extremes
    prose = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    e = char_entropy(prose).collect()[0]["entropy_bits"]
    assert 2.0 < e < math.log2(27) + 1e-9


def test_char_entropy_is_scan_stage_codegen(spark):
    from crawler_spark.operators.corpus import char_entropy

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = char_entropy(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shard_skew_stats_balance_report(spark):
    from crawler_spark.operators.corpus import (
        pack_token_shards,
        shard_skew_stats,
    )

    docs = spark.createDataFrame(
        [(i, 100) for i in range(64)], "doc_id long, n_tokens long"
    )
    assignment = pack_token_shards(docs, target_tokens=400, n_buckets=4)
    out = shard_skew_stats(assignment, docs).collect()
    assert sum(r["n_docs"] for r in out) == 64
    assert sum(r["shard_tokens"] for r in out) == 6400
    # uniform docs: every full shard holds exactly target_tokens
    full = [r for r in out if r["shard_tokens"] == 400]
    assert len(full) >= len(out) - 4  # at most one ragged tail per bucket
    # rel_load averages to 1.0 by construction
    mean_rel = sum(r["rel_load"] for r in out) / len(out)
    assert abs(mean_rel - 1.0) < 1e-6


def test_nb_domain_classifier_separates_distinct_vocab(spark):
    from crawler_spark.operators.corpus import nb_domain_classifier

    rows = []
    for i in range(6):
        rows.append((i, "news", "election parliament minister policy vote"))
    for i in range(6, 12):
        rows.append((i, "sport", "goal match striker league football score"))
    # a held-out-style doc whose vocab is mostly sport plus one shared word
    rows.append((12, "news", "match score goal league"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in nb_domain_classifier(docs).collect()}
    assert len(out) == 13  # one row per doc
    for i in range(6):
        assert out[i]["nb_class"] == "news"
    for i in range(6, 12):
        assert out[i]["nb_class"] == "sport"
    # pure-sport vocabulary wins regardless of the (wrong) supervision label
    assert out[12]["nb_class"] == "sport"
    assert all(r["nb_score"] < 0 for r in out.values())  # log-probs


def test_nb_domain_model_join_is_broadcast(spark):
    from crawler_spark.operators.corpus import nb_domain_classifier

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", f"tok{i} common word") for i in range(10)],
        "doc_id long, source string, text string",
    )
    plan = (
        nb_domain_classifier(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # model + class stats ship to tasks
    assert "CartesianProduct" not in plan


def test_weighted_sample_matches_reference_keys(spark):
    import hashlib
    import math

    from crawler_spark.operators.corpus import weighted_sample

    rows = [(i, (i * 37) % 900 + 10) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = weighted_sample(docs, F.col("n_chars"), 25).collect()
    assert len(got) == 25
    assert len({r["doc_id"] for r in got}) == 25  # without replacement

    def es_key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return round(math.log((h + 0.5) / 2**32) / max(float(w), 1.0), 9)

    expect = sorted(
        ((es_key(i, w), i, float(max(w, 1))) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )[:25]
    assert [(r["es_key"], r["doc_id"], r["weight"]) for r in got] == [
        (k, i, w) for k, i, w in expect
    ]


def test_weighted_sample_plan_is_take_ordered(spark):
    from crawler_spark.operators.corpus import weighted_sample

    docs = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "doc_id long, n_chars long"
    )
    plan = (
        weighted_sample(docs, F.col("n_chars"), 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # no global sort


def test_pack_context_windows_exact_span_bookkeeping(spark):
    from crawler_spark.operators.corpus import pack_context_windows

    L = 16
    rows = [(i, 3 + (i * 7) % 40) for i in range(60)] + [(99, 0)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_context_windows(docs, context_len=L, n_buckets=4).collect()
    n_tok = dict(rows)

    # zero-token doc emits nothing
    assert all(r["doc_id"] != 99 for r in out)

    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {i for i, n in rows if n > 0}
    for did, spans in by_doc.items():
        spans.sort(key=lambda r: r["doc_offset"])
        # spans cover the doc exactly, in order, no gaps
        assert spans[0]["doc_offset"] == 0
        assert sum(s["span_len"] for s in spans) == n_tok[did]
        for a, b in zip(spans, spans[1:]):
            assert b["doc_offset"] == a["doc_offset"] + a["span_len"]
            assert b["ctx_id"] == a["ctx_id"] + 1  # consecutive contexts
            assert b["ctx_offset"] == 0  # continuation starts a context
        # every span fits inside its context window
        assert all(s["ctx_offset"] + s["span_len"] <= L for s in spans)

    # every context except each bucket's last is packed exactly full
    fill = {}
    for r in out:
        key = (r["bucket"], r["ctx_id"])
        fill[key] = fill.get(key, 0) + r["span_len"]
    for bucket in {b for b, _ in fill}:
        ctxs = sorted(c for b, c in fill if b == bucket)
        assert ctxs == list(range(len(ctxs)))  # dense ordinals from 0
        for c in ctxs[:-1]:
            assert fill[(bucket, c)] == L


def test_temperature_mixture_weights_flattens_distribution(spark):
    from crawler_spark.operators.corpus import temperature_mixture_weights

    rows = (
        [("big", 800) for _ in range(10)]
        + [("mid", 190) for _ in range(10)]
        + [("tail", 10) for _ in range(10)]
    )
    docs = spark.createDataFrame(rows, "source string, n_tokens long")

    out = {r["source"]: r for r in
           temperature_mixture_weights(docs, alpha=0.5).collect()}
    assert set(out) == {"big", "mid", "tail"}
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5
    assert abs(sum(r["p_raw"] for r in out.values()) - 1.0) < 1e-5
    # alpha < 1 down-samples the head, up-samples the tail
    assert out["big"]["oversample"] < 1.0 < out["tail"]["oversample"]
    assert out["tail"]["weight"] > out["tail"]["p_raw"]
    assert out["big"]["weight"] < out["big"]["p_raw"]
    # ordering of weights still follows size
    assert out["big"]["weight"] > out["mid"]["weight"] > out["tail"]["weight"]

    # alpha = 1 is a no-op: weight == raw share
    flat = {r["source"]: r for r in
            temperature_mixture_weights(docs, alpha=1.0).collect()}
    for s in flat:
        assert flat[s]["weight"] == flat[s]["p_raw"]
        assert abs(flat[s]["oversample"] - 1.0) < 1e-5


def test_nb_domain_classifier_is_lazy(spark):
    # constructing the plan must trigger no Spark jobs (the corpus-level
    # scalars are broadcast crossJoins, not eager .count() calls) — else
    # every plan sweep / bench warmup runs the tokenize pipeline 3x
    from crawler_spark.operators.corpus import nb_domain_classifier

    docs = spark.createDataFrame(
        [(1, "a", "dog cat"), (2, "b", "stock bond")],
        "doc_id long, source string, text string",
    )
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup() or [])
    nb_domain_classifier(docs)
    after = set(tracker.getJobIdsForGroup() or [])
    assert before == after, "plan construction ran Spark jobs"


def test_suggest_n_buckets_scales_with_data(spark):
    from crawler_spark.operators.corpus import (
        pack_token_shards,
        suggest_n_buckets,
    )

    # floor for small corpora; ceil-div growth with rows; token cap can bind
    assert suggest_n_buckets(corpus_rows=10_000) == 32
    assert suggest_n_buckets(corpus_rows=10**9) == 500
    assert suggest_n_buckets(corpus_rows=10**11) == 50_000
    assert suggest_n_buckets(corpus_rows=100, total_tokens=10**13) == 5_000
    assert suggest_n_buckets() == 32

    # n_buckets=None auto-sizes from the input and still packs correctly
    docs = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, n_tokens long"
    )
    auto = pack_token_shards(docs, target_tokens=50, n_buckets=None)
    manual = pack_token_shards(docs, target_tokens=50, n_buckets=32)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, manual.collect())
    )


def test_repetition_signature_pinned_values(spark):
    from crawler_spark.operators.corpus import repetition_signature

    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),                       # heavy top-gram repetition
            (1, " ".join(f"w{i:03d}" for i in range(60))),  # 60 distinct 4-char words
            (2, "a b c d e a b c d e"),               # repeated 5-gram, full coverage
            (3, "hello there\nhello there\nworld line x"),  # duplicate lines
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signature(docs).collect()}
    # doc 0: tokens [a b a b a b], tot_chars 6; 'a b' x3 -> 3*2/6
    assert out[0]["top2_char_frac"] == 1.0
    assert out[0]["top3_char_frac"] == 1.0          # 'a b a' x2 -> 2*3/6
    assert out[0]["dup5_char_frac"] == 0.0          # all 5-grams distinct
    assert out[0]["keep"] is False
    # doc 1: all grams unique -> top2 = 8/240
    assert out[1]["top2_char_frac"] == round(8 / 240, 6)
    assert out[1]["top4_char_frac"] == round(16 / 240, 6)
    assert out[1]["dup_line_char_frac"] == 0.0
    assert out[1]["keep"] is True
    # doc 2: 'a b c d e' occurs at i=1 and i=6 -> every position covered once
    assert out[2]["dup5_char_frac"] == 1.0
    assert out[2]["dup6_char_frac"] == 0.0
    assert out[2]["top2_char_frac"] == round(4 / 10, 6)   # 'a b' x2, chars 2
    # doc 3: dup line chars 22 of 34
    assert out[3]["dup_line_char_frac"] == round(22 / 34, 6)


def test_stratified_sample_exact_and_prefilter_identical(spark):
    from crawler_spark.operators.corpus import stratified_sample

    docs = spark.createDataFrame(
        [(i, "s" + str(i % 2)) for i in range(2000)],
        "doc_id long, source string",
    )
    plain = stratified_sample(docs, "source", k=3, seed="z",
                              prefilter_min_rows=10**9).collect()
    pruned = stratified_sample(docs, "source", k=3, seed="z",
                               prefilter_min_rows=10).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, pruned))
    by_src = {}
    for r in plain:
        by_src.setdefault(r["source"], []).append(r["sample_rank"])
    assert all(sorted(v) == [1, 2, 3] for v in by_src.values())
    # short stratum: takes all rows, rank stays dense
    small = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
    )
    got = stratified_sample(small, "source", k=5).collect()
    assert len(got) == 3


def test_shuffle_shards_permutation_properties(spark):
    from crawler_spark.operators.corpus import shuffle_shards

    docs = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    out = shuffle_shards(docs, n_shards=4, seed="e0").collect()
    assert len(out) == 500 and len({r["doc_id"] for r in out}) == 500
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["shard_pos"])
    # positions dense 1..size per shard; shards roughly balanced
    for s, pos in by_shard.items():
        assert sorted(pos) == list(range(1, len(pos) + 1))
    sizes = sorted(len(v) for v in by_shard.values())
    assert len(sizes) == 4 and sizes[0] > 80
    # deterministic across runs; a different seed gives a different order
    again = shuffle_shards(docs, n_shards=4, seed="e0").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    other = shuffle_shards(docs, n_shards=4, seed="e1").collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, out))


def test_split_sentences_pinned(spark):
    from crawler_spark.operators.corpus import split_sentences

    docs = spark.createDataFrame(
        [
            (0, "Hello world. How are you?! Fine...\nNew para here"),
            (1, "!. ?"),                      # only sub-min fragments
            (2, "One sentence no punct"),
        ],
        "doc_id long, text string",
    )
    rows = split_sentences(docs).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["sent_idx"], r["sentence"], r["n_words"])
        )
    assert got[0] == [
        (0, "Hello world.", 2),
        (1, "How are you?!", 3),
        (2, "Fine...", 1),
        (3, "New para here", 3),
    ]
    assert 1 not in got          # fragments under min_chars dropped
    assert got[2] == [(0, "One sentence no punct", 4)]


def test_select_until_token_budget_equals_naive_window(spark):
    """The bucketed two-phase refinement must equal the plain per-source
    cumulative window (score DESC, doc_id) <= budget, across budgets that
    land inside a bucket, between buckets, at zero, and above the corpus."""
    from pyspark.sql import Window

    from crawler_spark.functions.text import quality_score, token_count
    from crawler_spark.operators.corpus import select_until_token_budget

    rows = [
        (i, f"s{i % 3}",
         " ".join(f"word{j % 7}" for j in range(3 + (i * 13) % 40))
         + ("." if i % 2 else "! Extra, STUFF?"))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def naive(budget):
        toks = docs.select(
            "doc_id", "source",
            token_count(F.col("text")).cast("long").alias("n_tokens"),
            quality_score(F.col("text")).alias("score"),
        )
        w = (Window.partitionBy("source")
             .orderBy(F.col("score").desc(), "doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return {
            tuple(r) for r in toks.withColumn(
                "cum", F.sum("n_tokens").over(w)
            ).where(F.col("cum") <= budget)
            .select("doc_id", "source", "n_tokens", "score").collect()
        }

    for budget in (0, 5, 37, 120, 10**9):
        # tiny bucket count forces real boundary-bucket refinement
        for nb in (4, 1024):
            got = {
                tuple(r) for r in select_until_token_budget(
                    docs, budget, n_score_buckets=nb
                ).collect()
            }
            assert got == naive(budget), (budget, nb)


def test_trim_repeated_ngrams_collapses_periodic(spark):
    from crawler_spark.operators.corpus import trim_repeated_ngrams

    docs = spark.createDataFrame(
        [(1, "buy now buy now buy now limited offer"),
         (2, "a a a a b"),
         (3, "the cat sat on the mat")],          # no adjacent repeats
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in trim_repeated_ngrams(docs).collect()}
    assert out[1]["clean_text"] == "buy now limited offer"
    assert out[1]["n_removed"] == 4
    assert out[2]["clean_text"] == "a b"
    assert out[3]["clean_text"] == "the cat sat on the mat"
    assert out[3]["n_removed"] == 0


def test_trim_repeated_ngrams_trigram_period(spark):
    from crawler_spark.operators.corpus import trim_repeated_ngrams

    docs = spark.createDataFrame(
        [(1, "one two three one two three one two three end")],
        "doc_id long, text string")
    row = trim_repeated_ngrams(docs).collect()[0]
    assert row["clean_text"] == "one two three end"
    # non-adjacent recurrence survives (it is content, not stutter)
    docs2 = spark.createDataFrame(
        [(2, "one two three x one two three")], "doc_id long, text string")
    assert trim_repeated_ngrams(docs2).collect()[0]["n_removed"] == 0


def test_cap_per_domain_keeps_best(spark):
    from crawler_spark.operators.corpus import cap_per_domain
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("big", i, float(i % 10)) for i in range(30)]
        + [("small", 100 + i, 1.0) for i in range(3)],
        "source string, doc_id long, score double")
    out = cap_per_domain(docs, cap=5, quality=F.col("score")).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["source"], []).append(r)
    assert len(by_dom["big"]) == 5 and len(by_dom["small"]) == 3
    # best-first with deterministic id tie-break: three score-9 docs
    # (9, 19, 29) then the two lowest-id score-8 docs (8, 18)
    ranked = sorted(by_dom["big"], key=lambda r: r["rank_in_domain"])
    assert [r["doc_id"] for r in ranked] == [9, 19, 29, 8, 18]
    assert [r["quality"] for r in ranked] == [9.0, 9.0, 9.0, 8.0, 8.0]


def test_chunk_passages_right_aligned_last(spark):
    from crawler_spark.operators.corpus import chunk_passages

    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_passages(docs, window=8, stride=4).collect(),
                  key=lambda r: r["chunk_id"])
    assert [(r["start_tok"], r["n_tok"]) for r in rows] == [(0, 8), (2, 8)]
    assert rows[0]["passage"].split(" ") == [f"w{i}" for i in range(8)]
    assert rows[1]["passage"].split(" ") == [f"w{i}" for i in range(2, 10)]


def test_chunk_passages_short_doc_single_chunk(spark):
    from crawler_spark.operators.corpus import chunk_passages

    docs = spark.createDataFrame([(1, "Just five small words here")],
                                 "doc_id long, text string")
    rows = chunk_passages(docs, window=8, stride=4).collect()
    assert len(rows) == 1
    assert rows[0]["start_tok"] == 0 and rows[0]["n_tok"] == 5
    assert rows[0]["passage"] == "just five small words here"


def test_chunk_passages_counts_and_coverage(spark):
    from crawler_spark.operators.corpus import chunk_passages

    text = " ".join(f"t{i}" for i in range(300))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_passages(docs, window=128, stride=64).collect(),
                  key=lambda r: r["chunk_id"])
    # ceil((300-128)/64)+1 = 4 chunks; last right-aligned at 172
    assert [(r["start_tok"], r["n_tok"]) for r in rows] == [
        (0, 128), (64, 128), (128, 128), (172, 128)]
    # every token covered
    covered = set()
    for r in rows:
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
    assert covered == set(range(300))


def test_best_snippet_picks_densest_window(spark):
    from crawler_spark.operators.corpus import best_snippet

    text = ("filler " * 8 + "apple banana apple cherry apple "
            + "filler " * 8).strip()
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = best_snippet(docs, ["apple", "cherry"], window=5).collect()[0]
    assert row["n_hits"] == 4
    assert row["best_start"] == 8
    assert row["snippet"] == "apple banana apple cherry apple"


def test_best_snippet_tie_breaks_to_first_and_short_doc(spark):
    from crawler_spark.operators.corpus import best_snippet

    docs = spark.createDataFrame(
        [(1, "x apple y z apple w"),      # two windows tie at 1 hit
         (2, "tiny doc")],                # shorter than the window
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           best_snippet(docs, ["apple"], window=3).collect()}
    # every length-3 window holds exactly one of the two hits; the
    # first-occurrence tie-break keeps window 0
    assert out[1]["n_hits"] == 1
    assert out[1]["best_start"] == 0
    assert out[1]["snippet"] == "x apple y"
    assert out[2]["best_start"] == 0
    assert out[2]["snippet"] == "tiny doc"
    assert out[2]["n_hits"] == 0


def test_vocab_growth_hand_computed(spark):
    from crawler_spark.operators.corpus import vocab_growth_estimate

    # tokens: a x3, b x2, c x1, d x1 -> N=7 V=4 f1=2 f2=1
    docs = spark.createDataFrame([("s", 1, "a a a b b c d")],
                                 "source string, doc_id long, text string")
    row = vocab_growth_estimate(docs).collect()[0]
    assert (row["n_tokens"], row["vocab"], row["f1"], row["f2"]) == (7, 4, 2, 1)
    assert row["gt_unseen_mass"] == pytest.approx(2 / 7, abs=1e-6)
    # chao1 = 4 + 2*1/(2*(1+1)) = 4.5
    assert row["chao1_richness"] == pytest.approx(4.5, abs=1e-4)


def test_vocab_growth_chao1_defined_when_f2_zero(spark):
    from crawler_spark.operators.corpus import vocab_growth_estimate

    # a x3, b x1, c x1 -> f1=2, f2=0, V=3
    docs = spark.createDataFrame([("s", 1, "a a a b c")],
                                 "source string, doc_id long, text string")
    row = vocab_growth_estimate(docs).collect()[0]
    assert row["f2"] == 0 and row["f1"] == 2
    # bias-corrected: V + f1(f1-1)/(2*(0+1)) = 3 + 1 = 4
    assert row["chao1_richness"] == pytest.approx(4.0, abs=1e-4)


def test_zipf_slope_recovers_planted_exponent(spark):
    from crawler_spark.operators.corpus import zipf_slope

    # plant freq(r) = round(1000 * r^-1): slope should come out near -1
    words = []
    for r in range(1, 40):
        words += [f"w{r:03d}"] * max(1, round(1000 / r))
    docs = spark.createDataFrame([("s", 1, " ".join(words))],
                                 "source string, doc_id long, text string")
    row = zipf_slope(docs, top_k=40).collect()[0]
    assert row["n_ranks"] == 39
    assert -1.05 < row["slope"] < -0.95


def test_contamination_overlap_fractions(spark):
    from crawler_spark.operators.corpus import contamination_overlap

    evald = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight ok"),
         (2, "completely different words in every position here now"),
         (3, "short doc")],
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in contamination_overlap(docs, evald, n=8).collect()}
    # doc 1: 4 distinct 8-grams, 3 of them inside the eval text
    assert out[1]["n_grams"] == 4
    assert out[1]["n_matched"] == 3
    assert out[1]["overlap_frac"] == 0.75
    assert out[2]["n_matched"] == 0 and out[2]["overlap_frac"] == 0.0
    assert out[3]["n_grams"] == 1       # whole-text fallback shingle
    assert out[3]["n_matched"] == 0


def test_sentence_align_proportional_lengths(spark):
    # doc A: lengths 10,10 -> midpoints 0.25, 0.75; doc B: lengths
    # 5,5,10 -> intervals [0,.25) [.25,.5) [.5,1]; expected links
    # a0->b0 (0.25 is in b1? no: 0.25 >= b1.lo=0.25 -> b1)  a1->b2
    from crawler_spark.operators.corpus import align_sentences_by_length

    sents = spark.createDataFrame(
        [(1, 0, "a" * 10), (1, 1, "b" * 10),
         (2, 0, "c" * 5), (2, 1, "d" * 5), (2, 2, "e" * 10)],
        "doc_id long, sent_idx int, sentence string")
    pairs = spark.createDataFrame(
        [(7, 1, 2)], "pair_id long, doc_a long, doc_b long")
    out = {r["a_idx"]: r for r in
           align_sentences_by_length(pairs, sents).collect()}
    assert len(out) == 2
    # a0 mid = 0.25: half-open intervals make it land in b1 [0.25, 0.5)
    assert out[0]["b_idx"] == 1
    assert out[0]["a_frac"] == 0.25 and out[0]["len_ratio"] == 2.0
    # a1 mid = 0.75: b2 [0.5, 1.0]
    assert out[1]["b_idx"] == 2
    assert out[1]["a_frac"] == 0.75 and out[1]["len_ratio"] == 1.0


def test_sentence_align_every_a_sentence_matches_exactly_once(spark):
    # totality: any length profile maps each a-sentence to exactly one
    # b-sentence (half-open intervals + closed last interval)
    from crawler_spark.operators.corpus import align_sentences_by_length

    rows = []
    for doc, lens in ((1, [3, 7, 2, 8]), (2, [4, 4]), (3, [1, 9, 5]),
                      (4, [6])):
        for i, ln in enumerate(lens):
            rows.append((doc, i, "x" * ln))
    sents = spark.createDataFrame(
        rows, "doc_id long, sent_idx int, sentence string")
    pairs = spark.createDataFrame(
        [(1, 1, 2), (2, 3, 4)], "pair_id long, doc_a long, doc_b long")
    out = align_sentences_by_length(pairs, sents).collect()
    from collections import Counter

    links = Counter((r["pair_id"], r["a_idx"]) for r in out)
    assert links == Counter({(1, 0): 1, (1, 1): 1, (1, 2): 1, (1, 3): 1,
                             (2, 0): 1, (2, 1): 1, (2, 2): 1})


def test_leakage_safe_splits_cluster_atomic(spark):
    # every member of a duplicate cluster gets the SAME split; singleton
    # docs (absent from clusters) key on their own id
    from crawler_spark.operators.corpus import leakage_safe_splits

    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long")
    clusters = spark.createDataFrame(
        [(i, i % 3) for i in range(0, 40, 2)],  # evens: 3 clusters
        "doc_id long, cluster_id long")
    out = leakage_safe_splits(docs, clusters, train_pct=50, val_pct=25)
    rows = out.collect()
    assert len(rows) == 40
    by_key = {}
    for r in rows:
        by_key.setdefault(r["cluster_key"], set()).add(r["split"])
    # cluster-atomicity: one split per cluster key
    assert all(len(s) == 1 for s in by_key.values())
    # evens collapsed onto 3 keys; odds are singleton keys
    evens = {r["cluster_key"] for r in rows if r["doc_id"] % 2 == 0}
    assert evens == {0, 1, 2}
    odd = [r for r in rows if r["doc_id"] % 2 == 1][0]
    assert odd["cluster_key"] == odd["doc_id"]
    # splits honor the percentage boundaries on the hash bucket
    for r in rows:
        want = ("train" if r["bucket"] < 50
                else "val" if r["bucket"] < 75 else "test")
        assert r["split"] == want


def test_leakage_safe_splits_stable_under_repartition(spark):
    from crawler_spark.operators.corpus import leakage_safe_splits

    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    clusters = spark.createDataFrame(
        [(i, i // 10) for i in range(100)], "doc_id long, cluster_id long")
    a = {r["doc_id"]: r["split"]
         for r in leakage_safe_splits(docs, clusters).collect()}
    b = {r["doc_id"]: r["split"]
         for r in leakage_safe_splits(
             docs.repartition(7), clusters.repartition(3)).collect()}
    assert a == b


def test_js_divergence_identical_and_disjoint(spark):
    # identical corpora -> JSD 0; fully disjoint vocabularies -> 1 bit
    from crawler_spark.operators.corpus import token_js_divergence

    a = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "gamma alpha")], "doc_id long, text string")
    same = token_js_divergence(a, a).collect()[0]
    assert same["jsd_bits"] == 0.0
    assert same["n_shared"] == same["n_terms_a"] == same["n_terms_b"] == 3
    b = spark.createDataFrame([(1, "delta epsilon")], "doc_id long, text string")
    dis = token_js_divergence(a, b).collect()[0]
    assert dis["jsd_bits"] == 1.0 and dis["n_shared"] == 0


def test_js_divergence_hand_computed_half_overlap(spark):
    import math

    from crawler_spark.operators.corpus import token_js_divergence

    a = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    b = spark.createDataFrame([(1, "x z")], "doc_id long, text string")
    out = token_js_divergence(a, b).collect()[0]
    # p = q = {x:.5, shared}; y,z each .5 on one side only
    # JSD = .5*.5*ln(1) *2(shared terms cancel) + 2 * .5*.5*ln(2) nats
    want = (2 * 0.5 * 0.5 * math.log(2)) / math.log(2)
    assert out["jsd_bits"] == round(want, 6) == 0.5
    assert out["n_shared"] == 1


def test_heaps_fit_recovers_planted_exponent(spark):
    # plant V = N^0.5 exactly: source g_i has n_i = 4^i tokens with
    # v_i = 2^i distinct (each word repeated n/v times) -> beta = 0.5,
    # ln_k = 0
    from crawler_spark.operators.corpus import heaps_law_fit

    rows = []
    for i in (1, 2, 3):
        n, v = 4 ** i, 2 ** i
        words = " ".join(f"w{j % v}" for j in range(n))
        rows.append((i, words, f"src{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = heaps_law_fit(docs).collect()[0]
    assert out["n_groups"] == 3
    assert out["beta"] == 0.5 and out["ln_k"] == 0.0


def test_sentence_align_zero_length_docs_emit_nothing(spark):
    # ADVICE r4: a pair whose documents are all zero-length sentences
    # has den=0, which (pre-guard) made every a-sentence match every
    # b-sentence with NULL fractions; the den>0 guard drops the pair.
    # A normal pair in the same input is unaffected.
    from crawler_spark.operators.corpus import align_sentences_by_length

    sents = spark.createDataFrame(
        [(1, 0, ""), (1, 1, ""), (2, 0, ""), (2, 1, ""),
         (3, 0, "aaaa"), (4, 0, "bb")],
        "doc_id long, sent_idx int, sentence string")
    pairs = spark.createDataFrame(
        [(7, 1, 2), (8, 3, 4)], "pair_id long, doc_a long, doc_b long")
    out = align_sentences_by_length(pairs, sents).collect()
    assert {r["pair_id"] for r in out} == {8}
    assert len(out) == 1 and out[0]["a_idx"] == 0 and out[0]["b_idx"] == 0
