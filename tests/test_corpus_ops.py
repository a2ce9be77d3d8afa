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
