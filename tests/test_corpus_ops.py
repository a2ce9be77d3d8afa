"""Tests for corpus-hygiene operators: boilerplate detection/removal,
deterministic hash sampling, PII redaction (operators/corpus.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.corpus import (
    boilerplate_shingle_stats,
    hash_sample,
    pii_match_counts,
    redact_pii,
    remove_frequent_lines,
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
