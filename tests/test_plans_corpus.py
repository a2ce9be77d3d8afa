"""Physical-plan audits for the corpus-hygiene and cluster operators:
native-only execution, map-side partial aggregation, and shuffle-free
sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import plan_of


def test_hash_sample_is_shuffle_free_and_native(spark, sf_dir):
    from crawler_spark.operators.corpus import hash_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(hash_sample(docs, "doc_id", 1000, salt="s1"))
    assert "Exchange" not in plan          # pure per-row filter
    assert "EvalPython" not in plan        # codegen'd md5 gate
    assert "*(1) Filter" in plan           # whole-stage-codegen'd stage


def test_boilerplate_stats_partial_agg_no_python(spark, sf_dir):
    from crawler_spark.operators.corpus import boilerplate_shingle_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(boilerplate_shingle_stats(docs))
    assert "EvalPython" not in plan
    # doc-frequency count and the per-doc rollup both combine map-side
    assert "partial_count" in plan
    assert plan.count("HashAggregate") >= 4   # partial+final for both aggs


def test_remove_frequent_lines_native_anti_join(spark, sf_dir):
    from crawler_spark.operators.corpus import remove_frequent_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(remove_frequent_lines(docs))
    assert "EvalPython" not in plan
    assert "LeftAnti" in plan              # frequent-line drop is an anti-join
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_pii_redaction_stays_in_codegen(spark, sf_dir):
    from crawler_spark.operators.corpus import pii_match_counts, redact_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e, p, i = pii_match_counts(F.col("text"))
    q = docs.select(redact_pii(F.col("text")).alias("t"), e, p, i)
    plan = plan_of(q)
    assert "EvalPython" not in plan
    assert "*(1) Project" in plan          # whole-stage-codegen'd stage


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    from crawler_spark.operators.corpus import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(decontaminate(
        docs.where(F.col("doc_id") % 37 != 0),
        docs.where(F.col("doc_id") % 37 == 0),
    ))
    assert "EvalPython" not in plan
    # the (tiny) eval-gram side must broadcast so the training corpus is
    # scanned once and never shuffled for the semi-join
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_mix_sources_broadcasts_rates_no_python(spark, sf_dir):
    from crawler_spark.operators.corpus import mix_sources

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights = {f"src{i}": 0.05 for i in range(20)}
    plan = plan_of(mix_sources(docs, weights, token_budget=10_000))
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan     # |sources|-row rate table
    assert "Cartesian" not in plan


def test_unigram_logprob_partial_agg_no_python(spark, sf_dir):
    from crawler_spark.operators.corpus import unigram_logprob

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(unigram_logprob(docs))
    assert "EvalPython" not in plan
    assert "partial_count" in plan         # vocab counts combine map-side


def test_dsir_models_broadcast_and_instances_never_shuffle(spark, sf_dir):
    from crawler_spark.operators.corpus import dsir_importance

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.where(F.col("doc_id") % 5 == 0)
    plan = plan_of(dsir_importance(docs, target, n_buckets=256))
    assert "EvalPython" not in plan
    # both bucket models join as broadcasts — the gram instance stream is
    # never hash-partitioned by bucket
    assert plan.count("BroadcastHashJoin") >= 2
    # the per-doc sum aggregates map-side (one partial per doc partition)
    assert "partial_count" in plan or "partial_sum" in plan


def test_bm25_pushes_query_filter_and_takeordered(spark, sf_dir):
    from crawler_spark.operators.corpus import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(bm25_topk(docs, ["spark", "window"], k=10))
    assert "EvalPython" not in plan
    # top-k is a TakeOrderedAndProject, never a global Sort+Limit
    assert "TakeOrderedAndProject" in plan
    assert "Sort [score" not in plan
    # the query-term restriction joins as a broadcast BEFORE the tf groupBy
    assert "BroadcastHashJoin" in plan


def test_budget_allocator_bonus_is_broadcast_no_global_window(spark):
    from crawler_spark.operators.politeness import allocate_crawl_budget

    hosts = spark.createDataFrame(
        [(f"h{i}", i + 1) for i in range(50)], "host string, weight long"
    )
    out = allocate_crawl_budget(hosts, 997)
    plan = plan_of(out)
    assert "Window" not in plan            # no global row_number rank
    assert "BroadcastHashJoin" in plan     # bonus set joins broadcast
    assert "TakeOrderedAndProject" in plan # leftover selection is a heap


def test_bpe_encode_vocab_broadcast_no_python(spark, sf_dir):
    from crawler_spark.operators.corpus import bpe_encode

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(bpe_encode(docs, [("e", "s"), ("es", "t")]))
    assert "EvalPython" not in plan
    # the encoded distinct-word vocab joins as a broadcast — word
    # instances are never shuffled for the lookup
    assert "BroadcastHashJoin" in plan
    # the per-doc sums combine map-side
    assert "partial_count" in plan or "partial_sum" in plan


def test_lr_scoring_is_pure_projection(spark, sf_dir):
    from crawler_spark.operators.corpus import lr_quality_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(lr_quality_scores(docs, [0.1, -0.2, 0.3, 0.4]))
    assert "EvalPython" not in plan
    assert "Exchange" not in plan          # scan-stage filter, no shuffle
