"""Micro-bench for the BPE trainer strategies (VERDICT r03 Next #3).

Measures driver round-trips (pair-count collects that gate progress) and
wall-clock for the same merge budget under:
  - sequential   (batch_size=1 — round 3's one-Spark-job-per-merge pacing)
  - batched      (batch_size=16 relational rounds)
  - local        (driver-local merge loop over the collected capped vocab)

The merge tables are asserted identical before timings are reported.
Corpus: a deterministic synthetic word-frequency mixture big enough to
sustain ~TARGET_MERGES merges.  Run:  python tools/bpe_bench.py [merges]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synthetic_docs(spark, n_words: int = 4000):
    """Deterministic zipf-ish weighted vocabulary: composite words over a
    12-letter alphabet so pair merges keep finding work for thousands of
    rounds."""
    import random

    rng = random.Random(42)
    alpha = "abcdefghijkl"
    rows = []
    for i in range(n_words):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 12)))
        n = max(1, int(1000 / (1 + i % 97)))
        rows.append((i, " ".join([w] * min(n, 40))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    merges = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    from pyspark.sql import SparkSession

    from crawler_spark.operators.corpus import bpe_train
    from crawler_spark.operators.corpus_bpe import train_stats

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("bpe-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = synthetic_docs(spark).persist()
    docs.count()

    results: dict[str, dict] = {}
    tables: dict[str, list] = {}
    for label, kwargs in (
        ("sequential", dict(strategy="relational", batch_size=1)),
        ("batched16", dict(strategy="relational", batch_size=16)),
        ("local", dict(strategy="local")),
    ):
        t0 = time.monotonic()
        tbl = [tuple(r) for r in bpe_train(docs, merges=merges, **kwargs).collect()]
        dt = time.monotonic() - t0
        st = train_stats()
        tables[label] = tbl
        results[label] = {
            "seconds": round(dt, 2),
            "collects": st["collects"],
            "merges": st["merges"],
        }

    assert tables["sequential"] == tables["batched16"] == tables["local"], (
        "strategy outputs diverged"
    )
    seq_c = results["sequential"]["collects"]
    for label in ("batched16", "local"):
        results[label]["roundtrip_reduction"] = round(
            seq_c / results[label]["collects"], 1
        )
    print(json.dumps({"metric": "bpe_train_roundtrips",
                      "target_merges": merges, "results": results}))


if __name__ == "__main__":
    main()
