"""Graph operators over edge DataFrames: weighted PageRank.

Companion to :func:`crawler_spark.operators.dedup.connected_components`
(min-label propagation) — both are bounded iterative DataFrame jobs with
per-round lineage truncation, the Spark-idiomatic shape for graph
analytics without a graph library.

Reference context: the F# crawler has no graph layer; a crawl corpus *is*
a graph (pages → links), and centrality over it is a standard
training-data curation signal (e.g. harmonic/PageRank-weighted sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str | None = None, iters: int = 5,
             damping: float = 0.85) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count (deterministic — the
    oracle unrolls the same ``iters`` rounds; no convergence test, so both
    engines do exactly the same arithmetic).

    Semantics: rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u) * w(u,v)/out_w(u).
    Dangling-node mass is dropped (documented variant; both engines
    identical).  Each round is ONE shuffle — edges (pre-joined with their
    source's out-weight, persisted once) hash-join the rank vector on the
    source key, then a map-side-combined sum groups contributions by
    destination.  Lineage is truncated per round (``localCheckpoint``).
    At 10^9 nodes: pre-partition edges by src and ranks by node so the
    per-round join co-locates; the rank vector is O(nodes), never
    collected to the driver.

    Returns (node, rank) with rank rounded to 6 d.p. (the one rounding
    point — intermediate values stay full doubles in both engines).
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    ep = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .persist()
    )
    nodes = (
        ep.select(F.col("src").alias("node"))
        .unionByName(ep.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (
            ep.join(ranks, ep["src"] == ranks["node"])
            .select(F.col("dst").alias("node"),
                    (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    ep.unpersist()
    nodes.unpersist()
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def transition_edges(events: DataFrame, key_col: str = "user_id",
                     state_col: str = "event_type",
                     order_cols: tuple = ("ts", "event_id")) -> DataFrame:
    """Per-key consecutive-state transition edges with counts: sessions
    ordered by ``order_cols``, each adjacent (state, next-state) pair is
    one directed edge occurrence.  The lag window partitions by the key
    (bounded per-user history — no global window), the count aggregate
    combines map-side.  Returns (src, dst, w)."""
    from pyspark.sql import Window

    win = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    nxt = F.lead(F.col(state_col)).over(win)
    return (
        events.select(F.col(state_col).alias("src"), nxt.alias("dst"))
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
