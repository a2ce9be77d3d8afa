"""Tests for graph operators (operators/graph.py): weighted PageRank and
transition-edge derivation."""

from __future__ import annotations

import pytest

from crawler_spark.operators.graph import pagerank, transition_edges


def test_pagerank_symmetric_two_cycle(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert out == {"a": 0.5, "b": 0.5}    # symmetry is a fixpoint


def test_pagerank_dangling_sink(spark):
    # a->b only: a keeps teleport mass, b = teleport + d * teleport after
    # round 2 (a's rank is constant 0.075 from round 1 on)
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert out["a"] == pytest.approx(0.075, abs=1e-6)
    assert out["b"] == pytest.approx(0.075 + 0.85 * 0.075, abs=1e-6)


def test_pagerank_weights_split_proportionally(spark):
    edges = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0)], "src string, dst string, w double"
    )
    out = {r["node"]: r["rank"]
           for r in pagerank(edges, weight="w", iters=1).collect()}
    third = 1.0 / 3.0
    assert out["b"] == pytest.approx(0.05 + 0.85 * third * 0.75, abs=1e-6)
    assert out["c"] == pytest.approx(0.05 + 0.85 * third * 0.25, abs=1e-6)


def test_transition_edges_orders_and_counts(spark):
    events = spark.createDataFrame(
        [(0, 1, 10, "x"), (1, 1, 20, "y"), (2, 1, 30, "x"),
         (3, 2, 10, "x"), (4, 2, 20, "y")],
        "event_id long, user_id long, ts long, event_type string",
    )
    out = {(r["src"], r["dst"]): r["w"]
           for r in transition_edges(events).collect()}
    # user1: x->y, y->x; user2: x->y  — no cross-user edge
    assert out == {("x", "y"): 2.0, ("y", "x"): 1.0}
