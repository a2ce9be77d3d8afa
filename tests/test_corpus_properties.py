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
