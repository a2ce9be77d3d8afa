"""Whole-inventory physical-plan audit.

Every driver query (``__spark_entry__.queries()``) is built at sf0.001 and
its executed/analyzed plans are swept for the three shapes that do not
survive a 100x scale-up, regardless of which operator family they appear in:

* ``CartesianProduct`` — an unkeyed join: |A|x|B| work.  Every pairwise
  operator here is candidate-bounded (LSH bands, shard keys, broadcast
  probes), so nothing should ever fall back to a cross product.
* ``BatchEvalPython`` — a row-at-a-time Python UDF on the executor hot
  path (input_hint: "vectorized pandas/Arrow UDFs (no per-row Python)").
  Arrow-batched evaluation shows as ``ArrowEvalPython`` and is allowed.
* partition-less ``Window`` — ``Window.orderBy`` with no ``partitionBy``
  funnels the whole input through ONE task (the round-1 IVF centroid bug).
  Detected in the analyzed plan: a ``windowspecdefinition(...)`` whose
  first argument is already an ordering expression.

This is the sweep version of the targeted assertions in test_plans*.py:
those pin the *good* shape of individual flagship plans (broadcasts,
pushed filters, map-side combines); this one guarantees no query in the
191-entry inventory regresses into a known scale-killer.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

# windowspecdefinition whose FIRST top-level comma-token is an order expr
# (ASC/DESC) => empty partition spec => single-task window.  The first
# argument may itself contain one level of function-call parens (e.g.
# windowspecdefinition(lower(x#1) ASC ...)), so allow nested (...) groups
# before requiring the ASC/DESC marker.
_GLOBAL_WINDOW = re.compile(
    r"windowspecdefinition\((?:[^,()]|\([^()]*\))*\s(?:ASC|DESC)\b"
)


def _all_plans(df) -> tuple[str, str]:
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString(), qe.analyzed().toString()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_no_scale_killer_shapes(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    physical, analyzed = _all_plans(df)
    assert "CartesianProduct" not in physical, f"{name}: cartesian product"
    assert "BatchEvalPython" not in physical, f"{name}: per-row Python UDF"
    m = _GLOBAL_WINDOW.search(analyzed)
    assert m is None, f"{name}: partition-less window ({m.group(0)!r})"


def test_global_window_regex_catches_computed_sort_keys(spark):
    # regression probe for the audit itself: a partition-less window over
    # a COMPUTED sort key (function call in the ordering expression) must
    # still be flagged
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("A",), ("b",)], "x string").withColumn(
        "rn", F.row_number().over(Window.orderBy(F.lower("x")))
    )
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert _GLOBAL_WINDOW.search(analyzed), analyzed

    # and a properly partitioned window over the same computed key passes
    ok = spark.createDataFrame([("A", 1), ("b", 2)], "x string, g int").withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy(F.lower("x")))
    )
    analyzed_ok = ok._jdf.queryExecution().analyzed().toString()
    assert not _GLOBAL_WINDOW.search(analyzed_ok), analyzed_ok
