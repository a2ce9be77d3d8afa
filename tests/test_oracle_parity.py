"""Local replica of the driver's correctness gate: every queries() entry
with an oracle must match DuckDB on row count, column names, and an
order-insensitive value hash (tools/oracle_check.py logic) at the test sf."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from tools.duck_oracle import DuckOracle
from tools.oracle_check import value_hash

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    # OOM-surviving shared connection (see tools/duck_oracle.py: close the
    # wedged connection, retry down the budget ladder, heal back to the
    # steady 24GB budget after a shrunken-rung success)
    holder = DuckOracle(sf_dir)
    yield holder
    holder.close()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "lang_pred", "source", "n_docs", "sum_tokens", "min_quality", "max_quality"
    ]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    drows, dcols = duck.run(ORACLES[name])
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert value_hash(srows, sdf.columns) == value_hash(drows, dcols)


@pytest.mark.parametrize("name", ["media_image_features", "media_frame_sample"])
def test_rows_only_queries_run(spark, sf_dir, name):
    assert QUERIES[name](spark, sf_dir).count() > 0
