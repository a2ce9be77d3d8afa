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
from tools.oracle_check import TABLES, value_hash

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _duck_connect(sf_dir, memory_limit="12GB"):
    con = duckdb.connect()
    # bounded budget + a spill directory: DuckDB 1.0's default (80% of
    # physical RAM, no temp dir for in-memory DBs) turns transient
    # allocation hiccups alongside the Spark JVM into hard
    # OutOfMemoryException; with a temp_directory it spills instead
    con.execute(f"SET memory_limit='{memory_limit}'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = _duck_connect(sf_dir)
    yield con
    con.close()


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
    try:
        res = duck.execute(ORACLES[name])
        drows = res.fetchall()
    except duckdb.OutOfMemoryException:
        # rare transient bad_alloc co-resident with the Spark JVM — retry on
        # fresh connections with SHRINKING budgets: a smaller memory_limit
        # forces DuckDB to spill to /tmp instead of asking a pressured
        # allocator for more (same SQL, same data, so failing every rung is
        # a real finding)
        res = drows = None
        for limit in ("8GB", "2GB"):
            fresh = _duck_connect(sf_dir, memory_limit=limit)
            try:
                res = fresh.execute(ORACLES[name])
                drows = res.fetchall()
                break
            except duckdb.OutOfMemoryException:
                fresh.close()
                if limit == "2GB":
                    raise
    dcols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert value_hash(srows, sdf.columns) == value_hash(drows, dcols)


@pytest.mark.parametrize("name", ["media_image_features", "media_frame_sample"])
def test_rows_only_queries_run(spark, sf_dir, name):
    assert QUERIES[name](spark, sf_dir).count() > 0
