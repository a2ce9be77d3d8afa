"""Oracle memory-budget sweep: every oracle must run under a HARD 8 GB cap.

Round 4's only red CORRECTNESS row (`emb_semdedup`) was not a Spark wrong
answer — the driver's co-resident DuckDB hit a system-level malloc failure
while re-deriving an unmaterialized 3-round k-means CTE chain twice.  The
repo-side mitigation is to keep every oracle cheap BY CONSTRUCTION, and
this sweep is the regression gate for that: it executes every entry of
``oracle_sql()`` on a fresh DuckDB connection capped at 8 GB (no heal
ladder, no retry rungs — a query that needs the 24 GB rung fails here) and
reports any OOM/error.  ``tests/test_oracle_budget.py`` wires it into
pytest so a memory-hungry oracle regression is caught pre-commit.

Usage:  python tools/oracle_budget_check.py [sf_dir] [--limit 8GB] [names...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BUDGET = "8GB"


def budget_connect(sf_dir: str, memory_limit: str = BUDGET, threads: int = 8):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{memory_limit}'")
    con.execute(f"SET threads={threads}")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def sweep(sf_dir: str, memory_limit: str = BUDGET,
          names: list[str] | None = None, verbose: bool = True):
    """Run every oracle at the capped budget; return {name: err_or_None}."""
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    if names:
        oracles = {n: oracles[n] for n in names}
    results: dict[str, str | None] = {}
    for name, sql in oracles.items():
        # fresh connection per query: an OOM-wedged DuckDB connection stays
        # wedged (round-3 cascade), and per-query isolation also gives each
        # oracle the full cap rather than sharing buffered temp state.
        con = budget_connect(sf_dir, memory_limit=memory_limit)
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
            results[name] = None
            if verbose:
                print(f"  ok   {name}: {n} rows {time.time() - t0:.1f}s",
                      flush=True)
        except Exception as ex:  # noqa: BLE001 — report, don't die
            results[name] = f"{type(ex).__name__}: {ex}"
            if verbose:
                print(f"  FAIL {name}: {results[name][:160]}", flush=True)
        finally:
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass
    return results


def main(argv: list[str]) -> int:
    sf_dir = "/root/testdata/sf0.01"
    limit = BUDGET
    names: list[str] = []
    it = iter(argv)
    for a in it:
        if a == "--limit":
            limit = next(it)
        elif os.path.isdir(a):
            sf_dir = a
        else:
            names.append(a)
    results = sweep(sf_dir, memory_limit=limit, names=names or None)
    bad = {k: v for k, v in results.items() if v}
    print(f"\n{len(results) - len(bad)}/{len(results)} oracles pass at "
          f"{limit}; {len(bad)} fail")
    for k, v in bad.items():
        print(f"  {k}: {v[:200]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
