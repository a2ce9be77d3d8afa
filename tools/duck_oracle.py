"""Shared OOM-surviving DuckDB oracle connection.

DuckDB 1.x co-resident with a Spark JVM occasionally hard-OOMs on a small
allocation despite free RAM, and an OutOfMemory-wedged connection STAYS
wedged — round 3's full-suite cascade: one mid-module OOM broke the shared
module connection and every later parity test failed against it.  This
holder:

* connects with the validated steady-state budget (24GB, threads=8, spill
  dir — never shrink the default; heavy emb_* oracles OOM deterministically
  below it),
* on OOM closes the wedged connection and retries on a fresh one, last
  rung at a shrunken budget so spillable plans spill instead of dying,
* after a shrunken-rung success, reconnects back at the steady budget so
  later heavy queries don't pay a guaranteed OOM + reconnect cycle.

Used by tools/oracle_check.py (the pre-commit replica) and
tests/test_oracle_parity.py (the module fixture).
"""

from __future__ import annotations

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

STEADY_BUDGET = "24GB"
_RUNGS = (None, "24GB", "8GB")  # None = use the current connection as-is


def duck_connect(sf_dir: str, memory_limit: str = STEADY_BUDGET,
                 threads: int = 8):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{memory_limit}'")
    con.execute(f"SET threads={threads}")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


class DuckOracle:
    def __init__(self, sf_dir: str):
        self.sf_dir = sf_dir
        self.con = duck_connect(sf_dir)

    def _reconnect(self, memory_limit: str = STEADY_BUDGET) -> None:
        try:
            self.con.close()
        except Exception:  # noqa: BLE001 — already broken
            pass
        self.con = duck_connect(self.sf_dir, memory_limit=memory_limit)

    def run(self, sql: str):
        """Execute sql, surviving OOM; returns (rows, column_names)."""
        last = _RUNGS[-1]
        for limit in _RUNGS:
            if limit is not None:
                self._reconnect(memory_limit=limit)
            try:
                res = self.con.execute(sql)
                out = res.fetchall(), [d[0] for d in res.description]
            except duckdb.OutOfMemoryException:
                if limit == last:
                    raise
                continue
            if limit == last:
                self._reconnect(memory_limit=STEADY_BUDGET)
            return out

    def close(self) -> None:
        try:
            self.con.close()
        except Exception:  # noqa: BLE001
            pass
