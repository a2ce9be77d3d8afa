"""Every oracle's OUTPUT columns must carry an explicitly-pinned type.

Round 3's only red driver row (`corpus_pack_shards`) was caused by an
un-cast DuckDB HUGEINT output column: window `sum(bigint)` widens to
int128, and a pandas/Arrow fetch renders HUGEINT as float ("123.0" vs
Spark's "123"), failing the value hash while rows and schema still
match.  DECIMAL outputs (e.g. from `sum(int)` in some dialects) have the
same render-divergence hazard.  This sweep DESCRIBEs every oracle (plans
without executing) and bans the divergent types from the output schema,
so the class of bug can never come back silently.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from tools.oracle_check import TABLES

ORACLES = entrymod.oracle_sql()

# Types whose pandas/Arrow rendering diverges from Spark's string form.
_BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def duck_schema_con(sf_dir):
    con = duckdb.connect()
    con.execute("SET memory_limit='4GB'")
    con.execute("SET threads=4")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_are_pinned(duck_schema_con, name):
    rows = duck_schema_con.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if any(b in typ.upper() for b in _BANNED)
    ]
    assert not bad, (
        f"oracle {name!r} emits driver-divergent column types {bad}; "
        "cast them ::bigint / ::double in the final SELECT"
    )
