"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, comparing
row count, column names, and an order-insensitive value hash (columns
sorted by name, rows sorted, values stringified).  Use before committing:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(val) -> str:
    import datetime
    import math

    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        # driver-style canonicalization: repr round-trip on float
        return repr(round(val, 9))
    if isinstance(val, datetime.datetime):
        return val.isoformat()
    return str(val)


def value_hash(rows, columns) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as entrymod
    from crawler_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    from tools.duck_oracle import DuckOracle

    oracle = DuckOracle(sf_dir)

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        try:
            drows, dcols = oracle.run(oracles[name])
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:28s} ORACLE SQL ERROR: {str(e).splitlines()[0][:120]}")
            continue
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
        ok_v = sh == dh
        status = "OK " if (ok_n and ok_c and ok_v) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{name:28s} {status} rows {len(srows)}/{len(drows)} "
            f"cols={'=' if ok_c else f'{scols} vs {dcols}'} hash {sh}/{dh}"
        )
        if status == "FAIL" and ok_c and ok_n and len(srows) <= 100000:
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = {tuple(_canon(r[i]) for i in order) for r in srows}
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dset = {tuple(_canon(r[i]) for i in dorder) for r in drows}
            s_only = list(sset - dset)[:3]
            d_only = list(dset - sset)[:3]
            print(f"   spark-only: {s_only}")
            print(f"   duck-only : {d_only}")

    spark.stop()
    oracle.close()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
