"""WARC ingest throughput + two-parallelism scaling evidence.

Measures the full ingestion path — `binaryFile` scan → record walk →
input_hint projection (decode text, lang id) → count — over archives
written once from the sf pages universe.  Each timing runs in its own
subprocess/JVM (same protocol as tools/scaling_bench.py: interleaved
lo/hi runs, /proc/stat cpu-busy telemetry so hypervisor-throttled windows
are visible in the raw data).

The parallelism unit is ONE TASK PER ARCHIVE (binaryFile gives no
intra-file splits), so `shards` must be >= the high core count for the
scaling pair to be meaningful — default 32 archives.

Usage: python tools/warc_bench.py [cards] [shards] [repeats] [n_lo] [n_hi]
Prints one JSON line per run + a summary line.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

CARDS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
SHARDS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
N_LO = int(sys.argv[4]) if len(sys.argv) > 4 else 2
N_HI = int(sys.argv[5]) if len(sys.argv) > 5 else 8

REPO = str(Path(__file__).resolve().parent.parent)

WRITER = r"""
import sys
sys.path.insert(0, {repo!r})
from crawler_spark.session import get_spark
from crawler_spark.sources.pages import build_pages, synthetic_docs_from_range
from crawler_spark.sources.warc import write_warc
spark = get_spark("warc-write", cores=16, shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
docs = synthetic_docs_from_range(spark, {cards})
pages = build_pages(spark, "/root/testdata/sf0.01",
                    include_fixtures=False, docs_df=docs)
m = write_warc(pages, {out!r}, shards={shards}).collect()
print(sum(r["records"] for r in m), sum(r["bytes"] for r in m))
"""

READER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})


def busy():
    parts = open("/proc/stat").readline().split()[1:]
    vals = [int(x) for x in parts]
    idle = vals[3] + vals[4]
    return sum(vals), idle


import os
NCPU = os.cpu_count() or 1


from crawler_spark.session import get_spark
from crawler_spark.sources.warc import pages_from_warc
spark = get_spark("warc-read", cores={cpus}, shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
pages_from_warc(spark, {glob!r}, mime=True).count()  # untimed warm-up:
# page cache + JIT + Python worker pool, same hygiene as bench.py
t0, (b0, i0) = time.time(), busy()
n = pages_from_warc(spark, {glob!r}, mime=True).count()
dt, (b1, i1) = time.time() - t0, busy()
cores_busy = ((b1 - b0) - (i1 - i0)) / max(b1 - b0, 1) * NCPU
print(json.dumps({{"cpus": {cpus}, "sec": round(dt, 2), "rows": n,
                   "rows_per_sec": round(n / dt, 1),
                   "cpu_busy_cores": round(cores_busy, 1)}}))
"""


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="warc_bench_")
    w = subprocess.run(
        [sys.executable, "-c",
         WRITER.format(repo=REPO, cards=CARDS, out=tmp, shards=SHARDS)],
        capture_output=True, text=True, timeout=1800,
    )
    recs, nbytes = w.stdout.strip().split("\n")[-1].split()
    print(json.dumps({"written_records": int(recs),
                      "written_bytes": int(nbytes), "shards": SHARDS}))

    results: dict[int, list[dict]] = {N_LO: [], N_HI: []}
    for _ in range(REPEATS):
        for cpus in (N_LO, N_HI):
            r = subprocess.run(
                [sys.executable, "-c",
                 READER.format(repo=REPO, cpus=cpus, glob=tmp + "/*.warc")],
                capture_output=True, text=True, timeout=1800,
            )
            line = r.stdout.strip().split("\n")[-1]
            rec = json.loads(line)
            results[cpus].append(rec)
            print(line, flush=True)

    med = {c: statistics.median(x["rows_per_sec"] for x in results[c])
           for c in results}
    eff = med[N_HI] / med[N_LO] / (N_HI / N_LO)
    print(json.dumps({"median_rows_per_sec": med,
                      "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
