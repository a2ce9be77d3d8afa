"""Interleaved A/B of the crawl job between two checkouts of this repo.

The sandbox host shows multi-fold steal bursts, so single runs of anything
prove nothing; the only meaningful comparison is A,B,A,B,… at identical
work in fresh subprocesses, medians + per-run CPU-busy reported.  Used to
verify round-3's regression fix against the round-1 tree (VERDICT.md round 2
measured HEAD 58-99 s vs r1 27-37 s on this exact workload).

Usage: python tools/ab_crawl.py <treeA> <treeB> [cards] [repeats] [cpus]
Prints one JSON line per run + a summary line.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

A = sys.argv[1]
B = sys.argv[2]
CARDS = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
REPEATS = int(sys.argv[4]) if len(sys.argv) > 4 else 2
CPUS = int(sys.argv[5]) if len(sys.argv) > 5 else 32

WORKER = r"""
import json, sys, time, tempfile, shutil, os
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = str({cpus})
from crawler_spark.session import get_spark

def cpu():
    v = list(map(int, open("/proc/stat").readline().split()[1:]))
    return sum(v), v[3] + v[4]

spark = get_spark("ab-{tag}", cores={cpus}, shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
from crawler_spark.sources.pages import synthetic_docs_from_range, build_pages, NUM_BASE
from crawler_spark.plans.crawl_job import CrawlJob

docs = synthetic_docs_from_range(spark, {cards})
pages = build_pages(spark, "/root/testdata/sf0.1", include_fixtures=False,
                    docs_df=docs).repartition({cpus}, "url").persist()
pages.count()
store = tempfile.mkdtemp(prefix="ab_")
job = CrawlJob(spark, store, pages, wave_seconds=3600 * 1000,
               robots_df=None, use_bloom=True)
a0, i0 = cpu(); t0 = time.perf_counter()
job.seed_range(NUM_BASE, NUM_BASE + {cards} - 1)
stats = job.crawl()
dt = time.perf_counter() - t0; a1, i1 = cpu()
shutil.rmtree(store, ignore_errors=True)
fetched = sum(s["fetched"] for s in stats)
print("RESULT " + json.dumps({{
    "tree": {repo!r}, "seconds": round(dt, 1), "fetched": fetched,
    "pages_per_sec": round(fetched / dt, 1),
    "cpu_busy_cores": round((1 - (i1 - i0) / max(a1 - a0, 1)) * os.cpu_count(), 1),
}}))
"""


def run(repo: str, tag: str) -> dict:
    code = WORKER.format(repo=repo, cards=CARDS, cpus=CPUS, tag=tag)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            print(json.dumps(r), flush=True)
            return r
    raise RuntimeError(f"no RESULT from {repo}:\n{out.stdout[-1500:]}\n"
                       f"{out.stderr[-1500:]}")


def main() -> None:
    runs = {A: [], B: []}
    for _ in range(REPEATS):
        runs[A].append(run(A, "A")["seconds"])
        runs[B].append(run(B, "B")["seconds"])
    med_a, med_b = statistics.median(runs[A]), statistics.median(runs[B])
    print(json.dumps({
        "cards": CARDS, "cpus": CPUS,
        "A": A, "B": B, "runs_A": runs[A], "runs_B": runs[B],
        "median_A": med_a, "median_B": med_b,
        "min_A": min(runs[A]), "min_B": min(runs[B]),
        "A_over_B_median": round(med_a / med_b, 2),
        "A_over_B_min": round(min(runs[A]) / min(runs[B]), 2),
    }))


if __name__ == "__main__":
    main()
