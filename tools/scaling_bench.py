"""Two-parallelism scaling evidence for BENCH/BASELINE.md (north_rule).

No real cluster exists in this sandbox, so the N→4N-executor criterion is
evidenced by running the SAME crawl job on the SAME input at local[8] and
local[32] (each in its own subprocess/JVM) and comparing page throughput.

Method: politeness budget caps each wave at ~BUDGET card urls per host, so
the job runs several waves; wave 1 pays one-time costs (python-worker spawn,
code paths warming), later waves are steady state.  We report both whole-job
and steady-state (waves >= 2) throughput; scaling efficiency is
(pps_32 / pps_8) / 4 — the local-mode stand-in for N→4N executors.

Usage: python tools/scaling_bench.py [cards] [budget]
Writes one JSON line per config + a summary; paste into BENCH.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

CARDS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000

WORKER = r"""
import json, sys, time, tempfile, shutil, os
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = str({cpus})
from crawler_spark.session import get_spark
from crawler_spark.sources.pages import synthetic_docs_from_range, build_pages, NUM_BASE
from crawler_spark.plans.crawl_job import CrawlJob

spark = get_spark("scaling-{cpus}", cores={cpus}, shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
docs = synthetic_docs_from_range(spark, {cards})
pages = build_pages(spark, "/root/testdata/sf0.1", include_fixtures=False,
                    docs_df=docs).repartition({cpus}, "url").persist()
n_pages = pages.count()  # corpus materialized OUTSIDE timing
robots = spark.createDataFrame(
    [("pet911.ru", "/admin", 1), ("cdn.pet911.ru", "/admin", 1)],
    "host string, disallow_prefix string, crawl_delay_ms int",
)
store = tempfile.mkdtemp(prefix="scaling_")
job = CrawlJob(spark, store, pages, wave_seconds={budget} // 1000, robots_df=robots,
               use_bloom=True, salted=False)
job.seed_range(NUM_BASE, NUM_BASE + {cards} - 1)
waves = []
while True:
    t0 = time.perf_counter()
    s = job.run_wave()
    dt = time.perf_counter() - t0
    if s.get("done"):
        break
    waves.append((s["fetched"], dt))
shutil.rmtree(store, ignore_errors=True)
spark.stop()
total_f = sum(f for f, _ in waves); total_s = sum(t for _, t in waves)
steady = waves[1:] if len(waves) > 1 else waves
st_f = sum(f for f, _ in steady); st_s = sum(t for _, t in steady)
print("RESULT " + json.dumps({{
    "cpus": {cpus}, "pages_in_corpus": n_pages, "waves": len(waves),
    "fetches": total_f, "seconds": round(total_s, 1),
    "pages_per_sec": round(total_f / total_s, 1),
    "steady_fetches": st_f, "steady_seconds": round(st_s, 1),
    "steady_pages_per_sec": round(st_f / st_s, 1),
}}))
"""


def run(cpus: int) -> dict:
    code = WORKER.format(repo=str(Path(__file__).resolve().parent.parent),
                         cpus=cpus, cards=CARDS, budget=BUDGET)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    results = {}
    for cpus in (8, 32):
        results[cpus] = run(cpus)
        print(json.dumps(results[cpus]))
    eff_total = results[32]["pages_per_sec"] / results[8]["pages_per_sec"] / 4
    eff_steady = (results[32]["steady_pages_per_sec"]
                  / results[8]["steady_pages_per_sec"] / 4)
    print(json.dumps({
        "cards": CARDS, "budget_per_wave": BUDGET,
        "efficiency_whole_job": round(eff_total, 3),
        "efficiency_steady_state": round(eff_steady, 3),
    }))


if __name__ == "__main__":
    main()
