"""Two-parallelism scaling evidence for BENCH/BASELINE.md (north_rule).

No real cluster exists in this sandbox, so the N→4N-executor criterion is
evidenced by running the SAME job on the SAME input at local[8] and
local[32], each in its own subprocess/JVM.  The host is a shared VM with
visible noisy-neighbor variance, so runs are INTERLEAVED (8,32,8,32,…) and
medians reported, and each run also reports the system CPU-busy fraction
(/proc/stat) so throttled runs are visible in the raw data.

Two workloads:

* ``crawl``    — the full CrawlJob (seed → politeness → fetch-as-join →
  parse UDF → photo fan-out/validate → snapshot commits), pages/sec.
* ``frontier`` — the pure-JVM frontier pipeline (range gen → seen anti-join
  → salted politeness selection → count), frontier-URLs/sec; isolates the
  codegen path from Python-worker effects.

Usage: python tools/scaling_bench.py [cards] [frontier_urls] [repeats]
Prints one JSON line per run + a summary line per workload.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

# SPARK_GRAFT_SCALING_MODE=cluster runs each rung as local-cluster[N,8,mem]
# — N separate executor JVMs, EACH WITH ITS OWN PYTHON WORKER POOL — the
# closest sandbox analog of N→4N real executors, and the direct test of the
# three-round hypothesis that the crawl job's sub-0.8 local[N] efficiency is
# a single-JVM shared-worker-pool artifact (VERDICT r03 Next #4).  In this
# mode N_LO/N_HI are EXECUTOR COUNTS (default 1 vs 4, 8 cores each).
CLUSTER = os.environ.get("SPARK_GRAFT_SCALING_MODE") == "cluster"
EXEC_CORES = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "8"))
EXEC_MEM_MB = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "12288"))

CARDS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
FRONTIER_URLS = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
N_LO = int(sys.argv[4]) if len(sys.argv) > 4 else (1 if CLUSTER else 2)
N_HI = int(sys.argv[5]) if len(sys.argv) > 5 else (4 if CLUSTER else 8)

WORKER = r"""
import json, sys, time, tempfile, shutil, os
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = str({cpus})
master = {master!r}
if master:
    os.environ["SPARK_GRAFT_MASTER"] = master
    os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = {exec_mem_mb!r} + "m"
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
from crawler_spark.session import get_spark
from pyspark.sql import functions as F

def cpu_counters():
    parts = open("/proc/stat").readline().split()[1:]
    vals = list(map(int, parts))
    return sum(vals), vals[3] + vals[4]   # total, idle

spark = get_spark("scaling-{cpus}", cores={cpus}, shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")

mode = {mode!r}
if mode == "crawl":
    from crawler_spark.sources.pages import synthetic_docs_from_range, build_pages, NUM_BASE
    from crawler_spark.plans.crawl_job import CrawlJob
    # untimed warmup: JVM codegen + python workers + store paths
    wdocs = synthetic_docs_from_range(spark, 2000)
    wpages = build_pages(spark, "/root/testdata/sf0.1", include_fixtures=False,
                         docs_df=wdocs).persist()
    wpages.count()
    wstore = tempfile.mkdtemp(prefix="scaling_warm_")
    wjob = CrawlJob(spark, wstore, wpages, wave_seconds=3600 * 1000,
                    robots_df=None, use_bloom=True, salted=True)
    wjob.seed_range(NUM_BASE, NUM_BASE + 1999)
    wjob.crawl()
    shutil.rmtree(wstore, ignore_errors=True)
    wpages.unpersist()
    docs = synthetic_docs_from_range(spark, {cards})
    pages = build_pages(spark, "/root/testdata/sf0.1", include_fixtures=False,
                        docs_df=docs).repartition({cpus}, "url").persist()
    pages.count()
    robots = spark.createDataFrame(
        [("pet911.ru", "/admin", 1), ("cdn.pet911.ru", "/admin", 1)],
        "host string, disallow_prefix string, crawl_delay_ms int")
    store = tempfile.mkdtemp(prefix="scaling_")
    job = CrawlJob(spark, store, pages, wave_seconds=3600 * 1000,
                   robots_df=robots, use_bloom=True, salted=True)
    a0, i0 = cpu_counters(); t0 = time.perf_counter()
    job.seed_range(NUM_BASE, NUM_BASE + {cards} - 1)
    stats = job.crawl()
    dt = time.perf_counter() - t0; a1, i1 = cpu_counters()
    shutil.rmtree(store, ignore_errors=True)
    units = sum(s["fetched"] for s in stats)
    steps = {{}}
    for s in stats:
        for k, v in s.get("step_seconds", {{}}).items():
            steps[k] = round(steps.get(k, 0.0) + v, 2)
else:
    from crawler_spark.operators.politeness import select_wave_salted
    from crawler_spark.operators.seen import filter_unseen
    from crawler_spark.sources.frontier import frontier_from_range
    n_ids = {frontier_urls} // 2

    def pipeline(n):
        frontier = frontier_from_range(spark, 1, n)
        seen = frontier.where(F.col("num") % 3 == 0).select("url_hash")
        pending = filter_unseen(frontier, seen)
        picked = select_wave_salted(pending, wave_seconds=3600, n_salts=16,
                                    hot_host_threshold=10_000)
        picked.where(F.col("selected")).count()

    pipeline(50_000)          # untimed warmup: codegen + shuffle paths
    a0, i0 = cpu_counters(); t0 = time.perf_counter()
    pipeline(n_ids)
    dt = time.perf_counter() - t0; a1, i1 = cpu_counters()
    units = {frontier_urls}
    steps = {{}}

busy = 1 - (i1 - i0) / max(a1 - a0, 1)
spark.stop()
print("RESULT " + json.dumps({{
    "mode": mode, "cpus": {cpus}, "units": units,
    "seconds": round(dt, 1), "per_sec": round(units / dt, 1),
    "cpu_busy_cores": round(busy * 32, 1), "steps": steps,
}}))
"""


def run(cpus: int, mode: str) -> dict:
    if CLUSTER:
        master = f"local-cluster[{cpus},{EXEC_CORES},{EXEC_MEM_MB}]"
        total_cores = cpus * EXEC_CORES
    else:
        master = ""
        total_cores = cpus
    code = WORKER.format(repo=str(Path(__file__).resolve().parent.parent),
                         cpus=total_cores, cards=CARDS,
                         frontier_urls=FRONTIER_URLS, mode=mode,
                         master=master, exec_mem_mb=str(EXEC_MEM_MB))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            print(json.dumps(r), flush=True)
            return r
    raise RuntimeError(
        f"no RESULT from {master or f'local[{cpus}]'} {mode}:\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    # SPARK_GRAFT_SCALING_MODES=crawl (or frontier) runs just that workload
    modes = tuple(
        os.environ.get("SPARK_GRAFT_SCALING_MODES", "frontier,crawl").split(",")
    )
    for mode in modes:
        runs: dict[int, list[float]] = {N_LO: [], N_HI: []}
        for _ in range(REPEATS):          # interleaved A/B to ride out drift
            for cpus in (N_LO, N_HI):
                runs[cpus].append(run(cpus, mode)["per_sec"])
        med_lo = statistics.median(runs[N_LO])
        med_hi = statistics.median(runs[N_HI])
        print(json.dumps({
            "mode": mode, f"median_{N_LO}": med_lo, f"median_{N_HI}": med_hi,
            f"all_{N_LO}": runs[N_LO], f"all_{N_HI}": runs[N_HI],
            f"efficiency_{N_LO}_to_{N_HI}": round(
                med_hi / med_lo / (N_HI / N_LO), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
