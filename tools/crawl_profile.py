"""Per-stage profile of one CrawlJob run, from the Spark event log.

Answers the question the two-parallelism telemetry can't: WHICH stages
carry the wall-clock, how many tasks they run, and whether their task
counts grow with cores — i.e. whether a non-scaling step is Amdahl
(serial driver work), under-partitioning (few tasks on many cores), or
genuine distributed work that the host can't parallelize further.

Usage: python tools/crawl_profile.py [cards] [cores]
Prints one line per stage (sorted by stage wall-clock desc, top 25):
  wall_s  tasks  sum_task_s  max_task_s  py_s  name
plus a JOBS section mapping job group/description to wall-clock.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CARDS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main() -> None:
    evdir = tempfile.mkdtemp(prefix="spark_events_")
    os.environ["SPARK_GRAFT_CPUS"] = str(CORES)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from pyspark.sql import SparkSession

    from crawler_spark.session import _export_package_path

    _export_package_path()
    spark = (
        SparkSession.builder.master(f"local[{CORES}]")
        .appName("crawl-profile")
        .config("spark.sql.shuffle.partitions", str(CORES))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled",
                os.environ.get("PROFILE_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ["SPARK_GRAFT_DRIVER_MEM"])
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.compression.codec", "none")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import shutil

    from crawler_spark.sources.pages import (NUM_BASE, build_pages,
                                             synthetic_docs_from_range)
    from crawler_spark.plans.crawl_job import CrawlJob

    # untimed warmup — same shape as tools/scaling_bench.py
    wdocs = synthetic_docs_from_range(spark, 2000)
    wpages = build_pages(spark, "/root/testdata/sf0.1",
                         include_fixtures=False, docs_df=wdocs).persist()
    wpages.count()
    wstore = tempfile.mkdtemp(prefix="profile_warm_")
    wjob = CrawlJob(spark, wstore, wpages, wave_seconds=3600 * 1000,
                    robots_df=None, use_bloom=True, salted=True)
    wjob.seed_range(NUM_BASE, NUM_BASE + 1999)
    wjob.crawl()
    shutil.rmtree(wstore, ignore_errors=True)
    wpages.unpersist()

    docs = synthetic_docs_from_range(spark, CARDS)
    pages = build_pages(spark, "/root/testdata/sf0.1", include_fixtures=False,
                        docs_df=docs).repartition(CORES, "url").persist()
    pages.count()
    robots = spark.createDataFrame(
        [("pet911.ru", "/admin", 1), ("cdn.pet911.ru", "/admin", 1)],
        "host string, disallow_prefix string, crawl_delay_ms int")
    store = tempfile.mkdtemp(prefix="crawl_profile_")
    job = CrawlJob(spark, store, pages, wave_seconds=3600 * 1000,
                   robots_df=robots, use_bloom=True, salted=True)
    t0 = time.perf_counter()
    t_start_ms = time.time() * 1e3
    job.seed_range(NUM_BASE, NUM_BASE + CARDS - 1)
    stats = job.crawl()
    wall = time.perf_counter() - t0
    steps = {}
    for s in stats:
        for k, v in s.get("step_seconds", {}).items():
            steps[k] = round(steps.get(k, 0.0) + v, 2)
    spark.stop()
    shutil.rmtree(store, ignore_errors=True)

    stages: dict[int, dict] = {}
    for ev_file in sorted(Path(evdir).rglob("*")):
        if not ev_file.is_file() or "appstatus" in ev_file.name:
            continue
        for line in ev_file.read_text().splitlines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                if sub and sub < t_start_ms:      # warmup stage — drop it
                    stages.pop(sid, None)
                    continue
                st = stages.setdefault(sid, {"sum_task": 0.0, "py": 0.0,
                                             "max_task": 0.0, "n": 0})
                st["name"] = si["Stage Name"]
                st["tasks"] = si["Number of Tasks"]
                st["wall"] = (comp - sub) / 1e3 if sub and comp else 0.0
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {"sum_task": 0.0, "py": 0.0,
                                             "max_task": 0.0, "n": 0})
                m = ev.get("Task Metrics") or {}
                rt = (m.get("Executor Run Time") or 0) / 1e3
                st["sum_task"] += rt
                st["max_task"] = max(st["max_task"], rt)
                st["n"] += 1
                for acc in ev.get("Task Info", {}).get("Accumulables", []):
                    # BasePythonRunner's "time to run" accumulator names
                    if "python" in str(acc.get("Name", "")).lower():
                        try:
                            st["py"] += float(acc.get("Update", 0)) / 1e3
                        except (TypeError, ValueError):
                            pass

    print(f"\ncards={CARDS} cores={CORES} crawl_wall={wall:.1f}s "
          f"steps={json.dumps(steps)}")
    print(f"{'wall_s':>7} {'tasks':>5} {'sum_task_s':>10} {'max_task_s':>10} "
          f"{'py_s':>7}  name")
    stages = {k: v for k, v in stages.items() if "name" in v}
    total_wall = 0.0
    for sid, st in sorted(stages.items(), key=lambda kv: -kv[1].get("wall", 0)):
        total_wall += st.get("wall", 0.0)
    for sid, st in sorted(stages.items(),
                          key=lambda kv: -kv[1].get("wall", 0))[:25]:
        print(f"{st.get('wall', 0):7.2f} {st.get('tasks', st['n']):5d} "
              f"{st['sum_task']:10.2f} {st['max_task']:10.2f} "
              f"{st['py']:7.2f}  {st.get('name', '?')[:90]}")
    print(f"sum of stage walls: {total_wall:.1f}s vs crawl wall {wall:.1f}s "
          f"(gap = driver-side / scheduling / non-stage time)")


if __name__ == "__main__":
    main()
