"""Per-stage profiler for optimization rounds — runs suite queries on a
UI-enabled session and prints each query's stage-level metrics from the
Spark REST API (executorRunTime, task count, shuffle read/write, input
bytes), i.e. the guide §1/§7 empirical loop without a browser.

Usage:
    python tools/profile_query.py <query> [<query> ...] [--sf DIR]

NOT an artifact generator; single warm run per query (timing here is NOT
bench-comparable — use tools/ab_time.py for numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4050


def _rest(path: str):
    with urllib.request.urlopen(f"http://127.0.0.1:{UI_PORT}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--sf":
            sf_dir = argv[i + 1]
            names.remove(argv[i + 1])
    if not names:
        sys.exit("usage: profile_query.py <query> [...] [--sf DIR]")

    from pyspark.sql import SparkSession

    from sparkfusion.session import get_session

    # UI must be on BEFORE the JVM starts; get_session's other confs apply
    SparkSession.builder.config("spark.ui.enabled", "true").config(
        "spark.ui.port", str(UI_PORT)
    )
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    cpus = os.environ["SPARK_GRAFT_CPUS"]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sparkfusion-profile")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.driver.maxResultSize", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId

    from sparkfusion.suite import queries

    qs = queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    for name in names:
        fn = qs[name]
        # warm-up (scan caching, codegen) so the profiled run is steady-state
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        jobs_before = {j["jobId"] for j in _rest(f"applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)

        jobs = [
            j
            for j in _rest(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: wall={wall:.3f}s, jobs={len(jobs)}, "
              f"stages={len(stage_ids)} ===")
        rows = []
        for sid in stage_ids:
            try:
                for att in _rest(f"applications/{app_id}/stages/{sid}"):
                    rows.append(att)
            except Exception:
                continue
        rows.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"{'stage':>6} {'tasks':>5} {'runTime_s':>9} {'cpuTime_s':>9} "
              f"{'input_MB':>8} {'shufR_MB':>8} {'shufW_MB':>8}  name")
        for s in rows[:14]:
            print(
                f"{s['stageId']:>6} {s.get('numCompleteTasks', 0):>5} "
                f"{(s.get('executorRunTime') or 0) / 1e3:>9.2f} "
                f"{(s.get('executorCpuTime') or 0) / 1e9:>9.2f} "
                f"{(s.get('inputBytes') or 0) / 1e6:>8.1f} "
                f"{(s.get('shuffleReadBytes') or 0) / 1e6:>8.1f} "
                f"{(s.get('shuffleWriteBytes') or 0) / 1e6:>8.1f}  "
                f"{(s.get('name') or '')[:60]}"
            )
        total_rt = sum((s.get("executorRunTime") or 0) for s in rows) / 1e3
        print(f"sum executorRunTime={total_rt:.2f}s over {len(rows)} stages "
              f"(wall*32={wall * 32:.1f}s core-capacity)")


if __name__ == "__main__":
    main()
