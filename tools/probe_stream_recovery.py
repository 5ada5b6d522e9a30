"""Streaming crash-recovery probe (r14 verdict #5): the last streaming claim
without an artifact was restart-from-checkpoint. This kills a
transformWithState query (ValueState + event-time timers —
``session_timeout_tws``) with SIGKILL after batch N commits, restarts it on
the SAME RocksDB checkpoint, and proves the final sink snapshot equals an
uninterrupted run's.

Why the final snapshots must be EXACTLY equal (not just same-distinct): the
file source pins each batch's file list in the checkpoint offsets log before
processing, so the restarted run replays the in-flight batch with the
identical files and re-plans the remainder in the same sorted order — batch
boundaries, watermark stepping, timer firings and therefore emissions are
all deterministic replicas of the uninterrupted run. The parquet FILE sink
is manifest-committed (_spark_metadata), so a batch that was mid-write at
kill time leaves only orphan files a manifest-aware read ignores —
end-to-end exactly-once, which the comparison verifies row-for-row.

Phases (each its own process → own JVM; the crash phase SIGKILLs its whole
process group, python driver + JVM, no cleanup):

  build      split sf1 events into 50 time-ordered files (reuses the
             probe_stream_ingest layout)
  ref        uninterrupted run → sink A, clean copy final_a
  crash N    run on checkpoint B / sink B; kill -9 the process group after
             batch N commits
  resume     restart on checkpoint B; finish; clean copy final_b
  compare    pyarrow row-set comparison of final_a vs final_b (exact)
  all [N]    orchestrate the above via subprocesses (default N=3)

Usage: python tools/probe_stream_recovery.py all
Solo rule: never run while another Spark JVM is up.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/repo/.localdata/stream_recovery"
SRC = "/root/repo/.localdata/stream50"  # built by probe_stream_ingest/build
FILES_PER_TRIGGER = 5
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _paths(run: str) -> tuple[str, str, str]:
    return (
        os.path.join(BASE, f"cp_{run}"),
        os.path.join(BASE, f"sink_{run}"),
        os.path.join(BASE, f"final_{run}"),
    )


def _start_query(spark, run: str):
    from pyspark.sql import functions as F

    from sparkfusion.session import _ensure_read_confs, table
    from sparkfusion.streaming.windows import _ts_convert, session_timeout_tws

    _ensure_read_confs(spark)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    static = table(spark, SRC, "events")
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
        .parquet(os.path.join(SRC, "events.parquet"))
        .withColumn("ts", _ts_convert(dict(static.dtypes)["ts"]))
    )
    sessions = session_timeout_tws(
        stream.withWatermark("ts", "1 hour").select(
            "user_id", "ts", F.unix_micros(F.col("ts")).alias("ts_us")
        ),
        gap_minutes=30,
    )
    cp, sink, _ = _paths(run)
    return (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", cp)
        .start()
    )


def _finish_and_copy(spark, run: str) -> int:
    """Read the sink through Spark (manifest-aware: orphan files from a
    killed mid-batch write are ignored) and persist a clean copy for the
    JVM-free compare phase."""
    _, sink, final = _paths(run)
    df = spark.read.parquet(sink)
    shutil.rmtree(final, ignore_errors=True)
    df.write.mode("overwrite").parquet(final)
    return spark.read.parquet(final).count()


def ref(spark) -> None:
    for p in _paths("a"):
        shutil.rmtree(p, ignore_errors=True)
    t0 = time.monotonic()
    q = _start_query(spark, "a")
    q.processAllAvailable()
    n_batches = (q.lastProgress or {}).get("batchId")
    q.stop()
    n = _finish_and_copy(spark, "a")
    print(
        f"REF done: {n} rows, last batch {n_batches}, "
        f"{round(time.monotonic() - t0, 1)}s",
        flush=True,
    )


def crash(spark, after_batch: int) -> None:
    for p in _paths("b"):
        shutil.rmtree(p, ignore_errors=True)
    q = _start_query(spark, "b")
    while q.isActive:
        lp = q.lastProgress
        if lp and lp.get("batchId", -1) >= after_batch:
            print(
                f"CRASH: batch {lp['batchId']} committed — SIGKILL process "
                f"group now (no stop(), no cleanup)",
                flush=True,
            )
            sys.stdout.flush()
            os.killpg(os.getpgrp(), signal.SIGKILL)
        time.sleep(0.05)
    raise RuntimeError("stream finished before the kill batch — raise N")


def resume(spark) -> None:
    t0 = time.monotonic()
    q = _start_query(spark, "b")  # same checkpoint dir: recovery path
    q.processAllAvailable()
    start_batch = next(
        (p["batchId"] for p in q.recentProgress if p.get("numInputRows")), None
    )
    last = (q.lastProgress or {}).get("batchId")
    q.stop()
    n = _finish_and_copy(spark, "b")
    print(
        f"RESUME done: {n} rows, batches resumed at ~{start_batch} → {last}, "
        f"{round(time.monotonic() - t0, 1)}s",
        flush=True,
    )


def compare() -> int:
    """JVM-free exact comparison; also reports raw-row duplicates (there
    must be none: the manifest-committed file sink is exactly-once)."""
    from collections import Counter

    import pyarrow.parquet as pq

    def rows(run: str) -> Counter:
        _, _, final = _paths(run)
        tbl = pq.read_table(final)
        cols = sorted(tbl.column_names)
        data = [tbl.column(c).to_pylist() for c in cols]
        return Counter(zip(*data))

    ra, rb = rows("a"), rows("b")
    only_a = ra - rb
    only_b = rb - ra
    dup_b = {k: c for k, c in rb.items() if c > ra.get(k, 0)}
    out = {
        "ref_rows": sum(ra.values()),
        "recovered_rows": sum(rb.values()),
        "distinct_ref": len(ra),
        "distinct_recovered": len(rb),
        "only_in_ref": sum(only_a.values()),
        "only_in_recovered": sum(only_b.values()),
        "extra_multiplicity_after_recovery": sum(dup_b.values()),
        "exact_match": ra == rb,
    }
    print(json.dumps(out, indent=1), flush=True)
    if not out["exact_match"]:
        print("MISMATCH — restart-from-checkpoint is NOT exactly-once here")
        for k in list((only_a + only_b).keys())[:5]:
            print("  diff row:", k)
        return 1
    print("EXACT MATCH: crash+restart snapshot == uninterrupted snapshot")
    return 0


def orchestrate(after_batch: int) -> int:
    me = os.path.abspath(__file__)
    if not os.path.isdir(os.path.join(SRC, "events.parquet")):
        subprocess.run(
            [sys.executable, "tools/probe_stream_ingest.py", "build"],
            check=True, cwd="/root/repo",
        )
    subprocess.run([sys.executable, me, "ref"], check=True)
    p = subprocess.run(
        [sys.executable, me, "crash", str(after_batch)], start_new_session=True
    )
    print(f"crash phase exited rc={p.returncode} (expect -9/SIGKILL)", flush=True)
    if p.returncode == 0:
        raise RuntimeError("crash phase exited cleanly — it was supposed to die")
    subprocess.run([sys.executable, me, "resume"], check=True)
    return compare()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "compare":
        sys.exit(compare())
    elif mode == "all":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        sys.exit(orchestrate(n))
    else:
        from sparkfusion.session import get_session

        spark = get_session(f"recovery-{mode}")
        if mode == "ref":
            ref(spark)
        elif mode == "crash":
            crash(spark, int(sys.argv[2]))
        elif mode == "resume":
            resume(spark)
        else:
            sys.exit(f"unknown mode {mode}")
