"""Sustained-ingest probe for the transformWithState family (r13 verdict
#4): the bench's net-of-startup column proves fixed costs are isolated, but
no artifact showed STATE GROWTH under sustained input. This drives the
typed-state queries over sf1 events split into ~50 part files at
``maxFilesPerTrigger=5`` (10 real micro-batches) and records, per batch,
the trigger wall, state rows, and state-store bytes from the streaming
progress feed — flat per-batch wall with bounded state is the scale claim
made measurable; a superlinear trend is a defect to diagnose.

Usage: python tools/probe_stream_ingest.py [build|run|all]   (default all)
Solo rule: never run while another Spark JVM is up.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

from sparkfusion.session import get_session, table  # noqa: E402
from sparkfusion.streaming.windows import _ts_convert  # noqa: E402

SRC = "/root/repo/.localdata/sf1"
DST = "/root/repo/.localdata/stream50"
N_FILES = 50
FILES_PER_TRIGGER = 5

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def build(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    ev = table(spark, SRC, "events")
    # sort by ts so file order ~ event-time order (the realistic ingest
    # shape for watermark/timer behavior); repartitionByRange keeps files
    # time-contiguous
    ev.repartitionByRange(N_FILES, "ts").write.mode("overwrite").parquet(
        os.path.join(DST, "events.parquet")
    )
    n = spark.read.parquet(os.path.join(DST, "events.parquet")).count()
    print(f"built {DST}/events.parquet: {n} rows in {N_FILES} files", flush=True)


def _events_stream(spark, files_per_trigger: int):
    from sparkfusion.session import _ensure_read_confs

    _ensure_read_confs(spark)
    static = table(spark, DST, "events")
    return (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .parquet(os.path.join(DST, "events.parquet"))
        .withColumn("ts", _ts_convert(dict(static.dtypes)["ts"]))
    )


def _drive(spark, label: str, transform, output_mode: str) -> dict:
    """Run stream to a memory sink batch-by-batch; return per-batch stats."""
    part_key = "spark.sql.shuffle.partitions"
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev_parts = spark.conf.get(part_key, None)
    prev_prov = spark.conf.get(prov_key, None)
    name = f"ingest_{uuid.uuid4().hex[:8]}"
    try:
        spark.conf.set(part_key, str(spark.sparkContext.defaultParallelism))
        spark.conf.set(prov_key, ROCKSDB)
        stream = _events_stream(spark, FILES_PER_TRIGGER)
        t0 = time.monotonic()
        q = (
            transform(stream)
            .writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            wall = round(time.monotonic() - t0, 1)
            batches = []
            for p in q.recentProgress:
                ops = p.get("stateOperators") or [{}]
                op = ops[0]
                cm = op.get("customMetrics") or {}
                batches.append(
                    {
                        "batch": p.get("batchId"),
                        "rows_in": p.get("numInputRows"),
                        "trigger_ms": (p.get("durationMs") or {}).get(
                            "triggerExecution"
                        ),
                        "state_rows": op.get("numRowsTotal"),
                        "state_bytes": op.get("stateMemory")
                        or cm.get("rocksdbTotalMemoryUsageBytes"),
                        "sst_bytes": cm.get("rocksdbSstFileSize"),
                    }
                )
        finally:
            q.stop()
        out_rows = spark.table(name).count()
    finally:
        for key, prev in ((part_key, prev_parts), (prov_key, prev_prov)):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    rec = {"label": label, "wall": wall, "out_rows": out_rows, "batches": batches}
    walls = [b["trigger_ms"] for b in batches if b["trigger_ms"]]
    print(f"{label}: wall {wall}s, {len(batches)} batches, out {out_rows}; "
          f"per-batch ms {walls}", flush=True)
    return rec


def run(spark) -> None:
    from sparkfusion.streaming.windows import (
        recent_events_tws,
        session_timeout_tws,
        stateful_user_counts_tws,
        user_type_counts_tws,
    )

    from pyspark.sql import functions as F

    cases = {
        "value_state_counts": (stateful_user_counts_tws, "update"),
        "list_state_recent": (
            lambda s: recent_events_tws(
                s.select(
                    "user_id",
                    F.unix_micros(F.col("ts")).alias("ts_us"),
                    "event_id",
                ),
                k=3,
            ),
            "update",
        ),
        "map_state_type_counts": (
            lambda s: user_type_counts_tws(s.select("user_id", "event_type")),
            "update",
        ),
        # mirror the suite entry exactly: watermark on ts, plus the
        # epoch-us twin column the processor's state schema uses
        "timer_session_timeout": (
            lambda s: session_timeout_tws(
                s.withWatermark("ts", "1 hour").select(
                    "user_id", "ts",
                    F.unix_micros(F.col("ts")).alias("ts_us"),
                ),
                gap_minutes=30,
            ),
            "append",
        ),
    }
    only = set(sys.argv[2:])
    results = [
        _drive(spark, label, fn, mode)
        for label, (fn, mode) in cases.items()
        if not only or label in only
    ]
    with open("/tmp/probe_stream_ingest.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/probe_stream_ingest.json", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_session("probe-stream-ingest")
    if mode in ("build", "all"):
        build(spark)
    if mode in ("run", "all"):
        run(spark)
