"""foreachBatch exactly-once sink pattern: idempotent batch-id-keyed writes
(the guide's 'For exactly-once sinks: foreachBatch')."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from sparkfusion.streaming import read_events_stream, tumbling_window_agg


def test_foreach_batch_idempotent_sink(spark, sf_dir, tmp_path):
    out_dir = str(tmp_path / "sink")
    seen_batches: list[int] = []

    def sink(batch_df, batch_id: int) -> None:
        # idempotence: partition directory keyed by batch_id — a replayed
        # batch overwrites its own output instead of duplicating it
        if batch_id in seen_batches:
            return
        seen_batches.append(batch_id)
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/batch={batch_id}")

    agg = tumbling_window_agg(read_events_stream(spark, sf_dir))
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert seen_batches, "sink never invoked"
    written = spark.read.parquet(out_dir)
    # last batch holds the complete aggregation = the batch answer
    last = written.filter(F.col("batch_id") == max(seen_batches))
    batch_total = last.agg(F.sum("n_events").alias("n")).collect()[0].n
    from sparkfusion.session import table

    assert batch_total == table(spark, sf_dir, "events").count()
    assert pathlib.Path(out_dir).exists()


def test_aggregate_rollup_sink_replay_idempotent(spark, tmp_path):
    """Crash-replay safety: re-running the same batch id must overwrite its
    own version, not double-count (contrast a naive append sink)."""
    from pyspark.sql import functions as F

    from sparkfusion.streaming.cdc import AggregateRollupSink, read_snapshot

    path = str(tmp_path / "rollup")
    aggs_fn = lambda: {
        "total": ("sum", F.col("v").cast("decimal(18,6)")),
        "n": ("count", F.col("v")),
    }
    sink = AggregateRollupSink(spark, path, keys=["k"], aggs_fn=aggs_fn)
    b0 = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, v double")
    sink(b0, 0)
    first = {r["k"]: (float(r["total"]), r["n"]) for r in read_snapshot(spark, path).collect()}
    assert first == {"a": (3.0, 2), "b": (5.0, 1)}
    b1 = spark.createDataFrame([("a", 10.0)], "k string, v double")
    sink(b1, 1)
    second = {r["k"]: (float(r["total"]), r["n"]) for r in read_snapshot(spark, path).collect()}
    assert second == {"a": (13.0, 3), "b": (5.0, 1)}
    # crash-replay of batch 1: the ledger skips it -> no double counting
    sink(b1, 1)
    replayed = {r["k"]: (float(r["total"]), r["n"]) for r in read_snapshot(spark, path).collect()}
    assert replayed == second
