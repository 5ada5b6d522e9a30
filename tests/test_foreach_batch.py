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
