"""Hive-style partitioned writes + partition pruning — the directory-layout
scale lever (PartitionFilters in the scan, not data filters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkfusion.session import events_with_ts, table
from sparkfusion.sources import write_parquet


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value", "event_type")
    write_parquet(ev, out, partition_by=["event_type"])

    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    back.collect()
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter must be a PartitionFilter (directory pruning), not a data filter
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert back.count() == ev.filter("event_type = 'purchase'").count()


def test_sorted_write_rowgroup_stats(spark, sf_dir, tmp_path):
    # sortWithinPartitions before write clusters values so parquet row-group
    # min/max stats make range predicates selective at read time
    out = str(tmp_path / "li_sorted")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    li.sortWithinPartitions("l_orderkey").write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out).filter(F.col("l_orderkey") < 100)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]" in plan
    assert back.count() == li.filter("l_orderkey < 100").count()


def test_dynamic_partition_overwrite_replaces_only_touched_days(spark, tmp_path):
    from sparkfusion.sources.writers import overwrite_partitions

    path = str(tmp_path / "daily")
    full = spark.createDataFrame(
        [("d1", 1), ("d1", 2), ("d2", 3), ("d3", 4)], "day string, v int"
    )
    overwrite_partitions(full, path, ["day"])
    # backfill ONLY d2 with corrected rows
    fix = spark.createDataFrame([("d2", 99), ("d2", 100)], "day string, v int")
    overwrite_partitions(fix, path, ["day"])
    got = {(r["day"], r["v"]) for r in spark.read.parquet(path).collect()}
    # d1/d3 untouched, d2 fully replaced (no duplicates from the re-run)
    assert got == {("d1", 1), ("d1", 2), ("d2", 99), ("d2", 100), ("d3", 4)}
    # idempotent: re-running the same backfill changes nothing
    overwrite_partitions(fix, path, ["day"])
    assert {(r["day"], r["v"]) for r in spark.read.parquet(path).collect()} == got
