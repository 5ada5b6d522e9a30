"""Streaming CDC upsert sink: versioned copy-on-write snapshot semantics,
replay idempotence, and foreachBatch wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkfusion.streaming.cdc import ParquetUpsertSink, latest_version, read_snapshot


def _chg(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, op string")


def test_upsert_sink_versions_and_merge(spark, tmp_path):
    path = str(tmp_path / "snap")
    sink = ParquetUpsertSink(spark, path, keys=["k"])

    sink(_chg(spark, [(1, "a", "U"), (2, "b", "U")]), 0)
    assert latest_version(path) == 0
    assert {r.k: r.v for r in read_snapshot(spark, path).collect()} == {1: "a", 2: "b"}

    # batch 1: update 1, delete 2, insert 3
    sink(_chg(spark, [(1, "a2", "U"), (2, None, "D"), (3, "c", "U")]), 1)
    assert latest_version(path) == 1
    assert {r.k: r.v for r in read_snapshot(spark, path).collect()} == {1: "a2", 3: "c"}


def test_upsert_sink_replay_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "snap")
    sink = ParquetUpsertSink(spark, path, keys=["k"])
    sink(_chg(spark, [(1, "a", "U")]), 0)
    sink(_chg(spark, [(1, "a2", "U")]), 1)
    # crash-replay of batch 1 (same id) must not re-apply or fork a version
    sink(_chg(spark, [(1, "DIFFERENT", "U")]), 1)
    assert latest_version(path) == 1
    assert {r.k: r.v for r in read_snapshot(spark, path).collect()} == {1: "a2"}


def test_upsert_sink_empty_before_first_commit(spark, tmp_path):
    path = str(tmp_path / "nothing")
    assert latest_version(path) is None
    assert read_snapshot(spark, path) is None


def test_upsert_sink_from_stream(spark, tmp_path):
    # end-to-end foreachBatch wiring: a file change-feed applied as one batch
    feed = str(tmp_path / "feed")
    _chg(
        spark, [(1, "x", "U"), (2, "y", "U"), (2, None, "D"), (3, "z", "U")]
    ).limit(0).write.mode("overwrite").parquet(feed)  # pin schema dir first
    _chg(spark, [(1, "x", "U"), (2, None, "D"), (3, "z", "U")]).write.mode(
        "append"
    ).parquet(feed)

    path = str(tmp_path / "snap")
    sink = ParquetUpsertSink(spark, path, keys=["k"])
    stream = spark.readStream.schema("k long, v string, op string").parquet(feed)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    snap = read_snapshot(spark, path)
    assert {r.k: r.v for r in snap.collect()} == {1: "x", 3: "z"}


def test_snapshot_diff_merge_roundtrip(spark):
    """merge(old, diff(old, new)) == new — diff is merge's exact inverse."""
    from sparkfusion.operators.merge import merge_upsert, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )
    new = spark.createDataFrame(
        [(2, "b", 99.0), (3, "c", 30.0), (4, "d", 40.0)], "k int, s string, v double"
    )
    diff = snapshot_diff(old, new, ["k"], ["s", "v"])
    ops = {r["k"]: r["op"] for r in diff.collect()}
    assert ops == {1: "D", 2: "U", 4: "I"}  # 3 unchanged -> absent
    rebuilt = merge_upsert(old, diff, keys=["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_snapshot_diff_null_safe_compare(spark):
    from sparkfusion.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "x")], "k int, s string")
    new = spark.createDataFrame([(1, None), (2, None)], "k int, s string")
    out = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"], ["s"]).collect()}
    # NULL == NULL is "unchanged" (eqNullSafe); value->NULL is an update
    assert out == {2: "U"}


def _ev(spark, rows):
    return spark.createDataFrame(rows, "k long, ts long, v string")


def test_keep_latest_sink_order_independent(spark, tmp_path):
    """Latest-wins merge must produce the same snapshot whatever the batch
    arrival order — the property that makes stream_cdc_keep_latest
    batch-oracle-checkable under nondeterministic file listing."""
    from sparkfusion.streaming.cdc import KeepLatestSink

    b0 = [(1, 10, "old1"), (2, 30, "new2")]
    b1 = [(1, 20, "new1"), (2, 5, "old2"), (3, 1, "only3")]
    expect = {1: (20, "new1"), 2: (30, "new2"), 3: (1, "only3")}

    for order in ([(0, b0), (1, b1)], [(0, b1), (1, b0)]):
        path = str(tmp_path / f"snap_{order[0][1][0][2]}")
        sink = KeepLatestSink(spark, path, keys=["k"], order_by=["ts"])
        for bid, rows in order:
            sink(_ev(spark, rows), bid)
        got = {r.k: (r.ts, r.v) for r in read_snapshot(spark, path).collect()}
        assert got == expect


def test_keep_latest_sink_replay_and_intrabatch_dups(spark, tmp_path):
    from sparkfusion.streaming.cdc import KeepLatestSink

    path = str(tmp_path / "snap")
    sink = KeepLatestSink(spark, path, keys=["k"], order_by=["ts"])
    # duplicate keys INSIDE one batch: the per-batch compaction must pick ts=9
    sink(_ev(spark, [(1, 3, "a"), (1, 9, "b"), (1, 7, "c")]), 0)
    assert {r.k: r.v for r in read_snapshot(spark, path).collect()} == {1: "b"}
    # replayed batch id: skipped, even with different content
    sink(_ev(spark, [(1, 99, "GHOST")]), 0)
    assert latest_version(path) == 0
    assert {r.k: r.v for r in read_snapshot(spark, path).collect()} == {1: "b"}


def test_vacuum_keeps_committed_and_inflight(spark, tmp_path):
    """GC must retain the committed version (+history budget), never touch
    versions NEWER than the marker (in-flight writes), and stay a no-op
    before the first commit."""
    import os

    from sparkfusion.streaming.cdc import KeepLatestSink, vacuum_versions

    path = str(tmp_path / "snap")
    assert vacuum_versions(path) == []  # no marker yet — caller's dir absent

    sink = KeepLatestSink(spark, path, keys=["k"], order_by=["ts"])
    for bid in range(4):
        sink(_ev(spark, [(1, bid, f"v{bid}")]), bid)
    # fake an in-flight (uncommitted) newer version directory
    os.makedirs(os.path.join(path, "v9"))

    removed = vacuum_versions(path, keep_last=2)
    assert removed == ["v0", "v1"]
    left = sorted(n for n in os.listdir(path) if n.startswith("v"))
    assert left == ["v2", "v3", "v9"]
    # snapshot still readable at the committed version
    assert {r.k: r.v for r in read_snapshot(spark, path).collect()} == {1: "v3"}


def test_time_travel_guards(spark, tmp_path):
    import pytest as _pytest

    from sparkfusion.streaming.cdc import (
        KeepLatestSink,
        read_snapshot_at,
        vacuum_versions,
    )

    path = str(tmp_path / "snap")
    with _pytest.raises(ValueError):
        read_snapshot_at(spark, path, 0)  # nothing committed yet
    sink = KeepLatestSink(spark, path, keys=["k"], order_by=["ts"])
    for bid in range(3):
        sink(_ev(spark, [(1, bid, f"v{bid}")]), bid)
    assert {r.v for r in read_snapshot_at(spark, path, 0).collect()} == {"v0"}
    assert {r.v for r in read_snapshot_at(spark, path, 2).collect()} == {"v2"}
    with _pytest.raises(ValueError):
        read_snapshot_at(spark, path, 9)  # newer than the marker
    vacuum_versions(path, keep_last=1)
    with _pytest.raises(ValueError):
        read_snapshot_at(spark, path, 0)  # vacuumed away
