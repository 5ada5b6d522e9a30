"""As-of join and range join operator semantics on controlled fixtures."""

from __future__ import annotations

from sparkfusion.operators.temporal import as_of_join, range_join_bucketed


def test_asof_basic_and_tie(spark):
    left = spark.createDataFrame(
        [("u1", 100, "a"), ("u1", 205, "b"), ("u2", 100, "c")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 100, 1.0), ("u1", 200, 2.0), ("u1", 300, 3.0)],
        "k string, ts long, v double",
    )
    out = {
        (r.k, r.ts): r.v
        for r in as_of_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    }
    assert out[("u1", 100)] == 1.0  # tie: right row AT left ts is visible
    assert out[("u1", 205)] == 2.0  # most recent prior, not 3.0
    assert out[("u2", 100)] is None  # no right rows for key -> NULL


def test_asof_no_lookahead(spark):
    left = spark.createDataFrame([("u1", 50, "early")], "k string, ts long, tag string")
    right = spark.createDataFrame([("u1", 60, 9.0)], "k string, ts long, v double")
    rows = as_of_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    assert rows[0].v is None  # future right rows never leak backward


def test_range_join_bucketed_exact(spark):
    points = spark.createDataFrame([(1, 5), (2, 15), (3, 25), (4, 250)], "pid long, t long")
    intervals = spark.createDataFrame(
        [(10, 0, 20), (11, 14, 30)], "iid long, s long, e long"
    )
    out = sorted(
        (r.pid, r.iid)
        for r in range_join_bucketed(points, intervals, "t", "s", "e", bucket_width=10).collect()
    )
    # t=5 in [0,20]; t=15 in both; t=25 in [14,30]; t=250 in none
    assert out == [(1, 10), (2, 10), (2, 11), (3, 11)]


def test_range_join_interval_spanning_many_buckets(spark):
    points = spark.createDataFrame([(1, 95)], "pid long, t long")
    intervals = spark.createDataFrame([(7, 0, 100)], "iid long, s long, e long")
    out = range_join_bucketed(points, intervals, "t", "s", "e", bucket_width=10).collect()
    assert len(out) == 1  # exploded to 11 buckets but deduped by the equi-join+filter


def test_interval_overlap_join_canonical_bucket_no_dupes(spark):
    from sparkfusion.operators.temporal import interval_overlap_join

    # intervals spanning MANY buckets still emit each overlapping pair once
    left = spark.createDataFrame([(1, 0, 1000), (2, 500, 600), (3, 2000, 2100)],
                                 "l_id int, ls long, le long")
    right = spark.createDataFrame([(10, 900, 2050), (20, 650, 700), (30, 5000, 6000)],
                                  "r_id int, rs long, re long")
    out = interval_overlap_join(left, right, "ls", "le", "rs", "re", bucket_width=100)
    pairs = sorted((r["l_id"], r["r_id"]) for r in out.collect())
    # 1-10 overlap [900,1000]; 1-20 ([650,700] inside [0,1000]); 2-20 none
    # (600 < 650); 3-10 overlap [2000,2050]
    assert pairs == [(1, 10), (1, 20), (3, 10)]
    # exactly once each despite interval 10 covering ~12 buckets
    assert out.count() == 3


def test_interval_overlap_touching_endpoints_count(spark):
    from sparkfusion.operators.temporal import interval_overlap_join

    left = spark.createDataFrame([(1, 0, 100)], "l_id int, ls long, le long")
    right = spark.createDataFrame([(10, 100, 200), (20, 101, 300)],
                                  "r_id int, rs long, re long")
    out = interval_overlap_join(left, right, "ls", "le", "rs", "re", bucket_width=50)
    # closed-interval semantics: touching at a point IS an overlap
    assert sorted(r["r_id"] for r in out.collect()) == [10]


def test_w7_running_distinct_brute_force(spark, sf_dir):
    """Suite w7 (first-occurrence marker + running sum) vs per-user brute
    force over the collected sf0.001 events."""
    from sparkfusion.suite.temporal_suite import w7_running_distinct

    rows = w7_running_distinct(spark, sf_dir).collect()
    from sparkfusion.session import events_with_ts
    from pyspark.sql import functions as F

    ev = (
        events_with_ts(spark, sf_dir)
        .select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"))
        .collect()
    )
    seen: dict[int, set] = {}
    want = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts_us"], r["event_id"])):
        s = seen.setdefault(r["user_id"], set())
        s.add(r["event_type"])
        want[r["event_id"]] = len(s)
    assert len(rows) == len(ev)
    for r in rows:
        assert r["n_types_so_far"] == want[r["event_id"]], r["event_id"]
