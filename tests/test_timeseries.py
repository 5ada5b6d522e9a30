"""Semantics tests for sparkfusion.operators.timeseries."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sparkfusion.operators.timeseries import (
    forward_fill,
    moving_avg,
    ohlc,
    resample_counts,
    zscore_outliers,
)


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_resample_fills_empty_buckets(spark):
    # hours 0, 1, 3 occupied for key 'a'; hour 2 is a gap; key 'b' only hour 0
    df = spark.createDataFrame(
        [
            ("a", _ts(0), 1.0),
            ("a", _ts(1), 2.0),
            ("a", _ts(3), 3.0),
            ("b", _ts(0), 4.0),
        ],
        "k string, t timestamp, v double",
    )
    out = resample_counts(df, "t", ["k"], bucket="hour", agg_col="v")
    rows = {(r["k"], r["bucket"].hour): (r["n"], float(r["total"])) for r in out.collect()}
    # 4 hours x 2 keys = 8 dense cells
    assert len(rows) == 8
    assert rows[("a", 2)] == (0, 0.0)  # the gap is zero-filled, not absent
    assert rows[("b", 3)] == (0, 0.0)
    assert rows[("a", 1)] == (1, 2.0)
    assert rows[("b", 0)] == (1, 4.0)


def test_forward_fill_carries_last_observation(spark):
    df = spark.createDataFrame(
        [
            ("u", 1, None),
            ("u", 2, 10.0),
            ("u", 3, None),
            ("u", 4, None),
            ("u", 5, 20.0),
            ("u", 6, None),
            ("v", 1, None),  # other key: never observed -> stays NULL
        ],
        "k string, seq int, v double",
    )
    out = forward_fill(df, "v", ["k"], ["seq"])
    got = {(r["k"], r["seq"]): r["v"] for r in out.collect()}
    assert got[("u", 1)] is None  # before first observation
    assert got[("u", 3)] == 10.0
    assert got[("u", 4)] == 10.0
    assert got[("u", 6)] == 20.0
    assert got[("v", 1)] is None


def test_moving_avg_trailing_window(spark):
    df = spark.createDataFrame(
        [("k", i, float(i)) for i in range(1, 7)], "k string, seq int, v double"
    )
    out = moving_avg(df, "v", ["k"], ["seq"], window_rows=3)
    got = {r["seq"]: round(r["mavg"], 9) for r in out.collect()}
    assert got[1] == 1.0  # frame shorter than window at the start
    assert got[2] == 1.5
    assert got[3] == 2.0  # (1+2+3)/3
    assert got[6] == 5.0  # (4+5+6)/3


def test_ohlc_picks_and_tiebreak(spark):
    # two rows share the same timestamp; the tiebreak column decides open
    df = spark.createDataFrame(
        [
            ("k", _ts(0, 5), 1, 50.0),
            ("k", _ts(0, 5), 0, 10.0),  # same ts, lower tiebreak -> open
            ("k", _ts(0, 30), 2, 99.0),
            ("k", _ts(0, 45), 3, 5.0),
        ],
        "k string, t timestamp, id int, v double",
    )
    out = ohlc(df, "t", "v", ["k"], bucket="hour", tiebreak=("id",))
    [row] = out.collect()
    assert row["open"] == 10.0
    assert row["close"] == 5.0
    assert row["high"] == 99.0
    assert row["low"] == 5.0
    assert row["n"] == 4


def test_zscore_flags_planted_outlier(spark):
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 1000.0]  # one wild point
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, i int, v double"
    )
    out = zscore_outliers(df, "v", ["g"], threshold=2.0)
    rows = out.collect()
    assert [r["v"] for r in rows] == [1000.0]
    assert rows[0]["z"] > 2.0


def test_zscore_no_outliers_in_uniform_group(spark):
    df = spark.createDataFrame(
        [("g", i, 5.0 + (i % 2) * 0.1) for i in range(10)], "g string, i int, v double"
    )
    assert zscore_outliers(df, "v", ["g"], threshold=3.0).count() == 0


def test_resample_counts_without_agg_col(spark):
    # the counts-only branch (no `total` column in the output)
    df = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(2), 2.0)], "k string, t timestamp, v double"
    )
    out = resample_counts(df, "t", ["k"], bucket="hour")
    assert out.columns == ["k", "bucket", "n"]
    got = {r["bucket"].hour: r["n"] for r in out.collect()}
    assert got == {0: 1, 1: 0, 2: 1}


def test_resample_day_bucket(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 5), 1.0), ("a", datetime(2024, 1, 3, 7), 1.0)],
        "k string, t timestamp, v double",
    )
    out = resample_counts(df, "t", ["k"], bucket="day")
    days = {r["bucket"].day: r["n"] for r in out.collect()}
    assert days == {1: 1, 2: 0, 3: 1}  # the empty middle day materializes


def test_fe2_user_trend_matches_numpy(spark, sf_dir):
    """Suite OLS slope vs numpy.polyfit on the same quantized inputs."""
    import numpy as np
    import pytest

    from sparkfusion.session import events_with_ts
    from sparkfusion.suite.timeseries_suite import fe2_user_trend
    from pyspark.sql import functions as F

    got = {r["user_id"]: r["slope_q"] for r in fe2_user_trend(spark, sf_dir).collect()}
    ev = (
        events_with_ts(spark, sf_dir)
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "value")
        .collect()
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts_us"] - 1700000000000000, round(r["value"] * 1e6))
        )
    for uid, pts in by_user.items():
        if len(pts) < 2:
            assert uid not in got
            continue
        x = np.array([p[0] for p in pts], dtype=np.float64)
        y = np.array([p[1] for p in pts], dtype=np.float64)
        if np.all(x == x[0]):
            assert uid not in got
            continue
        slope = np.polyfit(x, y, 1)[0]
        assert got[uid] == pytest.approx(slope, rel=1e-6, abs=1e-9), uid


def test_seasonal_decompose_identity_and_flat_series(spark):
    """value == trend + seasonal + remainder (to rounding), and a constant
    series decomposes to trend=const, seasonal=0, remainder=0."""
    from sparkfusion.operators.timeseries import seasonal_decompose

    rows = [(h * 3_600_000_000, h % 24, 10) for h in range(72)]
    df = spark.createDataFrame(rows, "bucket_us long, hod long, n long")
    out = seasonal_decompose(df, "n", "bucket_us", "hod", half_window=12).collect()
    assert len(out) == 72
    for r in out:
        assert abs(r["n"] - (r["trend"] + r["seasonal"] + r["remainder"])) < 5e-6
        assert r["trend"] == 10.0
        assert r["seasonal"] == 0.0
        assert r["remainder"] == 0.0


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """A planted 24h cycle (+6 at hour 0) on a flat base must show up in the
    seasonal component at hour 0, not in the remainder."""
    from sparkfusion.operators.timeseries import seasonal_decompose

    rows = [
        (h * 3_600_000_000, h % 24, 10 + (6 if h % 24 == 0 else 0))
        for h in range(24 * 10)
    ]
    df = spark.createDataFrame(rows, "bucket_us long, hod long, n long")
    out = sorted(
        seasonal_decompose(df, "n", "bucket_us", "hod", half_window=12).collect(),
        key=lambda r: r["bucket_us"],
    )
    by_hod0 = [r for r in out if r["n"] == 16]
    others = [r for r in out if r["n"] == 10]
    mean = lambda xs: sum(xs) / len(xs)
    assert mean([r["seasonal"] for r in by_hod0]) > 4.0
    assert abs(mean([r["seasonal"] for r in others])) < 1.0
    # remainder stays small away from the series edges
    interior = [r for r in out[13:-13]]
    assert max(abs(r["remainder"]) for r in interior) < 2.0
