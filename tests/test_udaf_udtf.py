"""GROUPED_AGG pandas UDAF + Python UDTF tests (§2.10 extensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkfusion.functions.aggregates import register_udtf, weighted_mean


def test_weighted_mean_grouped_agg(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 1.0)],
        "k string, v double, w double",
    )
    out = {
        r.k: r.wm
        for r in df.groupBy("k").agg(weighted_mean("v", "w").alias("wm")).collect()
    }
    assert abs(out["a"] - (1 * 1 + 3 * 3) / 4) < 1e-12  # 2.5
    assert out["b"] == 10.0


def test_udtf_lateral_split(spark):
    register_udtf(spark)
    spark.createDataFrame([(1, "a b c"), (2, "x")], "id int, text string").createOrReplaceTempView(
        "t_udtf"
    )
    rows = spark.sql(
        "SELECT t.id, s.pos, s.token FROM t_udtf t, LATERAL split_to_rows(t.text, ' ') s ORDER BY t.id, s.pos"
    ).collect()
    assert [(r.id, r.pos, r.token) for r in rows] == [
        (1, 0, "a"),
        (1, 1, "b"),
        (1, 2, "c"),
        (2, 0, "x"),
    ]
