"""UDF surface tests (SURVEY.md §2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkfusion.functions import (
    register_split_text,
    split_row_builtin,
    split_row_pandas_udf,
    split_text_builtin,
)


def test_split_text_builtin(spark):
    df = spark.createDataFrame([("file.txt",), ("noext",)], "name string")
    out = df.select(split_text_builtin("name").alias("base")).collect()
    assert [r.base for r in out] == ["file", "noext"]


def test_split_text_pandas_udf_matches_builtin(spark):
    from sparkfusion.functions.udfs import make_split_text_pandas_udf

    df = spark.createDataFrame([("a.b.c",), ("x",), ("",)], "name string")
    udf_out = [r[0] for r in df.select(make_split_text_pandas_udf(".")("name")).collect()]
    builtin_out = [r[0] for r in df.select(split_text_builtin("name")).collect()]
    assert udf_out == builtin_out


def test_register_split_text_sql(spark):
    register_split_text(spark, "split_text_t", ".")
    spark.createDataFrame([("f.parquet",)], "name string").createOrReplaceTempView("t_udf")
    row = spark.sql("SELECT split_text_t(name) AS base FROM t_udf").collect()[0]
    assert row.base == "f"


def test_split_row_null_safety(spark):
    # malformed rows -> null fields, not errors (reference null-safe builders)
    df = spark.createDataFrame(
        [("Oslo;4.5",), ("Bad",), ("X;notanumber",)], "raw string"
    )
    for form in (split_row_builtin("raw"), split_row_pandas_udf("raw")):
        rows = df.select(form.alias("s")).select("s.city", "s.temperature").collect()
        assert rows[0].city == "Oslo" and rows[0].temperature == 4.5
        assert rows[1].city == "Bad" and rows[1].temperature is None
        assert rows[2].city == "X" and rows[2].temperature is None


def test_udf_deterministic_by_default(spark):
    # X4: Volatility::Immutable analog — pandas UDFs default deterministic
    from sparkfusion.functions.udfs import make_split_text_pandas_udf

    udf_col = make_split_text_pandas_udf(".")("x")
    assert "nondeterministic" not in repr(udf_col).lower()


def test_iter_udf_loads_model_once_per_partition(spark):
    from sparkfusion.functions.udfs import make_iter_scoring_udf
    from pyspark.sql import functions as F

    acc = spark.sparkContext.accumulator(0)
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(1000)], "id int, text string"
    ).repartition(4)
    score = make_iter_scoring_udf(acc)
    # force tiny arrow batches so each partition sees MANY batches
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        out = df.select(score(F.col("text")).alias("s")).collect()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert all(r["s"] == 1.5 for r in out)  # 3 tokens x 0.5
    # one load per partition, NOT one per ~5-row batch (would be ~20)
    assert acc.value == 4


def test_grouped_map_mad_zero_gives_zero_z(spark):
    from sparkfusion.functions.grouped import grouped_robust_normalize

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 5.0), ("b", 4, 1.0), ("b", 5, 3.0), ("b", 6, 9.0)],
        ["event_type", "event_id", "value"],
    )
    out = {r["event_id"]: r["z"] for r in grouped_robust_normalize(df).collect()}
    assert out[1] == out[2] == out[3] == 0.0  # constant group → mad 0 → z 0
    assert out[5] == 0.0  # b's median value
    assert out[4] < 0 < out[6]


def test_cogroup_attribution_edges(spark):
    from sparkfusion.functions.grouped import cogroup_view_attribution

    HOUR = 3_600_000_000
    purchases = spark.createDataFrame(
        [(1, 10 * HOUR), (1, 20 * HOUR), (2, 5 * HOUR)], ["user_id", "ts_us"]
    )
    views = spark.createDataFrame(
        # u1: one view 30min before first purchase; one view AT second
        # purchase time (excluded: window is [t-1h, t))
        [(1, 10 * HOUR - HOUR // 2), (1, 20 * HOUR), (3, 1 * HOUR)],
        ["user_id", "ts_us"],
    )
    out = {r["user_id"]: r for r in cogroup_view_attribution(purchases, views).collect()}
    assert out[1]["n_purchases"] == 2 and out[1]["n_attributed"] == 1
    assert out[2]["n_purchases"] == 1 and out[2]["n_attributed"] == 0
    assert 3 not in out  # view-only users emit nothing


def test_udtf_split_to_rows_position_contract(spark):
    """split_to_rows emits RAW 0-based split positions (empty tokens skipped
    without renumbering) and handles NULL input — the contract
    x5_udtf_lateral_words' checksum oracle depends on."""
    from sparkfusion.functions.aggregates import register_udtf

    register_udtf(spark)
    df = spark.createDataFrame(
        [(1, "a  bb ccc"), (2, None), (3, "")], "id int, t string"
    )
    df.createOrReplaceTempView("udtf_probe")
    rows = spark.sql(
        "SELECT id, s.pos, s.token FROM udtf_probe, LATERAL split_to_rows(t, ' ') s "
        "ORDER BY id, pos"
    ).collect()
    # "a  bb ccc" splits to [a, '', bb, ccc] -> raw positions 0, 2, 3 survive
    assert [(r["id"], r["pos"], r["token"]) for r in rows] == [
        (1, 0, "a"),
        (1, 2, "bb"),
        (1, 3, "ccc"),
    ]
