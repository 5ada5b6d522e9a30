"""The reference's canonical integration flow, reproduced end-to-end.

Mirrors its cars.csv golden tests (FIXTURES.md A1; reference
``tests/api/dataframe_tests.rs:41-813`` / ``src/utils/datasets.rs:122-245``):
25 rows, two car groups, duplicated speeds/times for tie handling — driven
through CSV round-trip, sort, limit/offset, cols→json, cols→struct,
add-column, pk, self-concat, parquet round-trip.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from sparkfusion.operators import (
    add_pk_to_df,
    concat_dfs,
    df_cols_to_json,
    df_cols_to_struct,
    df_sql,
)


def _t(s: int):
    return datetime.datetime(1996, 4, 12, 12, 5, s)


@pytest.fixture(scope="module")
def cars(spark):
    rows = []
    for i in range(13):
        rows.append(("red", float(20 + i % 5), _t(3 + i % 12)))
    for i in range(12):
        rows.append(("green", float(15 + i % 6), _t(3 + i % 12)))
    return spark.createDataFrame(
        rows, "car string, speed double, time timestamp_ntz"
    )


def test_shape_and_groups(cars):
    assert cars.count() == 25
    groups = {r.car: r.n for r in cars.groupBy("car").agg(F.count("*").alias("n")).collect()}
    assert groups == {"red": 13, "green": 12}


def test_csv_roundtrip(spark, cars, tmp_path):
    p = str(tmp_path / "cars_csv")
    cars.write.mode("overwrite").option("header", True).csv(p)
    back = spark.read.option("header", True).schema(cars.schema).csv(p)
    assert back.count() == 25
    assert back.exceptAll(cars).count() == 0


def test_parquet_roundtrip(spark, cars, tmp_path):
    p = str(tmp_path / "cars_pq")
    cars.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    assert back.exceptAll(cars).count() == 0 and cars.exceptAll(back).count() == 0


def test_filter_sql_string(cars):
    out = df_sql(cars, "speed > 18 and car in ('red', 'green')")
    assert out.count() == cars.filter(F.col("speed") > 18).count()


def test_sort_limit_offset(cars):
    ordered = cars.orderBy(F.col("speed").asc_nulls_first(), "car", "time")
    top5 = ordered.limit(5).collect()
    speeds = [r.speed for r in top5]
    assert speeds == sorted(speeds)
    sliced = ordered.offset(2).limit(3).collect()
    assert [r.speed for r in sliced] == [r.speed for r in ordered.limit(5).collect()[2:5]]


def test_cols_to_json_and_struct(cars):
    j = df_cols_to_json(cars.select("car", "speed"), ["car", "speed"], "packed")
    assert j.columns == ["packed"]
    first = sorted(r.packed for r in j.collect())[0]
    assert first.startswith('{"car":"green","speed":')
    s = df_cols_to_struct(cars, ["car", "speed"], "s")
    assert set(s.columns) == {"time", "s"}
    assert s.select("s.car").distinct().count() == 2


def test_pk_and_self_concat(cars):
    with_pk = add_pk_to_df(cars, "pk", order_by=["car", "speed", "time"])
    pks = sorted(r.pk for r in with_pk.collect())
    assert pks == list(range(25))
    doubled = concat_dfs([cars, cars])
    assert doubled.count() == 50  # duplicates preserved (reference 25+25→50)


def test_sort_null_ordering_variants_golden(spark):
    """Golden four-way null-placement matrix, mirroring the reference's
    explicit (asc, nulls_first) sort flags (col("speed").sort(true, true),
    src/utils/dataframe.rs:229; ordering cases tests/api/dataframe_tests.rs).
    Spark's *defaults* differ per direction (asc->nulls first, desc->nulls
    last), so every suite sort emits explicit placement — asserted here."""
    df = spark.createDataFrame(
        [(None,), (1.0,), (3.0,), (2.0,)], "speed double"
    )

    def seq(col):
        return [r.speed for r in df.orderBy(col).collect()]

    assert seq(F.col("speed").asc_nulls_first()) == [None, 1.0, 2.0, 3.0]
    assert seq(F.col("speed").asc_nulls_last()) == [1.0, 2.0, 3.0, None]
    assert seq(F.col("speed").desc_nulls_first()) == [None, 3.0, 2.0, 1.0]
    assert seq(F.col("speed").desc_nulls_last()) == [3.0, 2.0, 1.0, None]
    # defaults match the explicit forms they alias
    assert seq(F.col("speed").asc()) == seq(F.col("speed").asc_nulls_first())
    assert seq(F.col("speed").desc()) == seq(F.col("speed").desc_nulls_last())


def test_sort_limit_golden_head5(cars):
    """End-to-end golden mirroring the reference's sort+limit doctest shape
    (sort speed asc nulls_first, limit 5 — src/utils/dataframe.rs:229):
    the five slowest cars are the duplicated low green speeds."""
    head = (
        cars.orderBy(F.col("speed").asc_nulls_first(), F.col("time").asc())
        .limit(5)
        .collect()
    )
    assert [(r.car, r.speed) for r in head] == [
        ("green", 15.0),
        ("green", 15.0),
        ("green", 16.0),
        ("green", 16.0),
        ("green", 17.0),
    ]
