"""Suite-level smoke + semantics tests for the relational core.

The full value-level correctness gate is the DuckDB oracle
(tools/check_oracle.py replicates the driver's comparison); these tests check
operator semantics fast at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkfusion.operators import concat_dfs, join_dfs
from sparkfusion.session import table
from sparkfusion.suite import queries


def test_q1_pricing_summary(spark, sf_dir):
    from sparkfusion.suite.relational import q1_pricing_summary

    rows = q1_pricing_summary(spark, sf_dir).collect()
    assert 0 < len(rows) <= 6  # at most |returnflag| x |linestatus| groups
    by_key = {(r.l_returnflag, r.l_linestatus): r for r in rows}
    for r in rows:
        assert r.count_order > 0
        assert abs(r.avg_qty - r.sum_qty / r.count_order) < 1e-9
    assert len(by_key) == len(rows)


def test_join_dfs_composite_key(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    keys = ["o_orderkey", "o_custkey"]
    parts = [orders.select(*keys, "o_totalprice"), orders.select(*keys, "o_orderstatus")]
    joined = join_dfs(parts, keys)
    assert joined.columns == ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    assert joined.count() == orders.count()


def test_join_duplicate_keys_multiplies(spark):
    df1 = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "id int, x string")
    df2 = spark.createDataFrame([(1, 10.0), (1, 20.0)], "id int, y double")
    # 2 left rows with id=1 x 2 right rows = 4, id=2 unmatched
    assert df1.join(df2, "id", "inner").count() == 4


def test_concat_dfs_preserves_duplicates(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    n = cust.count()
    assert concat_dfs([cust, cust]).count() == 2 * n


def test_topk_matches_full_sort(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    topk = (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .collect()
    )
    assert len(topk) == 10
    prices = [r.o_totalprice for r in topk]
    assert prices == sorted(prices, reverse=True)


def test_limit_offset(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select("o_orderkey").orderBy("o_orderkey")
    all_keys = [r.o_orderkey for r in orders.limit(15).collect()]
    sliced = [r.o_orderkey for r in orders.offset(10).limit(5).collect()]
    assert sliced == all_keys[10:15]


def test_all_registered_queries_run(spark, sf_dir):
    for name, fn in queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_salted_join_equals_plain_join(spark, sf_dir):
    """The deterministic-salt join must be row-for-row identical to the
    unsalted join it protects — salting redistributes work, never results."""
    from pyspark.sql import functions as F

    from sparkfusion.session import table
    from sparkfusion.suite.relational_ext import j13_salted_skew_join

    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(12,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    got = {r["s_nationkey"]: (r["revenue"], r["n_items"])
           for r in j13_salted_skew_join(spark, sf_dir).collect()}
    want = {r["s_nationkey"]: (r["revenue"], r["n_items"]) for r in plain.collect()}
    assert got == want
