"""TPC-H-style multi-join analytical queries over the star schema — the
classic engine-comparison shapes (Q3 shipping priority, Q5 local supplier
volume), plus an array-function exercise on the embeddings table.

Same determinism discipline as suite.relational: DECIMAL money math, date
filters pushed to scans, dimension broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_star, table
from . import register

_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, two date filters (both pushed to their
    scans), grouped decimal revenue, top-10. ``l_orderkey`` tiebreak makes
    the limited set deterministic."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the full star (fact ⋈ two dims ⋈
    nation ⋈ region) with a local-supplier condition; nation/region/supplier
    broadcast, the fact side never re-shuffles between the chained joins."""
    load_star(spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region"))
    return spark.sql(
        f"""
        SELECT n_name,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        """
    )


@register(
    "arr_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(embedding[1]::DOUBLE, 6) AS first_val,
           round(list_aggregate(list_transform(embedding[1:8], x -> (x*x)::DOUBLE), 'sum'), 6) AS head_sq_sum,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
)
def arr_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the embeddings list column (§2.8 'Spark
    F.* superset'): size, element access, slice+transform+aggregate fold,
    filter count. Folds run in sequential order → exact cross-engine match
    (head_sq_sum rounded: the float→double square loses nothing, but the sum
    is kept rounding-stable anyway)."""
    emb = table(spark, sf_dir, "embeddings")
    sliced = F.slice(F.col("embedding"), 1, 8)
    sq_sum = F.aggregate(
        F.transform(sliced, lambda x: (x.cast("double") * x.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.get("embedding", 0).cast("double"), 6).alias("first_val"),
        F.round(sq_sum, 6).alias("head_sq_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )
