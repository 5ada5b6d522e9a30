"""Tests for incremental aggregate maintenance (operators/incremental.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkfusion.operators.incremental import aggregate_state, merge_states

def _aggs():
    # built lazily: Column construction requires an active session
    return {
        "total": ("sum", F.col("v").cast("decimal(18,6)")),
        "n": ("count", F.col("v")),
        "lo": ("min", F.col("v")),
        "hi": ("max", F.col("v")),
    }


def _state(spark, rows):
    df = spark.createDataFrame(rows, "k string, v double")
    return aggregate_state(df, ["k"], _aggs())


def test_merge_equals_from_scratch(spark):
    b1 = [("a", 1.0), ("a", 2.0), ("b", 5.0)]
    b2 = [("a", 3.0), ("c", 7.0)]
    merged = merge_states(_state(spark, b1), _state(spark, b2), ["k"], _aggs())
    scratch = _state(spark, b1 + b2)
    got = {r["k"]: (float(r["total"]), r["n"], r["lo"], r["hi"]) for r in merged.collect()}
    want = {r["k"]: (float(r["total"]), r["n"], r["lo"], r["hi"]) for r in scratch.collect()}
    assert got == want
    assert got["a"] == (6.0, 3, 1.0, 3.0)
    assert got["c"] == (7.0, 1, 7.0, 7.0)  # group only in the delta


def test_merge_is_associative_across_batch_orders(spark):
    b1, b2, b3 = [("a", 1.0)], [("a", 10.0), ("b", 2.0)], [("b", 4.0)]
    s12 = merge_states(_state(spark, b1), _state(spark, b2), ["k"], _aggs())
    left = merge_states(s12, _state(spark, b3), ["k"], _aggs())
    s23 = merge_states(_state(spark, b2), _state(spark, b3), ["k"], _aggs())
    right = merge_states(_state(spark, b1), s23, ["k"], _aggs())
    as_dict = lambda df: {r["k"]: (float(r["total"]), r["n"], r["lo"], r["hi"]) for r in df.collect()}
    assert as_dict(left) == as_dict(right)


def test_hll_rollup_idempotent_under_batch_replay(spark):
    from sparkfusion.operators.incremental import hll_rollup

    rows = [("g", d, u) for d in range(5) for u in range(d * 10, d * 10 + 30)]
    df = spark.createDataFrame(rows, "g string, day int, u long")
    base = hll_rollup(df, ["day"], ["g"], "u").collect()[0]
    # replaying every batch twice must NOT inflate the distinct estimate
    replayed = hll_rollup(df.unionAll(df), ["day"], ["g"], "u").collect()[0]
    assert base["distinct_est"] == replayed["distinct_est"]
    # sparse-mode sketch is exact at this cardinality (70 distinct)
    assert base["distinct_est"] == 70
    assert base["n_subgroups"] == 5
