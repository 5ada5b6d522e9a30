"""Semantics tests for sparkfusion.operators.quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkfusion.operators.quality import (
    check_constraints,
    keep_latest,
    profile_columns,
    referential_orphans,
)


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (3, None)], "k int, s string"
    )
    out = {r["column_name"]: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert out["k"]["n_rows"] == 4
    assert out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 3
    assert out["s"]["n_nulls"] == 2
    assert out["s"]["n_distinct"] == 2  # NULLs excluded from distinct


def test_profile_approx_mode_runs_without_expand(spark):
    df = spark.createDataFrame([(i, str(i % 7)) for i in range(100)], "k int, s string")
    out = {r["column_name"]: r for r in profile_columns(df, ["k", "s"], approx=True).collect()}
    # HLL++ at default rsd is exact-ish at this cardinality
    assert abs(out["k"]["n_distinct"] - 100) <= 5
    assert out["s"]["n_distinct"] == 7
    plan = profile_columns(df, ["k", "s"], approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # the scale path avoids the exact-distinct Expand


def test_constraints_null_counts_as_violation(spark):
    df = spark.createDataFrame([(1.0,), (None,), (-2.0,)], "v double")
    out = {r["rule"]: r for r in check_constraints(df, {"pos": F.col("v") > 0}).collect()}
    assert out["pos"]["violations"] == 2  # NULL and -2.0
    assert out["pos"]["n_rows"] == 3


def test_referential_orphans_counts(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    [row] = referential_orphans([("c->p", child, "fk", parent, "pk")]).collect()
    assert (row["relation"], row["orphans"], row["child_rows"]) == ("c->p", 1, 3)


def test_keep_latest_tiebreaks_deterministically(spark):
    df = spark.createDataFrame(
        [("u", 1, 10, "old"), ("u", 2, 20, "new"), ("u", 3, 20, "newest"), ("v", 1, 5, "only")],
        "k string, id int, t int, tag string",
    )
    out = {r["k"]: r["tag"] for r in keep_latest(df, ["k"], ["t", "id"]).collect()}
    assert out == {"u": "newest", "v": "only"}  # t DESC, then id DESC


def test_psi_drift_terms_sane(spark, sf_dir):
    from sparkfusion.suite.quality_suite import dq5_psi_drift

    rows = dq5_psi_drift(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    # every term is a finite float; identical distributions give ~0 terms;
    # smoothing keeps terms finite even for empty-side buckets
    total = sum(r["psi_term"] for r in rows)
    assert all(abs(r["psi_term"]) < 10 for r in rows)
    assert abs(total) < 10
    # counts partition the events table
    from sparkfusion.session import table

    n = table(spark, sf_dir, "events").count()
    assert sum(r["n_base"] + r["n_cur"] for r in rows) == n


def test_schema_diff_identity_and_cases(spark, sf_dir):
    from pyspark.sql import functions as F

    from sparkfusion.operators.quality import schema_diff
    from sparkfusion.session import table

    orders = table(spark, sf_dir, "orders")
    assert schema_diff(orders, orders).count() == 0  # identical → empty
    changed = orders.withColumn("o_orderkey", F.col("o_orderkey").cast("int"))
    rows = schema_diff(orders, changed).collect()
    assert len(rows) == 1
    assert (rows[0]["col_name"], rows[0]["change"]) == ("o_orderkey", "retyped")
    assert rows[0]["old_type"] == "bigint" and rows[0]["new_type"] == "int"


def test_table_fingerprint_is_order_invariant(spark, sf_dir):
    """Same rows in any physical layout must produce identical accumulators
    — the property that lets source and target of a copy compare scalars."""
    import sparkfusion.suite.quality_suite as mod

    base = mod.dq7_table_fingerprint(spark, sf_dir).collect()[0]
    orig = mod.table
    mod.table = lambda sp, d, name: orig(sp, d, name).repartition(7)
    try:
        shuffled = mod.dq7_table_fingerprint(spark, sf_dir).collect()[0]
    finally:
        mod.table = orig
    assert tuple(base) == tuple(shuffled)


def test_table_fingerprint_detects_single_cell_drift(spark, sf_dir):
    from pyspark.sql import functions as F

    import sparkfusion.suite.quality_suite as mod

    base = mod.dq7_table_fingerprint(spark, sf_dir).collect()[0]
    orig = mod.table

    def corrupt(sp, d, name):
        df = orig(sp, d, name)
        return df.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") == 7, F.col("o_totalprice") + 0.01)
            .otherwise(F.col("o_totalprice")),
        )

    mod.table = corrupt
    try:
        drifted = mod.dq7_table_fingerprint(spark, sf_dir).collect()[0]
    finally:
        mod.table = orig
    assert drifted["n_rows"] == base["n_rows"]
    assert drifted["xor_fp"] != base["xor_fp"]


def test_benford_first_digit_notation_invariant(spark):
    """First-significant-digit extraction must survive double formatting
    (plain vs scientific notation) — the property the dq8 oracle relies on."""
    from pyspark.sql import functions as F

    vals = [0.00095, 0.75, 1.0, 9.999, 123.45, 4950000.12, 1.2345e9, 7e-8]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["d"]
        for r in df.select(
            F.regexp_extract(F.col("x").cast("string"), "[1-9]", 0).alias("d")
        ).collect()
    ]
    import re

    want = [re.search("[1-9]", repr(v)).group(0) for v in vals]
    assert got == want
