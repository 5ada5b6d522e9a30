"""SessionContext facade tests — the reference's entry-point API parity."""

from __future__ import annotations

import pytest

from sparkfusion.context import SessionContext


@pytest.fixture(scope="module")
def ctx(spark):
    return SessionContext(spark)


def test_sql_over_registered_batch(ctx):
    ctx.register_batch("idn", [(1, "foo", 42), (2, "bar", 43)], schema="id int, name string, data int")
    out = ctx.sql("SELECT name FROM idn WHERE id = 2").collect()
    assert [r.name for r in out] == ["bar"]
    ctx.deregister_table("idn")


def test_read_batches_union(ctx):
    df = ctx.read_batches([[(1,)], [(2,)], [(3,)]], schema="x int")
    assert sorted(r.x for r in df.collect()) == [1, 2, 3]


def test_empty_shapes(ctx):
    assert ctx.read_empty().count() == 1 and ctx.read_empty().columns == []
    assert ctx.empty_df().count() == 0 and ctx.empty_df().columns == []


def test_register_parquet_and_table(ctx, sf_dir):
    ctx.register_parquet("nation_ctx", f"{sf_dir}/nation.parquet")
    assert "nation_ctx" in ctx.table_names()
    assert ctx.table("nation_ctx").count() == 25
    ctx.deregister_table("nation_ctx")
    assert "nation_ctx" not in ctx.table_names()


def test_register_view_is_lazy_alias(ctx, sf_dir):
    base = ctx.read_parquet(f"{sf_dir}/region.parquet")
    ctx.register_table("region_view", base.filter("r_regionkey > 1"))
    assert ctx.sql("SELECT count(*) AS n FROM region_view").collect()[0].n == 3
    ctx.deregister_table("region_view")


def test_cache_table_materializes(ctx, sf_dir):
    df = ctx.read_parquet(f"{sf_dir}/region.parquet")
    cached = ctx.cache_table("region_mem", df)
    try:
        assert cached.count() == 5
        assert cached.storageLevel.useMemory
    finally:
        cached.unpersist()
        ctx.deregister_table("region_mem")


def test_register_udf_sql(ctx):
    ctx.register_udf("double_it", lambda x: x * 2, "int")
    ctx.register_batch("t_two", [(21,)], schema="x int")
    assert ctx.sql("SELECT double_it(x) AS y FROM t_two").collect()[0].y == 42
    ctx.deregister_table("t_two")


def test_observe_inline_metrics(spark, sf_dir):
    """df.observe(): collect pipeline metrics DURING the action — no second
    scan. The zero-extra-pass form of the dq1 profile for writes/exports."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from sparkfusion.session import table

    obs = Observation("export_metrics")
    li = table(spark, sf_dir, "lineitem")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("total_price"),
        F.count_if(F.col("l_quantity") <= 0).alias("n_bad_qty"),
    )
    n = observed.count()  # one action: rows counted AND metrics observed
    m = obs.get
    assert m["n_rows"] == n
    assert m["n_bad_qty"] == 0
    assert float(m["total_price"]) > 0
