"""Bloom-bitmap runtime filter: exactness, no-false-negatives, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkfusion.operators.bloom import (
    bloom_bitmap,
    bloom_might_contain,
    bloom_semi_join,
    false_positive_rate,
)
from sparkfusion.session import table


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    line = table(spark, sf_dir, "lineitem")
    parts = table(spark, sf_dir, "part").where(F.col("p_size") >= 45)
    got = bloom_semi_join(line, parts, "l_partkey", "p_partkey", num_bits=1 << 14)
    want = line.join(
        parts.select("p_partkey"),
        line["l_partkey"] == parts["p_partkey"],
        "left_semi",
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_prefilter_has_no_false_negatives(spark, sf_dir):
    """Every true-match row must survive the bitmap-only pass."""
    line = table(spark, sf_dir, "lineitem")
    keys = table(spark, sf_dir, "part").where(F.col("p_size") >= 45).select("p_partkey")
    bitmap = bloom_bitmap(keys, "p_partkey", num_bits=1 << 14)
    pruned = bloom_might_contain(line, bitmap, "l_partkey", num_bits=1 << 14)
    true_hits = line.join(keys, line["l_partkey"] == keys["p_partkey"], "left_semi")
    # true hits ⊆ pruned: anti-joining pruned away from true hits leaves nothing
    pr = pruned.select(
        F.col("l_orderkey").alias("ok"), F.col("l_linenumber").alias("ln")
    )
    missing = true_hits.join(
        pr,
        (true_hits["l_orderkey"] == pr["ok"]) & (true_hits["l_linenumber"] == pr["ln"]),
        "left_anti",
    )
    assert missing.count() == 0


def test_bloom_prefilter_actually_prunes(spark, sf_dir):
    """A reasonably-sized bitmap must reject most non-matching rows — if the
    prefilter passes everything, the runtime filter is doing no work."""
    line = table(spark, sf_dir, "lineitem")
    keys = table(spark, sf_dir, "part").where(F.col("p_size") >= 45).select("p_partkey")
    n_keys = keys.count()
    m = 1 << 14
    bitmap = bloom_bitmap(keys, "p_partkey", num_bits=m)
    pruned_n = bloom_might_contain(line, bitmap, "l_partkey", num_bits=m).count()
    total = line.count()
    true_n = line.join(keys, line["l_partkey"] == keys["p_partkey"], "left_semi").count()
    fp_bound = false_positive_rate(n_keys, m, 3)
    # observed pass-through ≤ true matches + 5× the theoretical FP allowance
    assert pruned_n <= true_n + 5 * fp_bound * (total - true_n) + 50


def test_bloom_bitmap_is_broadcast_sized(spark, sf_dir):
    keys = table(spark, sf_dir, "part").select("p_partkey")
    m = 1 << 12
    bm = bloom_bitmap(keys, "p_partkey", num_bits=m).collect()
    assert len(bm) <= m // 64
    assert all(r["mask"] != 0 for r in bm)


def test_bloom_probe_plan_is_broadcast_no_probe_shuffle(spark, sf_dir):
    """The bitmap joins must be broadcast hash joins; the probe side must not
    shuffle before the filter (prune happens in the scan stage)."""
    line = table(spark, sf_dir, "lineitem")
    keys = table(spark, sf_dir, "part").select("p_partkey")
    bitmap = bloom_bitmap(keys, "p_partkey", num_bits=1 << 14)
    pruned = bloom_might_contain(line, bitmap, "l_partkey", num_bits=1 << 14)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only Exchanges allowed are broadcast (bitmap build) — no hash
    # partitioning of the probe side anywhere in the pruned plan
    assert "hashpartitioning(l_partkey" not in plan


def test_bloom_arg_validation():
    from sparkfusion.operators.bloom import _bit_positions

    with pytest.raises(ValueError):
        _bit_positions(F.col("x"), 100, 3)  # not a multiple of 64
    with pytest.raises(ValueError):
        _bit_positions(F.col("x"), 128, 0)
    assert false_positive_rate(0, 128, 3) == 0.0
    assert 0.0 < false_positive_rate(10, 128, 3) < 1.0
