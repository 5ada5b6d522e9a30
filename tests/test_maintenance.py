"""Compaction + schema-evolution reads."""

from __future__ import annotations

from sparkfusion.sources.writers import compact_parquet, read_parquet_merged


def test_compact_parquet(spark, tmp_path):
    p = str(tmp_path / "frag")
    spark.range(1000).repartition(16).write.parquet(p)
    before = spark.read.parquet(p)
    assert before.rdd.getNumPartitions() >= 2
    n_files = compact_parquet(spark, p, target_files=2)
    assert n_files <= 2
    after = spark.read.parquet(p)
    assert after.count() == 1000
    assert sorted(r.id for r in after.collect()) == list(range(1000))


def test_schema_evolution_merge(spark, tmp_path):
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame([(2, 9.5)], "id long, score double").write.mode(
        "append"
    ).parquet(p)
    merged = read_parquet_merged(spark, p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].name == "a" and rows[1].score is None
    assert rows[2].score == 9.5 and rows[2].name is None
