"""Custom Python DataSource: partition planning, determinism, guards."""

from __future__ import annotations

import pytest

from sparkfusion.sources.pysource import RangeDocsReader, read_synth_docs, synth_row


def test_partition_planning_and_rows(spark):
    df = read_synth_docs(spark, n=1000, partitions=8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    rows = {r["doc_id"]: (r["bucket"], r["score"]) for r in df.collect()}
    for i in (0, 1, 999, 500):
        _, b, s = synth_row(i)
        assert rows[i] == (b, s)


def test_uneven_and_tiny_ranges(spark):
    assert read_synth_docs(spark, n=7, partitions=3).count() == 7
    assert read_synth_docs(spark, n=0, partitions=2).count() == 0


def test_reader_partitions_cover_range_once():
    r = RangeDocsReader({"n": "10", "partitions": "3"})
    spans = [p.value for p in r.partitions()]
    seen = [i for s, e in spans for i in range(s, e)]
    assert sorted(seen) == list(range(10))


def test_reader_guards():
    with pytest.raises(ValueError):
        RangeDocsReader({"n": "-1"})
    with pytest.raises(ValueError):
        RangeDocsReader({"n": "10", "partitions": "0"})


def test_variant_typed_access(spark, sf_dir):
    from sparkfusion.suite.schema_ops import p22_variant_json

    out = {r["event_type"]: r for r in p22_variant_json(spark, sf_dir).collect()}
    assert out, "no event types"
    for r in out.values():
        assert r["min_k"] <= r["max_k"]
        assert r["n"] > 0
