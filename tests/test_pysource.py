"""Custom Python DataSource: partition planning, determinism, guards."""

from __future__ import annotations

import pytest

from sparkfusion.sources.pysource import RangeDocsReader, read_synth_docs, synth_row


def test_partition_planning_and_rows(spark):
    df = read_synth_docs(spark, n=1000, partitions=8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    rows = {r["doc_id"]: (r["bucket"], r["milli"], r["score"]) for r in df.collect()}
    for i in (0, 1, 999, 500):
        _, b, m, s = synth_row(i)
        assert rows[i] == (b, m, s)


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


def test_stream_source_exactly_once(spark):
    """Finite custom stream delivers ids [0, n) exactly once across batches."""
    import uuid

    from sparkfusion.sources.pysource import read_synth_docs_stream

    name = f"pysrc_{uuid.uuid4().hex[:8]}"
    stream = read_synth_docs_stream(spark, n=1200, rate=300)
    q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == list(range(1200))
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 2, "must span multiple micro-batches"


def test_stream_reader_offsets_replay():
    from sparkfusion.sources.pysource import RangeDocsStreamReader, synth_row

    r = RangeDocsStreamReader({"n": "10", "rate": "4"})
    off = r.initialOffset()
    seen = []
    while True:
        it, nxt = r.read(off)
        rows = list(it)
        if not rows:
            break
        seen.extend(rows)
        # replay of the committed span must reproduce the same rows
        assert list(r.readBetweenOffsets(off, nxt)) == rows
        off = nxt
    assert seen == [synth_row(i) for i in range(10)]


def test_jsonl_sink_commit_protocol(spark, tmp_path):
    import os

    from pyspark.sql import functions as F
    from sparkfusion.sources.pysource import write_jsonl

    path = str(tmp_path / "out")
    df = spark.range(100).select("id", (F.col("id") % 3).alias("g")).repartition(4)
    write_jsonl(df, path, mode="append")
    names = os.listdir(path)
    assert "_SUCCESS" in names
    assert not [n for n in names if n.endswith(".tmp")], "temps must be promoted"
    parts = [n for n in names if n.endswith(".jsonl")]
    assert len(parts) == 4  # one committed file per task
    back = spark.read.json(os.path.join(path, "*.jsonl"))
    assert back.count() == 100
    assert {r["id"] for r in back.collect()} == set(range(100))


def test_jsonl_sink_overwrite_replaces(spark, tmp_path):
    import os

    from sparkfusion.sources.pysource import write_jsonl

    path = str(tmp_path / "out2")
    write_jsonl(spark.range(10).coalesce(1), path, mode="append")
    write_jsonl(spark.range(5).coalesce(1), path, mode="overwrite")
    back = spark.read.json(os.path.join(path, "*.jsonl"))
    assert back.count() == 5


def test_jsonl_abort_removes_temps(tmp_path):
    import os

    from sparkfusion.sources.pysource import JsonlDirWriter, _JsonlCommit

    w = JsonlDirWriter({"path": str(tmp_path / "a")}, overwrite=False)
    os.makedirs(str(tmp_path / "a"), exist_ok=True)
    tmp = str(tmp_path / "a" / "part-x.jsonl.tmp")
    open(tmp, "w").write("{}\n")
    w.abort([_JsonlCommit(tmp, 1), None])
    assert not os.path.exists(tmp)


def test_jsonl_commit_sweeps_orphan_tmp_and_reorders_success(tmp_path):
    """commit() must delete orphan temps from dead/speculative tasks (they'd
    otherwise double-count if ever promoted) and must remove the previous
    generation's _SUCCESS before touching data files (no reader window where
    a success marker coexists with partially-deleted data)."""
    import os

    from sparkfusion.sources.pysource import JsonlDirWriter, _JsonlCommit

    d = str(tmp_path / "c")
    os.makedirs(d)
    # previous generation: a data file + success marker
    open(os.path.join(d, "part-old.jsonl"), "w").write('{"id": 0}\n')
    open(os.path.join(d, "_SUCCESS"), "w").write("")
    # an orphan temp from a task not in the commit list
    orphan = os.path.join(d, "part-orphan.jsonl.tmp")
    open(orphan, "w").write('{"id": 99}\n')
    # the real committed temp
    good = os.path.join(d, "part-good.jsonl.tmp")
    open(good, "w").write('{"id": 1}\n')

    w = JsonlDirWriter({"path": d}, overwrite=True)
    w.commit([_JsonlCommit(good, 1), None])

    names = sorted(os.listdir(d))
    assert names == ["_SUCCESS", "part-good.jsonl"]


def test_jsonl_requires_path():
    import pytest as _pytest

    from sparkfusion.sources.pysource import JsonlDirWriter

    with _pytest.raises(ValueError):
        JsonlDirWriter({}, overwrite=False)
