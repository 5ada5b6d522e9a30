"""Tests for sources/sinks & generators (SURVEY.md §2.1)."""

from __future__ import annotations

import pytest

from sparkfusion.sources import (
    get_empty_df,
    get_random_df,
    read_batch,
    read_csv_no_header,
    read_empty,
    read_literal,
)


def test_empty_df_shapes(spark):
    e = get_empty_df(spark)
    assert e.count() == 0 and e.columns == []
    # the reference documents read_empty() as 1 row x 0 cols (helpers.rs:27-30)
    r = read_empty(spark)
    assert r.count() == 1 and r.columns == []


def test_random_df_types_and_rows(spark):
    df = get_random_df(spark, ["int", "float", "string", "bool"], rows=50)
    assert df.columns == ["column_1", "column_2", "column_3", "column_4"]
    types = [f.dataType.simpleString() for f in df.schema.fields]
    assert types == ["int", "float", "string", "boolean"]
    rows = df.collect()
    assert len(rows) == 50
    lengths = {len(r.column_3) for r in rows}
    assert all(1 <= n <= 50 for n in lengths)


def test_random_df_rejects_unknown_type(spark):
    with pytest.raises(ValueError, match="unsupported type"):
        get_random_df(spark, ["decimal"], rows=1)


def test_read_literal_mismatch(spark):
    with pytest.raises(ValueError, match="length mismatch"):
        read_literal(spark, id=[1, 2], name=["a"])


def test_read_literal_values(spark):
    rows = read_literal(spark, id=[1, 2], name=["a", "b"]).orderBy("id").collect()
    assert [(r.id, r.name) for r in rows] == [(1, "a"), (2, "b")]


def test_read_batch_pandas(spark):
    import pandas as pd

    pdf = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    df = read_batch(spark, pdf, name="pdf_view")
    assert df.count() == 3
    assert spark.sql("SELECT count(*) AS n FROM pdf_view").collect()[0].n == 3


def test_read_batch_arrow_table(spark):
    import pyarrow as pa

    t = pa.table({"x": [1, 2], "y": ["a", "b"]})
    df = read_batch(spark, t)
    assert sorted(r.x for r in df.collect()) == [1, 2]


def test_read_batch_large_utf8_widens_to_string(spark):
    """SURVEY §1.3 documented widening: Arrow ``large_string`` (the
    reference's LargeUtf8 — ``tests/api/helpers_tests.rs:228`` appends a
    LargeStringArray column next to a plain StringArray) lands as Spark
    ``StringType``, same as ``string`` — Spark has no 32/64-bit-offset
    string split. Values must survive the widening byte-for-byte."""
    import pyarrow as pa

    t = pa.table(
        {
            "car": pa.array(["green", "red"], type=pa.string()),
            "col1": pa.array(["foo", "foo"], type=pa.string()),
            "col2": pa.array(["bar", "baz"], type=pa.large_string()),
        }
    )
    assert t.schema.field("col2").type == pa.large_string()
    df = read_batch(spark, t)
    dt = dict(df.dtypes)
    assert dt["col1"] == "string" and dt["col2"] == "string"
    rows = sorted((r.car, r.col1, r.col2) for r in df.collect())
    assert rows == [("green", "foo", "bar"), ("red", "foo", "baz")]


def test_csv_no_header_naming(spark, tmp_path):
    p = str(tmp_path / "nh_csv")
    spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string").write.mode(
        "overwrite"
    ).option("header", False).csv(p)
    df = read_csv_no_header(spark, p)
    assert df.columns == ["column_1", "column_2"]
    assert df.count() == 2


def test_input_file_name_lineage(spark, sf_dir, tmp_path):
    """input_file_name(): row-level file provenance — per-file row counts
    from the lineage column must match the parquet footers."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sparkfusion.session import table

    path = str(tmp_path / "orders4")
    table(spark, sf_dir, "orders").repartition(4).write.mode("overwrite").parquet(path)
    per_file = {
        r["f"].replace("file://", ""): r["n"]
        for r in spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(per_file) == 4
    for f in glob.glob(path + "/*.parquet"):
        assert per_file[f] == pq.ParquetFile(f).metadata.num_rows


def test_xml_roundtrip_preserves_types_and_values(spark, sf_dir):
    """XML is typeless on the wire: the explicit read schema must hand back
    the original types, and double values must survive the text roundtrip
    bit-for-bit (Java shortest-round-trip formatting)."""
    from pyspark.sql import functions as F

    from sparkfusion.session import table
    from sparkfusion.suite.sources_suite import s25_xml_roundtrip

    back = s25_xml_roundtrip(spark, sf_dir)
    assert dict(back.dtypes) == {
        "o_orderkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
    }
    orig = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 13 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()
    }
    got = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in back.collect()
    }
    assert got == orig and len(got) > 0


def test_binary_file_scan_matches_disk_bytes(spark, sf_dir):
    """binaryFile must surface exactly the bytes on disk: re-hash each blob
    file with hashlib and compare to the query's md5 column."""
    import glob
    import hashlib
    import os

    from sparkfusion.suite.sources_suite import IO_DIR, s26_binary_file_scan

    rows = {r["fname"]: (r["n_bytes"], r["content_md5"])
            for r in s26_binary_file_scan(spark, sf_dir).collect()}
    files = glob.glob(os.path.join(IO_DIR, "doc_blobs", "*.bin"))
    assert len(files) == len(rows) > 0
    for f in files:
        data = open(f, "rb").read()
        assert rows[os.path.basename(f)] == (
            len(data),
            hashlib.md5(data).hexdigest(),
        )


def test_corrupt_record_quarantine_captures_bad_rows(spark, sf_dir):
    """The dead-letter side of s29: every poisoned line (and only those)
    lands in the quarantine parquet with its raw text intact for replay."""
    from sparkfusion.suite.sources_suite import (
        IO_DIR,
        s29_corrupt_record_quarantine,
    )
    import os

    from pyspark.sql import functions as F

    good = s29_corrupt_record_quarantine(spark, sf_dir)
    from sparkfusion.session import table

    nat = table(spark, sf_dir, "nation")
    n_bad = nat.filter(F.col("n_nationkey") % 5 == 0).count()
    assert good.count() == nat.count() - n_bad
    q = spark.read.parquet(os.path.join(IO_DIR, "nation_quarantine"))
    rows = [r["_corrupt"] for r in q.collect()]
    assert len(rows) == n_bad
    assert all(r.startswith("x") for r in rows)  # raw poisoned text preserved


def test_parquet_vintage_directory_layout(tmp_path):
    """The s26 blob-fixture staleness key must track PART-FILE changes for a
    directory-shaped parquet table: rewriting a part file under the same
    name (in-place regeneration) must change the vintage even though the
    directory's own mtime/size stat does not (r12 advice — os.stat on a
    directory succeeds, so the old except-OSError branch was dead)."""
    import os
    import time

    from sparkfusion.suite.sources_suite import _parquet_vintage

    sf = tmp_path / "sfX"
    d = sf / "documents.parquet"
    d.mkdir(parents=True)
    p = d / "part-000.parquet"
    p.write_bytes(b"aaaa")
    v1 = _parquet_vintage(str(sf), "documents")
    dir_stat = os.stat(d).st_mtime_ns
    time.sleep(0.01)
    p.write_bytes(b"bbbb")  # same name, same size, newer mtime
    os.utime(d, ns=(dir_stat, dir_stat))  # pin the DIRECTORY stat unchanged
    v2 = _parquet_vintage(str(sf), "documents")
    assert v1 != v2

    # flat-file layout still keys on the file's own (mtime_ns, size)
    flat = tmp_path / "sfY"
    flat.mkdir()
    f = flat / "documents.parquet"
    f.write_bytes(b"cccc")
    u1 = _parquet_vintage(str(flat), "documents")
    time.sleep(0.01)
    f.write_bytes(b"dddd")
    assert _parquet_vintage(str(flat), "documents") != u1
