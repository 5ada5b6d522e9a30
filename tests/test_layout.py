"""Z-order layout tests: key math + the actual pruning benefit (per-file
min/max footer width on BOTH dimensions)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from sparkfusion.sources.layout import write_zordered, zvalue


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "x int, y int")
    out = {
        (r["x"], r["y"]): r["zval"]
        for r in df.select("x", "y", zvalue([F.col("x"), F.col("y")], bits=4)).collect()
    }
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1  # x owns even bit positions
    assert out[(0, 1)] == 2  # y owns odd bit positions
    # x=3 (0b11), y=5 (0b101) -> interleaved 0b100111 = 39
    assert out[(3, 5)] == 0b100111


def _file_spans(path: str, col: str) -> list[float]:
    spans = []
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index(col)
        md = pf.metadata
        stats = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
        spans.append(max(s.max for s in stats) - min(s.min for s in stats))
    return spans


@pytest.fixture()
def xy_frame(spark):
    # two independent uniform dims, deterministic
    return spark.range(4000).select(
        (F.hash(F.col("id")) % 256 + 256) % 256,
        (F.hash(F.col("id") + 1_000_000) % 256 + 256) % 256,
    ).toDF("x", "y")


def test_zorder_write_narrows_both_dims(xy_frame, tmp_path):
    zpath, xpath = str(tmp_path / "zord"), str(tmp_path / "xsort")
    write_zordered(xy_frame, zpath, ["x", "y"], bits=8, num_files=16)
    # baseline: single-column sort (what a naive pipeline writes)
    (
        xy_frame.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    z_x, z_y = _file_spans(zpath, "x"), _file_spans(zpath, "y")
    b_x, b_y = _file_spans(xpath, "x"), _file_spans(xpath, "y")
    mean = lambda s: sum(s) / len(s)
    # x-sorted baseline: x narrow but y spans ~the full 0..255 range
    assert mean(b_y) > 200
    # z-order: BOTH dims substantially narrowed -> min/max pruning works on either
    assert mean(z_x) < mean(b_y) / 2
    assert mean(z_y) < mean(b_y) / 2


def test_zvalue_rejects_key_wider_than_63_bits(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2, 3, 4)], "a int, b int, c int, d int")
    with _pytest.raises(ValueError, match="64-bit"):
        df.select(zvalue([F.col(c) for c in "abcd"], bits=16))


def test_range_sorted_write_files_disjoint(spark, sf_dir, tmp_path):
    """Per-file [min,max] spans of the sort column must be pairwise disjoint
    (that's what makes footer pruning hit exactly one file per point)."""
    import glob

    import pyarrow.parquet as pq

    from sparkfusion.sources.layout import write_range_sorted
    from sparkfusion.session import table

    path = str(tmp_path / "orders_sorted")
    orders = table(spark, sf_dir, "orders")
    write_range_sorted(orders, path, ["o_totalprice"], num_files=4)
    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "o_totalprice"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"file spans overlap: {hi1} > {lo2}"
    # content preserved
    assert spark.read.parquet(path).count() == orders.count()
