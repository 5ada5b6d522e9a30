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


def _xy2d_ref(n: int, x: int, y: int) -> int:
    """Reference Hilbert xy2d (classic bit loop) — the ground truth the
    SQL-expression chain must reproduce exactly."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_curve_is_bijective_with_unit_steps():
    """The recurrence itself: bijection onto [0, n²) and every consecutive
    pair of indices maps to spatially adjacent cells (the locality property
    Morton lacks at power-of-two boundaries)."""
    n = 16
    m = {}
    for x in range(n):
        for y in range(n):
            m[_xy2d_ref(n, x, y)] = (x, y)
    assert sorted(m) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = m[d], m[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_with_hilbert_key_matches_reference(spark):
    from sparkfusion.sources.layout import with_hilbert_key

    n = 16
    df = spark.createDataFrame(
        [(x * n + y, x, y) for x in range(n) for y in range(n)],
        "id long, x long, y long",
    )
    out = with_hilbert_key(df, "x", "y", keep=["id"], bits=4, out="hval")
    got = {r["id"]: r["hval"] for r in out.collect()}
    for x in range(n):
        for y in range(n):
            assert got[x * n + y] == _xy2d_ref(n, x, y), (x, y)


def test_hilbert_write_narrows_both_dims(xy_frame, tmp_path):
    from sparkfusion.sources.layout import write_hilbert_ordered

    hpath, xpath = str(tmp_path / "hil"), str(tmp_path / "xsort2")
    write_hilbert_ordered(xy_frame, hpath, "x", "y", bits=8, num_files=16)
    (
        xy_frame.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    h_x, h_y = _file_spans(hpath, "x"), _file_spans(hpath, "y")
    b_y = _file_spans(xpath, "y")
    mean = lambda s: sum(s) / len(s)
    assert mean(b_y) > 200
    assert mean(h_x) < mean(b_y) / 2
    assert mean(h_y) < mean(b_y) / 2
    # schema unchanged and content preserved
    sess = xy_frame.sparkSession
    assert sorted(sess.read.parquet(hpath).columns) == ["x", "y"]
    assert sess.read.parquet(hpath).count() == xy_frame.count()
