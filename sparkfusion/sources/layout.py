"""Multi-dimensional data layout: Z-order (Morton) clustering for writes.

At 100 TB, pruning is the cheapest query accelerator there is — but a file
sorted on ONE column only prunes filters on that column. Z-ordering
interleaves the bits of several columns into one sort key, so files become
hyper-rectangles in the key space: per-file min/max footer statistics stay
narrow on EVERY participating dimension and parquet row-group/file skipping
works for filters on any of them (the technique Delta/Iceberg expose as
``OPTIMIZE ZORDER BY``; here it is a pure column expression + ordered write).

The z-value is whole-stage-codegen bit arithmetic — no UDF — and the write
is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``: a range shuffle
(sampled bounds, balanced output files), never a single-reducer global sort.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..errors import PlanError


def zvalue(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    (non-negative integer) column. Callers bucket continuous values first
    (fixed-width or quantile buckets) — the key only needs to be
    *locality-preserving*, not invertible."""
    cols = list(cols)
    n = len(cols)
    if n * bits > 63:
        raise PlanError(
            f"z-value needs {n}x{bits}={n * bits} bits, exceeding a signed "
            "64-bit key; lower `bits` (locality only needs the HIGH bits of "
            "each dimension) or drop a column"
        )
    terms = [
        F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)).cast("long")
        * F.lit(1 << (i * n + j)).cast("long")
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return reduce(lambda a, b: a + b, terms).alias("zval")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``: range
    partition on the z-key (balanced files), sort within each partition, and
    drop the key from the stored schema. Readers need no code change — the
    benefit is entirely in the parquet min/max footers."""
    z = zvalue([F.col(c) for c in cols], bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_range_sorted(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet globally ordered on ``cols`` WITHOUT a
    single-reducer sort: ``repartitionByRange`` samples split points and
    range-shuffles rows into ``num_files`` balanced slices, each slice sorts
    locally, and the slices are disjoint and ordered — so per-file min/max
    footers on the leading column never overlap and a point/range filter
    prunes to one (or few) files. The single-dimension sibling of
    :func:`write_zordered`: best when one column dominates the filter
    workload (e.g. time), Z-order when several do."""
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )

