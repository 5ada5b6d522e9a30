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


def hilbert_level_exprs(
    bits: int, x: str = "hx", y: str = "hy", d: str = "hd"
) -> list[tuple[str, str, str]]:
    """Per-level ``(x', y', d')`` SQL expression strings for the 2-D Hilbert
    curve index (the classic xy2d bit loop, unrolled: one tuple per bit level,
    highest first). The strings are plain ANSI arithmetic + CASE — valid
    verbatim in BOTH Spark SQL and DuckDB, which is what makes the suite
    oracle share the exact math instead of re-deriving it. The xor in
    ``d += s²·((3·rx) ^ ry)`` is replaced by the identity
    ``3·rx + ry − 2·rx·ry`` (equal on {0,1}²) so no engine-specific xor
    syntax is needed. Bijectivity + unit-step adjacency of this exact
    recurrence are pinned in tests/test_layout.py."""
    n = 1 << bits
    levels = []
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
        d_expr = f"({d} + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry}))"
        x_expr = (
            f"(CASE WHEN {ry} = 1 THEN {x} "
            f"WHEN {rx} = 1 THEN {n - 1} - {y} ELSE {y} END)"
        )
        y_expr = (
            f"(CASE WHEN {ry} = 1 THEN {y} "
            f"WHEN {rx} = 1 THEN {n - 1} - {x} ELSE {x} END)"
        )
        levels.append((x_expr, y_expr, d_expr))
    return levels


def with_hilbert_key(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    keep: Sequence[str],
    bits: int = 8,
    out: str = "hval",
) -> DataFrame:
    """Append the 2-D Hilbert index of ``(x_expr, y_expr)`` (SQL strings
    yielding non-negative ints < 2^bits) as column ``out``.

    Hilbert ordering is the stronger sibling of :func:`zvalue`: every unit
    step along the key moves exactly one cell in (x, y), so consecutive rows
    in the written file are always spatial neighbours — file min/max
    footers stay ~2× narrower than Morton's diagonal jumps on the same data
    (Morton crosses the whole space at power-of-two boundaries; Hilbert never
    does). Cost: ``bits`` chained projections instead of one bit-interleave —
    all whole-stage-codegen, collapsed by Catalyst into a single map stage,
    no UDF and no shuffle."""
    if 2 * bits > 62:
        raise PlanError(f"hilbert key needs 2x{bits} bits, exceeding BIGINT")
    reserved = {"__hx", "__hy", "__hd"}
    clash = reserved.intersection(keep) | {out} & reserved
    if clash:
        raise PlanError(f"keep/out collide with hilbert working columns: {sorted(clash)}")
    cur = df.selectExpr(
        *keep,
        f"CAST(({x_expr}) AS BIGINT) AS __hx",
        f"CAST(({y_expr}) AS BIGINT) AS __hy",
        "CAST(0 AS BIGINT) AS __hd",
    )
    for xe, ye, de in hilbert_level_exprs(bits, x="__hx", y="__hy", d="__hd"):
        cur = cur.selectExpr(
            *keep, f"{xe} AS __hx", f"{ye} AS __hy", f"{de} AS __hd"
        )
    return cur.selectExpr(*keep, f"__hd AS {out}")


def write_hilbert_ordered(
    df: DataFrame,
    path: str,
    x_expr: str,
    y_expr: str,
    bits: int = 8,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Hilbert index of two bucketed
    dimensions — same write shape as :func:`write_zordered` (range shuffle on
    the key, sort within partitions, key dropped from the stored schema),
    with Hilbert's tighter locality in the per-file footers."""
    keyed = with_hilbert_key(
        df, x_expr, y_expr, keep=list(df.columns), bits=bits, out="__h"
    )
    (
        keyed.repartitionByRange(num_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
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

