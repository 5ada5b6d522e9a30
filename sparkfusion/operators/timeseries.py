"""Time-series operators: dense resampling with gap fill, forward fill,
moving aggregates, OHLC downsampling, and z-score outlier detection.

The reference engine has no time-series surface (its users hand-roll these
over the DataFrame API — SURVEY.md §2.4/§2.5 show only generic aggregates and
windows); these are the operations an events/metrics pipeline needs daily,
built as pure Catalyst plan compositions (build-brief preference (a)): no
Pandas UDF, no driver-side loops, so they run at any scale with ordinary
shuffle/sort machinery.

Scale notes (100 TB posture):
- ``resample_counts`` builds the dense time spine from ONE tiny global
  min/max aggregate (2 values on the driver-free plan — the spine frame is
  ``sequence()``-exploded on executors, then cross-joined with the key
  dimension which is itself an aggregate output, broadcast by AQE). The
  only full-data shuffle is the per-bucket groupBy.
- ``forward_fill`` / ``moving_avg`` / ``ohlc`` are single-window operators:
  one hash shuffle on the partition key, per-partition sort only — no
  global sort, no WindowExec-without-partition single-reducer hazard.
- ``zscore_outliers`` computes per-group moments via DECIMAL sums (parallel
  sum order cannot flip float bits — ARCHITECTURE.md principle 4), joins
  them back as a broadcast (group cardinality ≪ row count), and filters
  row-side in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_counts(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    bucket: str = "hour",
    agg_col: str | None = None,
) -> DataFrame:
    """Dense-resample event counts (and optionally a DECIMAL sum of
    ``agg_col``) into fixed ``bucket`` buckets per ``keys`` combination,
    emitting zero rows for empty buckets (the gap-fill every dashboard and
    anomaly detector needs — a plain groupBy silently drops empty buckets).

    Spine construction is distributed: ``sequence(min_bucket, max_bucket,
    interval 1 <bucket>)`` exploded on executors, cross-joined with the
    distinct key set. Both inputs to that cross join are aggregate outputs
    (2-row bounds × k keys), so AQE broadcasts them — this is a legitimate
    tiny-side crossJoin per CLAUDE.md posture, not an all-pairs hazard.
    """
    keys = list(keys)
    b = F.date_trunc(bucket, F.col(ts_col))
    # ONE scan of df: bounds and the key dimension both reduce from the
    # (tiny) aggregated frame, which feeds three subtrees -> cache it
    actual = df.groupBy(*keys, b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        *(
            [F.sum(F.col(agg_col).cast("decimal(18,6)")).alias("total")]
            if agg_col
            else []
        ),
    ).cache()
    bounds = actual.agg(
        F.min("bucket").alias("lo"),
        F.max("bucket").alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {bucket}"))
        ).alias("bucket")
    )
    key_dim = actual.select(*keys).distinct()
    dense = spine.crossJoin(F.broadcast(key_dim))
    fill = {"n": F.lit(0).cast("long")}
    if agg_col:
        fill["total"] = F.lit(0).cast("decimal(18,6)")
    out = dense.join(actual, on=[*keys, "bucket"], how="left")
    return out.select(
        *keys,
        "bucket",
        F.coalesce(F.col("n"), fill["n"]).alias("n"),
        *(
            [F.coalesce(F.col("total"), fill["total"]).alias("total")]
            if agg_col
            else []
        ),
    )


def forward_fill(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Forward-fill (last observation carried forward): replace NULL
    ``value_col`` with the most recent non-NULL value within each ``keys``
    group ordered by ``order_by``. One window; rows before the first
    observation stay NULL.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(value_col, F.last(F.col(value_col), ignorenulls=True).over(w))


def moving_avg(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    order_by: Sequence[str],
    window_rows: int = 5,
    out_col: str = "mavg",
) -> DataFrame:
    """Trailing moving average over the last ``window_rows`` rows per group.

    The sum runs in DECIMAL so Spark's incremental sliding-frame evaluation
    and any other engine's full-frame recompute agree bit-for-bit; the
    exact sum is cast to double BEFORE the divide (decimal-division scale
    rules are engine-specific, double IEEE math is not).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(-(window_rows - 1), 0)
    )
    dec = F.col(value_col).cast("decimal(18,6)")
    return df.withColumn(
        out_col,
        F.sum(dec).over(w).cast("double") / F.count(dec).over(w),
    )


def ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    bucket: str = "hour",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """OHLC downsampling: per ``keys`` × time bucket, the first (open), max
    (high), min (low), and last (close) ``value_col``, ordered by
    (``ts_col``, *tiebreak*) so ties resolve deterministically.

    first/last are window picks over the bucket partition (per-partition
    sort), then one distinct per bucket — open/close cannot be expressed as
    plain aggregates without an ordering, and ``min_by``/``max_by`` lack a
    composite tiebreak.
    """
    keys = list(keys)
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    base = df.select(*keys, b, F.col(ts_col).alias("__ts"), F.col(value_col).alias("__v"),
                     *[F.col(c).alias(f"__tb_{i}") for i, c in enumerate(tiebreak)])
    order = [F.col("__ts")] + [F.col(f"__tb_{i}") for i in range(len(tiebreak))]
    wf = Window.partitionBy(*keys, "bucket").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    enriched = base.select(
        *keys,
        "bucket",
        F.first("__v").over(wf).alias("open"),
        F.max("__v").over(wf).alias("high"),
        F.min("__v").over(wf).alias("low"),
        F.last("__v").over(wf).alias("close"),
        F.count(F.lit(1)).over(wf).alias("n"),
    )
    return enriched.distinct()


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    threshold: float = 2.5,
) -> DataFrame:
    """Per-group z-score outlier detection: rows where
    ``|x - mean| / stddev > threshold`` within their ``keys`` group.

    Moments come from DECIMAL sum / sum-of-squares (exact, order-independent
    across partitions); the per-row z arithmetic is then plain double math —
    identical on every engine given identical inputs. Population stddev
    (n divisor) keeps the formula closed-form from the two sums.
    """
    keys = list(keys)
    dec = F.col(value_col).cast("decimal(12,6)")
    stats = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(dec).alias("__s1"),
        F.sum(dec * dec).alias("__s2"),
    )
    joined = df.join(F.broadcast(stats), on=keys)
    # cast the EXACT decimal sums to double BEFORE dividing: decimal-division
    # scale/rounding rules are engine-specific, double IEEE math is not
    mean = F.col("__s1").cast("double") / F.col("__n")
    var = F.col("__s2").cast("double") / F.col("__n") - mean * mean
    sd = F.sqrt(var)
    z = (F.col(value_col) - mean) / sd
    return (
        joined.withColumn("z", z)
        .filter(F.abs(F.col("z")) > F.lit(threshold))
        .drop("__n", "__s1", "__s2")
    )


def seasonal_decompose(
    series: DataFrame,
    value_col: str,
    bucket_col: str,
    period_col: str,
    half_window: int = 12,
) -> DataFrame:
    """Moving-average seasonal decomposition (the classical additive
    decomposition STL refines): over a REGULAR aggregated series,
    ``trend`` = centered (2·half_window+1)-point moving average,
    ``seasonal`` = per-period mean of the detrended values (period given by
    ``period_col``, e.g. hour-of-day), ``remainder`` = value − trend −
    seasonal. The anomaly-detection / forecasting preprocessor every
    metrics stack needs one step past ts3's plain moving average.

    Determinism: window sums of integer values are exact; trend is ONE
    double division rounded to 6 dp; detrended values are rounded then
    re-summed in DECIMAL so the per-period mean is independent of partition
    order; remainder subtracts the two rounded components in pinned order.

    Scale: the input is the AGGREGATED series (hours/days — thousands of
    rows at any corpus size), so the unpartitioned ordered window is a
    deliberate single-task stage over a tiny frame; the raw-event rollup
    that feeds it is the distributed part. Period means join back via a
    broadcast of ≤period-cardinality rows."""
    w = Window.orderBy(bucket_col).rowsBetween(-half_window, half_window)
    trend = F.round(
        F.sum(F.col(value_col)).over(w).cast("double")
        / F.count(F.col(value_col)).over(w),
        6,
    )
    base = series.select(
        bucket_col,
        period_col,
        F.col(value_col).cast("long").alias(value_col),
        trend.alias("trend"),
    )
    detr = F.round(F.col(value_col).cast("double") - F.col("trend"), 6).cast(
        "decimal(28,6)"
    )
    per = (
        base.select(period_col, detr.alias("detr"))
        .groupBy(period_col)
        .agg(
            F.round(
                F.sum("detr").cast("double") / F.count(F.lit(1)), 6
            ).alias("seasonal")
        )
    )
    return base.join(F.broadcast(per), period_col).select(
        bucket_col,
        value_col,
        "trend",
        "seasonal",
        F.round(
            F.col(value_col).cast("double") - F.col("trend") - F.col("seasonal"), 6
        ).alias("remainder"),
    )
