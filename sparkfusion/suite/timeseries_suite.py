"""Time-series suite: dense resample + gap fill, forward fill, moving
average, OHLC downsampling, z-score outliers — over the events table.

The reference has no time-series operators (SURVEY.md §2.4/§2.5 stop at
generic aggregates/windows); this family is what its users hand-write first
for metrics/events work. Determinism discipline: integer epoch-µs bucket
keys, DECIMAL sums cast to double BEFORE any division (decimal-division
scale rules differ across engines, IEEE double math does not), round(…, 6)
on interpolated outputs, (ts, event_id) composite ordering so window picks
never tie-break arbitrarily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.timeseries import (
    forward_fill,
    moving_avg,
    ohlc,
    resample_counts,
    zscore_outliers,
)
from ..operators.localrel import inline_rows
from ..session import events_with_ts
from . import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_with_ts(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )


@register(
    "ts1_resample_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT min(date_trunc('hour', ts)) AS lo, max(date_trunc('hour', ts)) AS hi
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds
    ), keys AS (
      SELECT DISTINCT event_type FROM events
    ), actual AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS n,
             sum(CAST(value AS DECIMAL(18,6))) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT k.event_type, epoch_us(s.bucket) AS bucket_us,
           COALESCE(a.n, 0) AS n,
           CAST(COALESCE(a.total, 0) AS DOUBLE) AS total_val
    FROM spine s CROSS JOIN keys k
    LEFT JOIN actual a ON a.event_type = k.event_type AND a.bucket = s.bucket
    """,
)
def ts1_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample of events per type, zero-filling empty buckets
    (720 hours × 5 types = 3600 rows; a plain groupBy yields only the 3385
    occupied cells). Spine = one tiny min/max aggregate → ``sequence()``
    explode → broadcast cross join with the distinct-type dimension; the
    only full-data shuffle is the per-bucket groupBy. See
    :func:`sparkfusion.operators.timeseries.resample_counts`."""
    ev = _events(spark, sf_dir)
    out = resample_counts(ev, "ts", ["event_type"], bucket="hour", agg_col="value")
    return out.select(
        "event_type",
        F.unix_micros(F.col("bucket")).alias("bucket_us"),
        "n",
        F.col("total").cast("double").alias("total_val"),
    )


@register(
    "ts2_forward_fill",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM events
    """,
)
def ts2_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward): each event carries
    the user's most recent purchase value; rows before the first purchase
    stay NULL. One window shuffle on user_id, per-partition sort only. See
    :func:`sparkfusion.operators.timeseries.forward_fill`."""
    ev = _events(spark, sf_dir).withColumn(
        "filled", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    out = forward_fill(ev, "filled", ["user_id"], ["ts_us", "event_id"])
    return out.select("event_id", "user_id", "ts_us", "filled")


@register(
    "ts3_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 / count(value) OVER w, 6) AS mavg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def ts3_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-row moving average of event value per user. DECIMAL sliding
    sum (Spark's incremental frame evaluation cannot drift from a full
    recompute) cast to double before the divide. See
    :func:`sparkfusion.operators.timeseries.moving_avg`."""
    ev = _events(spark, sf_dir)
    out = moving_avg(ev, "value", ["user_id"], ["ts_us", "event_id"], window_rows=5)
    return out.select("event_id", "user_id", F.round(F.col("mavg"), 6).alias("mavg"))


@register(
    "ts4_ohlc_hourly",
    oracle="""
    SELECT DISTINCT event_type, epoch_us(date_trunc('hour', ts)) AS bucket_us,
           first_value(value) OVER w AS open,
           max(value) OVER w AS high,
           min(value) OVER w AS low,
           last_value(value) OVER w AS close,
           count(*) OVER w AS n
    FROM events
    WINDOW w AS (PARTITION BY event_type, date_trunc('hour', ts)
                 ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def ts4_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per event type × hour, the first/max/min/last value
    ordered by (ts, event_id). Window picks only — no float arithmetic, so
    the output is bit-exact on any engine. See
    :func:`sparkfusion.operators.timeseries.ohlc`."""
    ev = _events(spark, sf_dir)
    out = ohlc(ev, "ts", "value", ["event_type"], bucket="hour", tiebreak=("event_id",))
    return out.select(
        "event_type",
        F.unix_micros(F.col("bucket")).alias("bucket_us"),
        "open",
        "high",
        "low",
        "close",
        "n",
    )


@register(
    "ts5_zscore_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,6))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value AS DECIMAL(12,6)) * CAST(value AS DECIMAL(12,6)))
                  AS DOUBLE) AS s2
      FROM events GROUP BY 1
    )
    SELECT event_id, e.event_type, value,
           round((value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS z
    FROM events e JOIN stats s ON s.event_type = e.event_type
    WHERE abs((value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))) > 2.5
    """,
)
def ts5_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 2.5). Group moments from DECIMAL
    sum / sum-of-squares (order-independent), broadcast back; per-row z is
    plain double math identical on both engines. See
    :func:`sparkfusion.operators.timeseries.zscore_outliers`."""
    ev = _events(spark, sf_dir)
    out = zscore_outliers(ev, "value", ["event_type"], threshold=2.5)
    return out.select(
        "event_id", "event_type", "value", F.round(F.col("z"), 6).alias("z")
    )


@register(
    "fe2_user_trend",
    oracle="""
    WITH q AS (
      SELECT user_id,
             epoch_us(ts) - 1700000000000000 AS x,
             CAST(round(value * 1000000) AS BIGINT) AS yq
      FROM events
    ),
    s AS (
      SELECT user_id, count(*) AS n, sum(x) AS sx, sum(yq) AS sy,
             sum(CAST(x AS HUGEINT) * yq) AS sxy, sum(CAST(x AS HUGEINT) * x) AS sxx
      FROM q GROUP BY user_id
    )
    SELECT user_id, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 9) AS slope_q
    FROM s
    WHERE n >= 2 AND n * sxx - sx * sx <> 0
    """,
)
def fe2_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS value trend (slope of value vs time) from EXACT moment
    sums — the per-entity drift/trend feature a feature store computes at
    scale. Closed form slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²): x is epoch-µs
    re-based near the data epoch and y quantized to 1e-6 so every sum is an
    exact DECIMAL(38,0)/INT128 integer (associative → partitioning-stable);
    the single double division at the end is IEEE-identical across engines,
    rounded to 9. One map-side-combinable groupBy — no window, no second
    pass. ``slope_q`` is in 1e-6 value units per µs."""
    ev = events_with_ts(spark, sf_dir)
    dec = "decimal(38,0)"
    x = (F.unix_micros(F.col("ts")) - F.lit(1700000000000000)).cast(dec)
    yq = F.round(F.col("value") * 1e6).cast("long").cast(dec)
    s = (
        ev.select("user_id", x.alias("x"), yq.alias("yq"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast(dec).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("yq").alias("sy"),
            F.sum(F.col("x") * F.col("yq")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        s.filter((F.col("n") >= 2) & (den != 0))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.round(num.cast("double") / den.cast("double"), 9).alias("slope_q"),
        )
    )


@register(
    "ts6_ewma",
    oracle="""
    WITH ordered AS (
      SELECT user_id, list(value ORDER BY epoch_us(ts), event_id) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(len(vals) AS INT) AS n,
           round(list_reduce(vals, (acc, x) -> acc * 0.8 + x * 0.2), 9) AS ewma
    FROM ordered
    """,
)
def ts6_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.2) per user — the
    recurrence ``acc = 0.8·acc + 0.2·x`` is inherently sequential, so no
    window function expresses it; instead the ordered value list folds
    through a higher-order ``aggregate`` (seeded with the first element to
    match DuckDB's ``list_reduce``). The fold is sequential on BOTH engines
    → bit-deterministic, rounded 9. Scale note: per-entity history must fit
    one task (bounded sessions/devices); unbounded streams use the
    incremental form — EWMA is itself a one-value-state streaming update."""
    ev = events_with_ts(spark, sf_dir).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "value",
    )
    ordered = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts_us", "event_id", "value"))),
            lambda s: s["value"],
        ).alias("vals")
    )
    fold = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: acc * F.lit(0.8) + x * F.lit(0.2),
    )
    return ordered.select(
        "user_id", F.size("vals").alias("n"), F.round(fold, 9).alias("ewma")
    )


@register(
    "ts7_acf",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // 86400000000 AS d,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    st AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s FROM daily),
    mu AS (SELECT s // n AS mu0 FROM st),
    den AS (
      SELECT sum(CAST(x - mu0 AS HUGEINT) * (x - mu0)) AS den
      FROM daily CROSS JOIN mu
    ),
    ks AS (SELECT unnest([1, 2, 3]) AS lag_k),
    num AS (
      SELECT k.lag_k, count(*) AS n_pairs,
             sum(CAST(a.x - mu0 AS HUGEINT) * (b.x - mu0)) AS num
      FROM ks k CROSS JOIN mu CROSS JOIN daily a
      JOIN daily b ON b.d = a.d + k.lag_k
      GROUP BY k.lag_k
    )
    SELECT CAST(n.lag_k AS INT) AS lag_k,
           CAST(n.n_pairs AS BIGINT) AS n_pairs,
           round(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE), 9) AS r_acf
    FROM num n CROSS JOIN den d
    """,
)
def ts7_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily-revenue series at lags 1–3 —
    the seasonality/momentum diagnostic behind every forecasting pipeline.
    Exactness discipline: the day key is tz-free integer epoch-µs division,
    daily revenue goes through DECIMAL(18,2) to integer cents, the mean is
    replaced by its integer floor μ₀ = S div n (error < 1 cent — the same
    integer-surrogate move as lm1/fn6), deviation products are exact BIGINT
    with DECIMAL(38,0) accumulation (day count × (5e8¢)² clears 2⁶³ at
    sf0.1 already), and the single IEEE division happens once per lag at
    the very end, round-9. Shape: one groupBy(day) over the fact table —
    everything after runs on the ~thousand-row daily aggregate (broadcast
    lag spine + equi-join on day+k, no window, no cross join beyond the
    1-row/3-row broadcasts)."""
    from ..session import table

    orders = table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
            ).alias("d")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("tot"))
        .select("d", (F.col("tot") * 100).cast("long").alias("x"))
        .localCheckpoint(eager=False)
    )
    st = daily.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    mu = st.select(F.expr("s div n").alias("mu0"))
    den = (
        daily.crossJoin(F.broadcast(mu))
        .agg(
            # cast BEFORE multiplying: at sf1 the daily-cents deviation
            # already squares past 2^63 (the sf0.1-only version overflowed
            # under ANSI at the 10x sweep)
            F.sum(
                (F.col("x") - F.col("mu0")).cast("decimal(38,0)")
                * (F.col("x") - F.col("mu0"))
            ).alias("den")
        )
    )
    ks = inline_rows(spark, [(1,), (2,), (3,)], "lag_k int")
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    num = (
        a.crossJoin(F.broadcast(ks))
        .join(b, F.col("db") == F.col("da") + F.col("lag_k"))
        .crossJoin(F.broadcast(mu))
        .groupBy("lag_k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                (F.col("xa") - F.col("mu0")).cast("decimal(38,0)")
                * (F.col("xb") - F.col("mu0"))
            ).alias("num"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        "lag_k", "n_pairs",
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 9
        ).alias("r_acf"),
    )


@register(
    "ts8_seasonal_decompose",
    oracle="""
    WITH h AS (
      SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us,
             CAST(extract(hour FROM date_trunc('hour', ts)) AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT bucket_us, hod, n,
             round(CAST(sum(n) OVER w AS DOUBLE) / count(n) OVER w, 6) AS trend
      FROM h
      WINDOW w AS (ORDER BY bucket_us ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    d AS (
      SELECT *, CAST(round(CAST(n AS DOUBLE) - trend, 6) AS DECIMAL(28,6)) AS detr
      FROM t
    ),
    s AS (
      SELECT hod, round(CAST(sum(detr) AS DOUBLE) / count(*), 6) AS seasonal
      FROM d GROUP BY hod
    )
    SELECT d.bucket_us, d.n, d.trend, s.seasonal,
           round(CAST(d.n AS DOUBLE) - d.trend - s.seasonal, 6) AS remainder
    FROM d JOIN s USING (hod)
    """,
)
def ts8_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the hourly event-count
    series: 25-point centered moving-average trend, hour-of-day seasonal
    profile, remainder — the STL-lite anomaly/forecast preprocessor (ts5's
    z-score flags outliers against a FLAT mean; this one first removes trend
    and daily cycle so real anomalies stand out). The distributed part is
    the raw-event hourly rollup; the decomposition windows run over the tiny
    aggregated series by design. See
    :func:`sparkfusion.operators.timeseries.seasonal_decompose` for the
    determinism contract."""
    from ..operators.timeseries import seasonal_decompose

    ev = events_with_ts(spark, sf_dir)
    hourly = (
        ev.select(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("bucket")).alias("bucket_us"),
            F.hour(F.col("bucket")).cast("long").alias("hod"),
            "n",
        )
    )
    return seasonal_decompose(
        hourly, "n", "bucket_us", "hod", half_window=12
    )


@register(
    "ts9_rolling_median",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, value,
             count(*) OVER w AS n_win,
             median(value) OVER w AS med
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
    )
    SELECT event_id, user_id, value, med FROM s WHERE n_win = 5
    """,
)
def ts9_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 5-point rolling MEDIAN per user series — the robust smoother
    ts3's mean cannot be (one spike drags a mean for its whole window;
    a median shrugs it off). Spark refuses aggregate median over a window
    frame, so the fixed-width median is built from pure expressions:
    array_sort over the (lag2, lag1, v, lead1, lead2) tuple, take the middle
    element — whole-stage codegen, no UDF, and EXACT (odd count → middle
    value, no interpolation, so the double compares bit-for-bit with
    DuckDB's window median). Edge rows without a full window are trimmed on
    BOTH sides (the oracle filters on the frame count) — partial-window
    medians of even counts would interpolate and reintroduce float risk.
    Scale: partitioned by user, no global order."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    lags = [
        F.lag("value", 2).over(w),
        F.lag("value", 1).over(w),
        F.col("value"),
        F.lead("value", 1).over(w),
        F.lead("value", 2).over(w),
    ]
    arr = F.array(*lags)
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            arr.alias("win"),
        )
        .filter(~F.exists("win", lambda x: x.isNull()))
        .select(
            "event_id",
            "user_id",
            "value",
            F.element_at(F.array_sort("win"), 3).alias("med"),
        )
    )
