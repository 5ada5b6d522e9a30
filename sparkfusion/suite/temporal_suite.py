"""Temporal & analytical extension suite: as-of join, bucketized range join,
top-k per group, CUBE, UNPIVOT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.temporal import as_of_join, interval_overlap_join, range_join_bucketed
from ..session import events_with_ts, table
from ..streaming import sessionize_batch
from . import register


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with integer epoch-µs ts (determinism-friendly)."""
    return events_with_ts(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", F.unix_micros(F.col("ts")).alias("ts_us")
    )


@register(
    "j9_asof_join",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, epoch_us(ts) AS r_ts, value FROM events WHERE event_type = 'view'
    )
    SELECT l.user_id, l.ts_us, l.event_id, r.value AS last_view_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.r_ts
    """,
)
def j9_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the user's most recent prior view value.

    Union-and-fill construction (one shuffle + one sort per key — no native
    asof needed); oracle is DuckDB's native ASOF LEFT JOIN.
    """
    ev = _events_us(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_us"), "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts_us"), F.col("value").alias("last_view_value")
    )
    return as_of_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        value_cols=["last_view_value"],
    )


@register(
    "j10_range_join",
    oracle="""
    WITH sessions AS (
      SELECT user_id, session_start, session_end FROM (
        WITH ordered AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
                 LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
          FROM events
        ), flagged AS (
          SELECT user_id, ts_us,
                 CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000 THEN 1 ELSE 0 END AS new_session
          FROM ordered
        ), numbered AS (
          SELECT user_id, ts_us,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id, MIN(ts_us) AS session_start, MAX(ts_us) + 1800000000 AS session_end
        FROM numbered GROUP BY user_id, sid
      )
    ), err AS (
      SELECT event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id, s.user_id, s.session_start
    FROM err e JOIN sessions s
      ON e.ts_us >= s.session_start AND e.ts_us <= s.session_end
    """,
)
def j10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with NO equi-key: which user sessions were active when each
    error event fired. Bucketized to an equi-join on a time bucket (1-hour
    width ≈ session length) + exact range filter — never a cross join.
    """
    ev = _events_us(spark, sf_dir)
    sessions = sessionize_batch(
        events_with_ts(spark, sf_dir).select("user_id", "ts"), gap_minutes=30
    ).select("user_id", "session_start", "session_end")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "ts_us")
    joined = range_join_bucketed(
        errors, sessions, "ts_us", "session_start", "session_end",
        bucket_width=3_600_000_000,
    )
    return joined.select("event_id", "user_id", "session_start")


@register(
    "j10_range_join_agg",
    oracle="""
    WITH sessions AS (
      SELECT user_id, session_start, session_end FROM (
        WITH ordered AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
                 LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
          FROM events
        ), flagged AS (
          SELECT user_id, ts_us,
                 CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000 THEN 1 ELSE 0 END AS new_session
          FROM ordered
        ), numbered AS (
          SELECT user_id, ts_us,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id, MIN(ts_us) AS session_start, MAX(ts_us) + 1800000000 AS session_end
        FROM numbered GROUP BY user_id, sid
      )
    ), err AS (
      SELECT event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'error'
    )
    SELECT s.user_id,
           COUNT(*) AS n_hits,
           COUNT(DISTINCT e.event_id) AS n_errors,
           MIN(s.session_start) AS first_session_start
    FROM err e JOIN sessions s
      ON e.ts_us >= s.session_start AND e.ts_us <= s.session_end
    GROUP BY s.user_id
    """,
)
def j10_range_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR-OUTPUT sibling of ``j10_range_join`` (r10 verdict #2): the
    same bucketized range join (errors × active sessions, equi-join on the
    1-hour time bucket + exact range filter — never a cross join), but
    aggregated per user — (distinct-error count, hit count, first session)
    — so the OUTPUT is O(users) while j10 materializes every (error,
    session) pair, whose cardinality is quadratic in temporal density under
    copy-scaling. This is the shape a 100 TB incident-correlation job
    actually ships (the pair list is an intermediate, not a result), and it
    returns the operator to the exclusion-free sf1 sweep. Plan: one bucket
    equi-join shuffle, then a partial-aggregated groupBy on user_id."""
    ev = _events_us(spark, sf_dir)
    sessions = sessionize_batch(
        events_with_ts(spark, sf_dir).select("user_id", "ts"), gap_minutes=30
    ).select("user_id", "session_start", "session_end")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "ts_us")
    joined = range_join_bucketed(
        errors, sessions, "ts_us", "session_start", "session_end",
        bucket_width=3_600_000_000,
    )
    # NOTE (r14): an explicit repartition(user_id) here A/B'd catastrophic
    # at sf1 — it shuffles the RAW quadratic pair set (759MB) that the
    # partial aggregation otherwise collapses map-side. The parallelism fix
    # lives inside range_join_bucketed (explicit bucket-join width), which
    # keeps the partial agg on the join's 32-wide output.
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.countDistinct("event_id").alias("n_errors"),
        F.min("session_start").alias("first_session_start"),
    )


@register(
    "w3_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def w3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window (guide 'Top-K per group'): the
    partitioned sort replaces a per-group global sort; deterministic tiebreak
    on the key."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        table(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )


@register(
    "w4_lag_lead_rank",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_id) OVER w AS prev_event,
           LEAD(event_id) OVER w AS next_event,
           RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def w4_lag_lead_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset (lag/lead) + ranking window functions — beyond the reference's
    aggregate-only window surface (SURVEY.md §2.5 'no ranking or offset
    functions appear'); deterministic orderings via event_id tiebreaks."""
    ev = _events_us(spark, sf_dir)
    w_time = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_rank = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return ev.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w_time).alias("prev_event"),
        F.lead("event_id").over(w_time).alias("next_event"),
        F.rank().over(w_rank).alias("value_rank"),
    )


@register(
    "w5_ntile_percent_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def w5_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist) —
    completes the §2.5 ranking surface beyond the reference's aggregate-only
    windows. percent_rank = (rank-1)/(n-1) and cume_dist = rows≤cur/n are
    single integer divisions on both engines (cross-engine exact);
    deterministic full ordering via the custkey tiebreak."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "a12_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping combinations in one pass."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "p20_unpivot",
    oracle="""
    SELECT s_suppkey, metric, val FROM (
      SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS val FROM supplier
      UNION ALL
      SELECT s_suppkey, 'nationkey' AS metric, s_nationkey::DOUBLE AS val FROM supplier
    )
    """,
)
def p20_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — wide→long reshape (Spark 3.4 ``unpivot``)."""
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    )
    return sup.unpivot("s_suppkey", ["acctbal", "nationkey"], "metric", "val")


@register(
    "j11_interval_overlap",
    oracle="""
    WITH p AS (
      SELECT event_id AS l_id, epoch_us(ts) AS ls, epoch_us(ts) + 3600000000 AS le
      FROM events WHERE event_type = 'purchase'
    ), e AS (
      SELECT event_id AS r_id, epoch_us(ts) AS rs, epoch_us(ts) + 1800000000 AS re
      FROM events WHERE event_type = 'error'
    )
    SELECT l_id, r_id, least(le, re) - greatest(ls, rs) AS overlap_us
    FROM p JOIN e ON ls <= re AND rs <= le
    """,
)
def j11_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join with NO equi-key: purchase windows (1 h) ×
    error windows (30 min) that overlap in time — incident-correlation /
    attribution shape. Bucketed to 1-hour cells with canonical-bucket
    dedup (each pair emitted exactly once, no distinct): an ordinary
    equi-join, vs the oracle's un-bucketed IEJoin. See
    :func:`sparkfusion.operators.temporal.interval_overlap_join`."""
    ev = events_with_ts(spark, sf_dir).select(
        "event_id", "event_type", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    HOUR = 3_600_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("l_id"),
        F.col("ts_us").alias("ls"),
        (F.col("ts_us") + HOUR).alias("le"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("r_id"),
        F.col("ts_us").alias("rs"),
        (F.col("ts_us") + HOUR // 2).alias("re"),
    )
    out = interval_overlap_join(purchases, errors, "ls", "le", "rs", "re", HOUR)
    return out.select(
        "l_id",
        "r_id",
        (F.least(F.col("le"), F.col("re")) - F.greatest(F.col("ls"), F.col("rs"))).alias(
            "overlap_us"
        ),
    )


@register(
    "j11_overlap_agg",
    oracle="""
    WITH p AS (
      SELECT event_id AS l_id, epoch_us(ts) AS ls, epoch_us(ts) + 3600000000 AS le
      FROM events WHERE event_type = 'purchase'
    ), e AS (
      SELECT event_id AS r_id, epoch_us(ts) AS rs, epoch_us(ts) + 1800000000 AS re
      FROM events WHERE event_type = 'error'
    )
    SELECT l_id,
           COUNT(*) AS n_overlaps,
           CAST(SUM(least(le, re) - greatest(ls, rs)) AS BIGINT) AS total_overlap_us
    FROM p JOIN e ON ls <= re AND rs <= le
    GROUP BY l_id
    """,
)
def j11_overlap_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR-OUTPUT sibling of ``j11_interval_overlap`` (r10 verdict #2):
    the same canonical-bucket interval join (purchase windows × error
    windows), aggregated per purchase — (overlap count, total overlap µs)
    — so the OUTPUT is O(purchases) instead of quadratic in temporal
    density. Integer-µs sums are exact; the DuckDB side casts its HUGEINT
    SUM back to BIGINT (the r6 type-tag lesson). Plan: bucket equi-join +
    partial-aggregated groupBy on the left id — exclusion-free at sf1."""
    ev = events_with_ts(spark, sf_dir).select(
        "event_id", "event_type", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    HOUR = 3_600_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("l_id"),
        F.col("ts_us").alias("ls"),
        (F.col("ts_us") + HOUR).alias("le"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("r_id"),
        F.col("ts_us").alias("rs"),
        (F.col("ts_us") + HOUR // 2).alias("re"),
    )
    out = interval_overlap_join(purchases, errors, "ls", "le", "rs", "re", HOUR)
    return out.groupBy("l_id").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.sum(F.least(F.col("le"), F.col("re")) - F.greatest(F.col("ls"), F.col("rs")))
        .cast("long")
        .alias("total_overlap_us"),
    )


@register(
    "w6_time_range_frame",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           count(*) OVER w AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def w6_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): for every event, the
    count and exact DECIMAL sum of the same user's events in the trailing
    ONE HOUR — the per-row rolling rate-limit / velocity feature that ROWS
    frames cannot express when event spacing is irregular. One window
    shuffle on user_id; the frame bound is integer epoch-µs so both engines
    cut it identically (ties included on BOTH rows at equal ts, per RANGE
    semantics)."""
    ev = events_with_ts(spark, sf_dir).select(
        "event_id", "user_id", "value", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    dec = F.col("value").cast("decimal(18,6)")
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(dec).over(w).cast("double").alias("sum_last_hour"),
    )


@register(
    "w7_running_distinct",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_types_so_far
    FROM events
    """,
)
def w7_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered window — Spark has no DISTINCT
    window aggregate, and the naive ``size(collect_set() over w)`` buffers
    every distinct value per row (OOM on high-cardinality keys at 100 TB).
    Scale-safe emulation: mark each (user, type)'s FIRST occurrence with one
    row_number window, then a running SUM of the 0/1 marker over the time
    order — two windows sharing the same user_id shuffle, constant state per
    row, whole-stage codegen throughout. Total order (ts_us, event_id) is
    unique, so both engines cut every frame identically."""
    ev = _events_us(spark, sf_dir)
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("is_first", (F.row_number().over(w_first) == 1).cast("long"))
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.sum("is_first").over(w_run).alias("n_types_so_far"),
        )
    )


@register(
    "w8_value_windows",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event,
           nth_value(event_id, 2) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def w8_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions (first_value / last_value / nth_value): per
    event, the user's first, last, and second event ids in time order.
    last_value/nth_value get the explicit UNBOUNDED FOLLOWING frame (the
    default frame ends at CURRENT ROW — the classic silent-wrong-answer);
    the unique (ts_us, event_id) order makes all three deterministic."""
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w_full).alias("last_event"),
        F.nth_value("event_id", 2).over(w_full).alias("second_event"),
    )


@register(
    "w10_rank_with_ties",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             rank() OVER (PARTITION BY c_mktsegment
                          ORDER BY round(c_acctbal, -2) DESC) AS rnk
      FROM customer
    ) WHERE rnk <= 3
    """,
)
def w10_rank_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group WITH ties (rank() ≤ k): equal keys all survive — the
    semantic w3's row_number top-k cannot express (row_number arbitrarily
    drops tied rows without a tiebreak; rank keeps them and may return more
    than k). Balances rounded to hundreds so ties actually occur."""
    from pyspark.sql import Window

    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.round("c_acctbal", -2).desc())
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )
