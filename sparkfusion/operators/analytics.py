"""Event-analytics operators: ordered funnels, cohort retention, SCD-2
validity intervals.

The reference engine exposes the relational primitives these compose from
(joins `src/utils/dataframe.rs:228-264`, window/group aggregation
`src/utils/dataframe.rs:120-150`); an analytics user of the reference would
hand-write these same shapes in SQL. Here they are first-class operators
built from declarative DataFrame transforms so Catalyst keeps pushdown /
AQE / broadcast choices.

Scale posture (100 TB): every shape below shuffles at most on the entity
key (`user_id`) — funnels chain per-stage joins on that one key so AQE can
broadcast the rapidly-shrinking reached-set; retention joins a distinct-day
activity frame against a tiny cohort map; SCD-2 is a single window over the
entity partition. No collects, no cross joins, no global sorts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..errors import PlanError


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches stage *i* iff they emitted
    ``steps[i]`` strictly AFTER the timestamp at which they reached stage
    *i-1* (earliest-completion semantics — stage time is the MIN qualifying
    event time, so results are order-deterministic).

    Returns one row per stage: ``(stage, step, users)``.

    Plan shape: stage 0 is one groupBy(user); each later stage is an
    equi-join of that step's events against the previous reached-set
    followed by a min-agg — all shuffles hash on ``user_col``, and the
    reached-set only shrinks, so AQE flips the joins to broadcast as the
    funnel narrows. No window over all events, no per-user sort.
    """
    if not steps:
        raise PlanError("funnel: steps must be non-empty")
    base = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__t"),
        F.col(type_col).alias("__e"),
    )
    reached = (
        base.filter(F.col("__e") == steps[0])
        .groupBy("__u")
        .agg(F.min("__t").alias("__rt"))
    )
    stages = [reached.select("__u", F.lit(0).alias("stage"), F.lit(steps[0]).alias("step"))]
    for i, step in enumerate(steps[1:], start=1):
        reached = (
            base.filter(F.col("__e") == step)
            .join(reached.select("__u", "__rt"), "__u")
            .filter(F.col("__t") > F.col("__rt"))
            .groupBy("__u")
            .agg(F.min("__t").alias("__rt"))
        )
        stages.append(
            reached.select("__u", F.lit(i).alias("stage"), F.lit(step).alias("step"))
        )
    union = stages[0]
    for s in stages[1:]:
        union = union.unionByName(s)
    # each stage frame is already one row per user → count(*) == distinct users
    return (
        union.groupBy("stage", "step")
        .agg(F.count(F.lit(1)).alias("users"))
    )


def cohort_retention(
    events: DataFrame,
    cohort_event: str,
    activity_event: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the DAY of their first
    ``cohort_event``; for each later day on which they emitted
    ``activity_event``, count distinct active users per
    ``(cohort_day, day_offset)``.

    Plan shape: cohort map = one groupBy(user) over the cohort-event subset
    (tiny: one row per user); activity = distinct (user, day) pairs; the
    join hashes on ``user_col`` and AQE broadcasts the cohort map when it
    fits. The final groupBy is over a bounded (days × offsets) key space.
    """
    cohorts = (
        events.filter(F.col(type_col) == cohort_event)
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(F.to_date(ts_col)).alias("cohort_day"))
    )
    activity = (
        events.filter(F.col(type_col) == activity_event)
        .select(F.col(user_col).alias("__u"), F.to_date(ts_col).alias("__day"))
        .distinct()
    )
    return (
        activity.join(cohorts, "__u")
        .filter(F.col("__day") >= F.col("cohort_day"))
        .groupBy("cohort_day", F.datediff("__day", "cohort_day").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("users"))
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: Column | str,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 shaping: each row becomes a validity
    interval ``[valid_from, valid_to)`` where ``valid_to`` is the next row's
    timestamp within the same key partition (NULL ⇒ current row).

    ``order_tiebreak`` columns break equal-timestamp ties so the interval
    chain is deterministic. One window shuffle on ``key_cols``; the sort is
    per-partition (bounded by per-key cardinality), never global.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    order = [ts.asc()] + [F.col(c).asc() for c in order_tiebreak]
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    return df.withColumn("valid_from", ts).withColumn(
        "valid_to", F.lead(ts).over(w)
    ).withColumn("is_current", F.col("valid_to").isNull())
