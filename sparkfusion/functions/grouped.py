"""Grouped-map and cogrouped-map pandas operators (X-surface extensions).

The reference's UDF story is scalar/struct UDFs only (SURVEY.md §2.10);
Spark's remaining Python-operator shapes are the per-group pandas transforms:

- ``groupBy().applyInPandas`` — one pandas DataFrame per group in, rows out
  (the "custom per-group algorithm" escape hatch);
- ``groupBy().cogroup(...).applyInPandas`` — TWO co-partitioned groups in
  (the custom join/alignment escape hatch, e.g. pandas ``merge_asof``).

Both ship here with deliberately SQL-expressible logic so the suite can
oracle-check the Python path against DuckDB; their docstrings spell out that
a pure-expression plan is preferred when the semantics allow (CLAUDE.md
posture: UDFs are the slow path). Scale shape: each group must fit one
worker's memory — keys here are event_type/user_id with bounded groups; a
production pipeline salts or pre-aggregates mega-groups first.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

NORM_SCHEMA = "event_type string, event_id bigint, value double, z double"


def _normalize_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Median/MAD robust z-score within one group. Both medians round to 6dp
    BEFORE use (a19/a14 discipline: interpolated percentiles carry sub-ulp
    engine variance; rounding the statistic makes every downstream number a
    function of identical inputs on both engines)."""
    med = round(float(pdf["value"].median()), 6)
    mad = round(float((pdf["value"] - med).abs().median()), 6)
    z = (pdf["value"] - med) / mad if mad > 0 else pd.Series(0.0, index=pdf.index)
    return pd.DataFrame(
        {
            "event_type": pdf["event_type"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "z": z.round(9),
        }
    )


def grouped_robust_normalize(events: DataFrame) -> DataFrame:
    """Per-event_type robust normalization via ``applyInPandas`` — the
    grouped-map shape (model-per-group fitting, custom per-group algorithms).
    This particular logic IS expressible as two exact-percentile windows
    (that expression is the suite oracle); the operator exists to prove the
    grouped-map path end to end with a checkable result."""
    return (
        events.select("event_type", "event_id", "value")
        .groupBy("event_type")
        .applyInPandas(_normalize_group, schema=NORM_SCHEMA)
    )


ATTR_SCHEMA = "user_id bigint, n_purchases bigint, n_attributed bigint"


def _attribute(purchases: pd.DataFrame, views: pd.DataFrame) -> pd.DataFrame:
    """Count purchases with >=1 view in the preceding hour for one user.

    A key absent from one side arrives as a ZERO-COLUMN pandas frame (not
    merely zero rows), so guards must check columns, not just ``.empty``.
    """
    if "user_id" not in purchases.columns or not len(purchases):
        return pd.DataFrame(columns=["user_id", "n_purchases", "n_attributed"]).astype(
            {"user_id": "int64", "n_purchases": "int64", "n_attributed": "int64"}
        )
    uid = int(purchases["user_id"].iloc[0])
    vt = views["ts_us"].to_numpy() if "ts_us" in views.columns and len(views) else []
    n_attr = 0
    for t in purchases["ts_us"]:
        if len(vt) and ((vt >= t - 3_600_000_000) & (vt < t)).any():
            n_attr += 1
    return pd.DataFrame(
        {"user_id": [uid], "n_purchases": [len(purchases)], "n_attributed": [n_attr]}
    )


def cogroup_view_attribution(purchases: DataFrame, views: DataFrame) -> DataFrame:
    """Per-user purchase attribution via ``cogroup().applyInPandas`` — the
    cogrouped-map shape: both sides arrive co-partitioned by user_id as
    pandas frames, enabling custom alignment logic (merge_asof, interval
    matching) that DataFrame joins express awkwardly. The logic here is a
    windowed EXISTS (the suite oracle), chosen checkable on purpose."""
    return (
        purchases.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(_attribute, schema=ATTR_SCHEMA)
    )


GAP_SCHEMA = "user_id bigint, n_events bigint, max_gap_us bigint, sum_gap_us bigint"


def arrow_user_gaps(events_us: DataFrame) -> DataFrame:
    """Per-user inter-event gap statistics via ``applyInArrow`` — the
    Arrow-native grouped-map shape (Spark 4): each group arrives as a
    ``pyarrow.Table``, zero pandas materialization, ideal when the per-group
    logic is itself Arrow/numpy kernels. Input needs (user_id, ts_us) with
    integer epoch-µs timestamps; output is all-integer (exact in any
    engine). The logic is deliberately lag-window-expressible so the suite
    can oracle-check the Arrow path end to end (CLAUDE.md posture: the
    builtin window IS the hot path; this proves the extension point).

    Scale shape: one group = one user's events in one worker's memory —
    bounded-entity assumption, same as every grouped-map here.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def gaps(table: pa.Table) -> pa.Table:
        ts = pc.array_sort_indices(table["ts_us"])
        sorted_ts = pc.take(table["ts_us"], ts)
        n = table.num_rows
        if n > 1:
            head = sorted_ts.slice(1)
            tail = sorted_ts.slice(0, n - 1)
            diffs = pc.subtract(head, tail)
            max_gap = pc.max(diffs).as_py()
            sum_gap = pc.sum(diffs).as_py()
        else:
            max_gap = 0
            sum_gap = 0
        uid = table["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
                "max_gap_us": pa.array([int(max_gap)], pa.int64()),
                "sum_gap_us": pa.array([int(sum_gap)], pa.int64()),
            }
        )

    return (
        events_us.select("user_id", "ts_us")
        .groupBy("user_id")
        .applyInArrow(gaps, schema=GAP_SCHEMA)
    )
