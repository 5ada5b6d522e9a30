"""Data-quality operators: one-pass column profiling, declarative constraint
checks, referential-integrity orphan counts, and keep-latest compaction.

The reference has no data-quality surface; at 100 TB these are the gatekeeper
ops a pipeline runs before/after every load (Deequ-style, but as plain
Catalyst aggregates — no separate framework, no driver-side loops).

Scale notes:
- ``profile_columns`` / ``check_constraints`` compute EVERYTHING in one scan:
  a single ``agg()`` whose outputs are then unpivoted driver-free via
  ``stack``. One pass, map-side partial aggregation, one tiny shuffle.
  Exact multi-column ``count(distinct)`` plans through Catalyst's Expand
  (rows × profiled columns); at 100 TB pass ``approx=True`` to switch to
  HyperLogLog++ (`approx_count_distinct`, map-side mergeable, no Expand) —
  the oracle-checked suite entry uses exact so DuckDB can agree bit-for-bit.
- ``referential_orphans`` is a LEFT ANTI join per relation: hash shuffle on
  the key (or broadcast when the parent is a dim), then a metadata-cheap
  count. No row data crosses the shuffle except the keys.
- ``keep_latest`` is the CDC-compaction primitive: one window shuffle on the
  entity key, per-partition sort, keep row_number()==1. Equivalent semantics
  to `MERGE` replaying a change log, at scan cost.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """Per-column profile in ONE scan: row count, NULL count, distinct count.

    Output is long-format ``(column, n_rows, n_nulls, n_distinct)`` — the
    shape quality dashboards and drift detectors consume.
    """
    cols = list(cols)
    distinct = F.approx_count_distinct if approx else F.countDistinct
    agg = df.agg(
        F.count(F.lit(1)).alias("__rows"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}")
            for c in cols
        ],
        *[distinct(F.col(c)).alias(f"__nd_{c}") for c in cols],
    )
    # unpivot the single row into one row per column, still plan-side
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}" for c in cols
    )
    return agg.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)"
        ),
        F.col("__rows").alias("n_rows"),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


def check_constraints(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate declarative row-level constraints in ONE scan; one output row
    per rule: ``(rule, violations, n_rows)``. A NULL rule result counts as a
    violation (unknown ≠ satisfied — the conservative audit stance).
    """
    names = list(rules)
    agg = df.agg(
        F.count(F.lit(1)).alias("__rows"),
        *[
            F.sum(F.when(rules[n], 0).otherwise(1)).alias(f"__viol_{i}")
            for i, n in enumerate(names)
        ],
    )
    stack_args = ", ".join(f"'{n}', __viol_{i}" for i, n in enumerate(names))
    return agg.select(
        F.expr(f"stack({len(names)}, {stack_args}) AS (rule, violations)"),
        F.col("__rows").alias("n_rows"),
    ).select("rule", "violations", "n_rows")


def referential_orphans(
    relations: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each ``(name, child, fk, parent, pk)``
    relation, count child rows whose foreign key has no parent (LEFT ANTI
    join) — one output row per relation: ``(relation, orphans, child_rows)``.
    """
    parts = []
    for name, child, fk, parent, pk in relations:
        orphans = child.select(F.col(fk).alias("__k")).join(
            parent.select(F.col(pk).alias("__k")).distinct(), on="__k", how="left_anti"
        )
        parts.append(
            orphans.agg(F.count(F.lit(1)).alias("orphans")).crossJoin(
                child.agg(F.count(F.lit(1)).alias("child_rows"))
            ).select(F.lit(name).alias("relation"), "orphans", "child_rows")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def keep_latest(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Keep only the latest row per ``keys`` entity, ordered by ``order_by``
    DESC (change-log compaction / upsert snapshot materialization). One
    window shuffle on the entity key; ties broken by the full ``order_by``
    list, so make its last element unique (e.g. an event id).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def schema_diff(old_df: DataFrame, new_df: DataFrame) -> DataFrame:
    """Schema drift between two frame versions as data: one row per added /
    removed / retyped column — the governance check a pipeline runs before
    appending a new batch to an existing dataset (silent type widening and
    column loss are the classic slow-corruption bugs). Schema objects are
    driver-side metadata (like the C-series interchange ops), so the diff
    builds a literal frame; columns: (column, change, old_type, new_type).
    """
    old = {f.name: f.dataType.simpleString() for f in old_df.schema.fields}
    new = {f.name: f.dataType.simpleString() for f in new_df.schema.fields}
    rows = []
    for name in sorted(old.keys() | new.keys()):
        if name not in new:
            rows.append((name, "removed", old[name], None))
        elif name not in old:
            rows.append((name, "added", None, new[name]))
        elif old[name] != new[name]:
            rows.append((name, "retyped", old[name], new[name]))
    spark = old_df.sparkSession
    return spark.createDataFrame(
        rows, "col_name string, change string, old_type string, new_type string"
    )
