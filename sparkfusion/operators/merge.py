"""CDC merge (MERGE INTO semantics) as a pure DataFrame transform.

The reference engine writes snapshots via its parquet sink
(``src/utils/io.rs:118-170``) but has no upsert primitive — users re-derive
snapshots with hand-written joins. ``merge_upsert`` is that shape as one
operator: apply a change batch (upserts + deletes) onto a snapshot.

Scale posture (100 TB): one full-outer equi-join hashed on the merge key —
the minimum possible shuffle for MERGE semantics. Change batches are
typically ≪ snapshot, so AQE rewrites the join to broadcast / shuffled-hash
with the small side built; no window, no sort, no collect. For repeated
merges at scale, bucket both sides on the key (see
``sources/writers.py`` bucketed sink) and the shuffle disappears entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..errors import SchemaError


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    delete_val: str = "D",
) -> DataFrame:
    """MERGE ``changes`` into ``snapshot`` on ``keys``.

    Semantics (standard MERGE INTO):
      - key only in snapshot            → keep the snapshot row
      - key in changes with op=U (any non-delete) → change row wins
        (update when matched, insert when not — an upsert)
      - key in changes with op=``delete_val``     → row removed

    ``changes`` must carry the same value columns as ``snapshot`` plus
    ``op_col``; value columns are coalesced change-first.
    """
    value_cols = [c for c in snapshot.columns if c not in keys]
    missing = [c for c in value_cols + list(keys) if c not in changes.columns]
    if missing:
        raise SchemaError(f"merge_upsert: changes missing columns {missing}")
    chg = changes.select(
        *[F.col(k).alias(f"__c_{k}") for k in keys],
        *[F.col(c).alias(f"__c_{c}") for c in value_cols],
        F.col(op_col).alias("__op"),
    )
    cond = [snapshot[k] == chg[f"__c_{k}"] for k in keys]
    joined = snapshot.join(chg, cond, "full_outer")
    # delete: matched change row flagged delete_val → drop
    joined = joined.filter(
        F.col("__op").isNull() | (F.col("__op") != F.lit(delete_val))
    )
    out = [
        F.coalesce(F.col(f"__c_{k}"), snapshot[k]).alias(k) for k in keys
    ] + [
        F.when(F.col("__op").isNotNull(), F.col(f"__c_{c}"))
        .otherwise(snapshot[c])
        .alias(c)
        for c in value_cols
    ]
    return joined.select(*out)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Inverse of :func:`merge_upsert`: derive the change feed between two
    table versions. One full-outer join on ``keys``; each row classifies as
    ``insert`` (key only in new), ``delete`` (key only in old), or
    ``update`` (key in both with any ``compare_cols`` difference —
    NULL-safe comparison); unchanged rows are dropped. The output is a valid
    ``changes`` input for ``merge_upsert`` (op column included), so
    diff→merge round-trips: ``merge(old, diff(old, new)) == new``.

    Scale: the join shuffles both versions by key once; column comparison is
    map-side codegen. This is how a pipeline without a transactional table
    format (Delta/Iceberg CDF) backfills a change feed from plain parquet
    snapshots.
    """
    keys = list(keys)
    compare_cols = list(compare_cols)
    o = old.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_new"),
        *[F.col(c) for c in compare_cols],
    )
    joined = o.join(n, on=keys, how="full_outer")
    # seed False: with no compare_cols the diff is presence-only (I/D rows)
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__o_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(*keys, *compare_cols, "op")
    )
