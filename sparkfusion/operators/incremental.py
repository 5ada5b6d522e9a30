"""Incremental aggregate maintenance: merge a delta batch's partial
aggregates into a materialized snapshot without recomputing history.

The pattern that keeps a 100 TB rollup affordable: the snapshot holds
mergeable partial states (sum / count / min / max — DECIMAL sums so merge
order can never flip float bits), each new batch aggregates ONLY its own
rows, and the refresh is a full-outer join on the group key combining the
two states. Cost per refresh is O(batch + snapshot-groups), not O(history).

avg is derived (sum/count) at read time; non-mergeable exact aggregates
(median, distinct) are the documented exclusions — they need sketches
(t-digest / HLL) whose merge is approximate.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate name → (state builder, state merger)
_MERGEABLE = {
    "sum": (lambda c: F.sum(c), lambda a, b: a + b),
    "count": (lambda c: F.count(c), lambda a, b: a + b),
    "min": (lambda c: F.min(c), lambda a, b: F.least(a, b)),
    "max": (lambda c: F.max(c), lambda a, b: F.greatest(a, b)),
}


def aggregate_state(
    df: DataFrame, keys: Sequence[str], aggs: Mapping[str, tuple[str, object]]
) -> DataFrame:
    """Build the mergeable partial-aggregate state of ``df``: one row per
    ``keys`` group with a column per entry of ``aggs`` (name → (kind, col
    expression)), where kind ∈ sum/count/min/max."""
    exprs = []
    for out_name, (kind, col) in aggs.items():
        build, _ = _MERGEABLE[kind]
        exprs.append(build(col).alias(out_name))
    return df.groupBy(*keys).agg(*exprs)


def merge_states(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, object]],
) -> DataFrame:
    """Merge a delta state into the snapshot state: full-outer join on the
    group key, combining each aggregate with its merge function (NULL side =
    group absent = identity). The result is again a valid snapshot —
    refreshes compose associatively, so batches can land in any grouping."""
    keys = list(keys)
    s = snapshot.select(
        *[F.col(k) for k in keys],
        *[F.col(n).alias(f"__s_{n}") for n in aggs],
    )
    d = delta.select(
        *[F.col(k) for k in keys],
        *[F.col(n).alias(f"__d_{n}") for n in aggs],
    )
    joined = s.join(d, on=keys, how="full_outer")
    out_cols = [F.col(k) for k in keys]
    for name, (kind, _col) in aggs.items():
        _, merge = _MERGEABLE[kind]
        a, b = F.col(f"__s_{name}"), F.col(f"__d_{name}")
        out_cols.append(
            F.when(a.isNull(), b).when(b.isNull(), a).otherwise(merge(a, b)).alias(name)
        )
    return joined.select(*out_cols)


def hll_rollup(
    df: DataFrame,
    sub_keys: Sequence[str],
    rollup_keys: Sequence[str],
    count_col: str,
    lg_k: int = 14,
):
    """Distinct-count rollup via mergeable HLL sketches (Apache DataSketches,
    Spark 3.5+): build one sketch per fine-grained ``sub_keys`` group, then
    merge sketches up to ``rollup_keys`` with ``hll_union_agg`` and estimate.

    This is the piece :func:`merge_states` documents as non-mergeable for
    exact aggregates: distinct counts CAN participate in incremental
    materialized-view maintenance if the snapshot stores sketches instead of
    numbers — per-batch sketches union in O(sketch size), never re-scanning
    history, and the union is associative + idempotent (re-delivered batches
    don't inflate the count, unlike a sum). Default lg_k=14 → ~0.8 % rsd at
    any cardinality, 16 KiB per group.

    Returns ``rollup_keys + [n_subgroups, distinct_est]``.
    """
    daily = df.groupBy(*rollup_keys, *sub_keys).agg(
        F.hll_sketch_agg(F.col(count_col), F.lit(lg_k)).alias("__sk")
    )
    return daily.groupBy(*rollup_keys).agg(
        F.count(F.lit(1)).alias("n_subgroups"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("__sk"), F.lit(True))).alias(
            "distinct_est"
        ),
    )
