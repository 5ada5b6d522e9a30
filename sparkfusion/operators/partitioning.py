"""Scale-adaptive partition spreading for compute-heavy map stages.

The driver's test tables are single-row-group parquet files, and one row
group = one scan split: the whole table arrives as ONE partition no matter
how many cores the session has, so an expensive per-row expression (k-means
literal argmin, a 27-term entropy fold, a media decode) runs serially on one
core of 32 (guide §2: partitioning must derive from the input, not from a
constant tuned for either local mode or the cluster).

At production scale the same operator's input already carries hundreds of
scan partitions and a forced ``repartition(cores)`` would be a pure extra
shuffle — or worse, a parallelism REDUCTION. :func:`spread_for_compute`
therefore widens ONLY when the plan's current partition count is below the
session's core count, and is a plan no-op otherwise. The repartition key is
the caller's row key (deterministic hash placement — never ``rand()``-derived,
see SPARK-38388); keyless calls use round-robin, which Spark makes
retry-deterministic via its sort-before-repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_for_compute(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` up to the session's core count iff it currently has
    fewer partitions; identity otherwise. Result-invariant: only placement
    changes, never values (callers are per-row maps or partitioning-invariant
    integer folds)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # physical-plan inspection only — builds the RDD DAG, runs no job
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)


def repartition_for_compute(df: DataFrame, *key_cols: str) -> DataFrame:
    """``df.repartition(key_cols)`` with an EXPLICIT partition count of
    ``max(session cores, current partitions)`` — for pipelines that need the
    hash co-partitioning downstream (their groupBys on the same key reuse
    the exchange) AND the pre-explode compute parallelism.

    A bare ``repartition(col)`` carries no user partition count, so AQE's
    coalescer is free to shrink it by bytes — and on the small single-split
    test parquet it shrinks to ONE partition, serializing the very
    hash/shingle stage the repartition was written to parallelize (measured
    r13: exploded_shingles ran 1-partition at sf0.1 despite its docstring).
    An explicit count is exempt from AQE coalescing; deriving it from the
    input width and core count keeps it scale-adaptive — at production the
    scan is already ≥ cores partitions and the count simply preserves that
    width, never a local constant."""
    target = max(
        df.sparkSession.sparkContext.defaultParallelism,
        df.rdd.getNumPartitions(),
    )
    return df.repartition(target, *[F.col(c) for c in key_cols])
