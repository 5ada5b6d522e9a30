"""Distinct-count sketches (SURVEY §2 "beyond the reference": the cardinality
estimation a 100 TB pipeline runs where exact COUNT(DISTINCT) is too
expensive — vocabulary sizes, per-shard user counts, join-key cardinality for
plan decisions).

KMV (k-minimum-values) rather than HyperLogLog, deliberately: KMV over a
deterministic hash is REPRODUCIBLE BIT-FOR-BIT in ANSI SQL — the k smallest
md5-derived values per group are the same set no matter which engine or
partitioning computed them — so the suite's DuckDB oracle can verify the
sketch exactly, not just approximately. (Spark's own approx_count_distinct
is HLL++ whose register layout is engine-internal; it has no cross-engine
oracle.) Estimator: with U_(k) the k-th smallest of n distinct uniform
hashes, E[U_(k)] = k/(n+1), so n̂ = (k-1)/U_(k) (the classic unbiased KMV
estimate); with fewer than k distinct hashes the sketch holds ALL of them
and the count is exact.

Scale shape: one distinct-shuffle on (group, hash), then TWO bounded
row_number windows — first over (group, salt-bucket) keeping ≤k per bucket
(each bucket sorts only ~distinct/B elements), then over (group) on at most
B·k survivors. No collect_set of unbounded groups, no single-reducer sort of
a group's full distinct set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hash domain: first 8 hex chars of md5 → uniform on [0, 2^32)
HASH_SPACE = 1 << 32


def _h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def kmv_mins(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
    salt_buckets: int = 64,
) -> DataFrame:
    """The k smallest md5-derived hashes of ``key_col`` per group — the raw
    sketch rows both :func:`kmv_distinct` and :func:`kmv_set_ops` consume.
    Two bounded row_number levels (per salt bucket, then per group over
    ≤ salt_buckets·k survivors); returns ``(*group_cols, __h)``.

    The md5 hash pass is spread across the session's cores first
    (:func:`..operators.partitioning.spread_for_compute`, plan no-op on an
    already-wide production scan): the test parquet arrives as 1-3 scan
    splits, serializing one md5 per row on as many cores — the exchange
    carries only the narrow (group, key) projection. r13 A/B: the md5
    projection alone 0.53s → 0.34s; sk1_kmv_distinct end-to-end
    1.55s → 1.41s solo min-of-3 (the remaining cost is the distinct
    shuffle, which AQE rightly coalesces to one small post-shuffle
    partition at this data size)."""
    from .partitioning import spread_for_compute

    # key_col may itself be a group column — don't select (or spread-key) it
    # twice, a duplicate column makes the hash projection below ambiguous
    cols = list(group_cols) + ([key_col] if key_col not in group_cols else [])
    narrow = spread_for_compute(df.select(*cols), *cols)
    h = (
        narrow.select(*group_cols, _h32(F.col(key_col)).alias("__h"))
        # NULL keys hash to NULL and would occupy a k-min slot (Spark windows
        # sort NULLS FIRST) while max() ignored them — drop them up front;
        # SQL's COUNT(DISTINCT key) excludes NULLs too, so this matches the
        # quantity being estimated
        .filter(F.col("__h").isNotNull())
        .distinct()  # sketch cardinality is of HASHES (collisions merge keys)
    )
    # level 1: ≤ k survivors per (group, salt) bucket — bounds every sort
    salted = h.withColumn("__salt", F.pmod(F.col("__h"), F.lit(salt_buckets)))
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy("__h")
    partial = (
        salted.withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .drop("__rk", "__salt")
    )
    # level 2: global k-mins per group over ≤ salt_buckets·k rows
    w2 = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        partial.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
    salt_buckets: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count sketch over ``key_col``.

    Returns one row per group: ``n_kept`` (sketch size, = min(k, distinct
    hashes)), ``kth_hash`` (the threshold value the sketch would merge on),
    and ``est_distinct`` — exact when the group has < k distinct hashes,
    else the integer KMV estimate ``(k-1)·2³² div kth_hash``. All integer
    arithmetic → engine-exact.
    """
    mins = kmv_mins(df, key_col, group_cols, k, salt_buckets)
    return mins.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("__h").alias("kth_hash"),
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)))
        .otherwise(F.expr(f"CAST({k - 1} * {HASH_SPACE} div max(__h) AS BIGINT)"))
        .cast("long")
        .alias("est_distinct"),
    )


def kmv_set_ops(
    df: DataFrame,
    key_col: str,
    group_col: str,
    val_a,
    val_b,
    k: int = 64,
    salt_buckets: int = 64,
) -> DataFrame:
    """KMV sketch SET OPERATIONS: estimate |A ∪ B| and |A ∩ B| distinct
    ``key_col`` values between two groups FROM THEIR SKETCHES ALONE — the
    mergeability property that makes sketches useful at 100 TB (per-shard /
    per-day sketches of k values each combine without revisiting the data;
    exact distinct-intersection would need a full re-shuffle of both sides).

    Union: the k smallest of the combined sketch hashes form a valid KMV
    sketch of A ∪ B → the usual ``(k-1)·2³² div kth`` estimate. Intersection
    (Beyer et al.'s inclusion ratio): within that union sketch, the fraction
    ρ of hashes present in BOTH input sketches estimates the Jaccard
    similarity, so ``|A ∩ B| ≈ ρ · |A ∪ B|`` — computed here as the exact
    integer ``(n_common · est_union) div k``. When the union holds fewer
    than k hashes the sketches are lossless and both outputs are exact.
    Everything after the bounded per-group k-min pass happens on ≤ 2k rows.

    Returns one row: ``(n_union_kept, kth_union, est_union, n_common,
    est_intersect)`` — all BIGINT, engine-exact.
    """
    mins = kmv_mins(
        df.filter(F.col(group_col).isin(val_a, val_b)),
        key_col,
        [group_col],
        k,
        salt_buckets,
    )
    a = mins.filter(F.col(group_col) == val_a).select("__h")
    b = mins.filter(F.col(group_col) == val_b).select("__h")
    both = a.join(b, "__h").withColumn("__in_both", F.lit(1))
    ku = (
        a.unionByName(b)
        .distinct()
        .orderBy("__h")
        .limit(k)  # ≤ 2k rows in, k out: TakeOrderedAndProject
        .join(both, "__h", "left")
    )
    est_union = F.when(
        F.count(F.lit(1)) < k, F.count(F.lit(1))
    ).otherwise(F.expr(f"CAST({k - 1} * {HASH_SPACE} div max(__h) AS BIGINT)"))
    n_common = F.coalesce(F.sum("__in_both"), F.lit(0))
    return ku.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_kept"),
        F.max("__h").alias("kth_union"),
        est_union.cast("long").alias("est_union"),
        n_common.cast("long").alias("n_common"),
        F.when(F.count(F.lit(1)) < k, n_common)
        .otherwise(F.expr(f"(coalesce(sum(__in_both), 0) * (CAST({k - 1} * {HASH_SPACE} div max(__h) AS BIGINT))) div {k}"))
        .cast("long")
        .alias("est_intersect"),
    )
