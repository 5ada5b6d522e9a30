"""Document chunking and deterministic dataset splitting — the two
pipeline steps between a cleaned corpus and a training/RAG run.

Both are pure column expressions (JVM-side, whole-stage codegen); neither
touches Python rows.

Scale posture (100 TB): chunking is map-only but row-exploding — callers
repartition by doc id BEFORE the explode (CLAUDE.md posture) so the 2-10×
row growth spreads instead of fattening whatever partitioning the scan
produced. Splitting is map-only and shuffle-free: membership is a pure
function of the key, so the same doc lands in the same split on any
cluster, any partitioning, any engine — unlike ``randomSplit``, whose
assignment is partition-layout-dependent and unrepeatable across runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_sliding(
    df: DataFrame,
    text_col: str = "text",
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Sliding-window character chunks: starts 0, stride, 2·stride … < len;
    each chunk is ``substring(text, start+1, size)`` (the RAG/embedding
    chunking primitive; overlap = size - stride keeps boundary context).

    Emits all original columns plus ``chunk_start`` (the offset — stable
    chunk id independent of explode order) and ``chunk_text``. Empty text
    yields one empty chunk (start 0), so no document silently disappears.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("chunk_sliding: size and stride must be positive")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(F.col(text_col)) - 1, F.lit(0)),
        F.lit(stride),
    )
    return (
        df.withColumn("chunk_start", F.explode(starts))
        .withColumn(
            "chunk_text",
            F.col(text_col).substr(F.col("chunk_start") + 1, F.lit(size)),
        )
        .drop(text_col)
    )


def assign_split(
    key: Column,
    fractions: Sequence[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
) -> Column:
    """Deterministic split label from a key column: md5(key) → 32-bit int →
    bucket in [0, 100) → first label whose cumulative fraction covers it.

    ``fractions`` are integer percents summing to 100. Oracle-replicable in
    DuckDB as ``('0x' || substr(md5(k),1,8))::BIGINT % 100`` (same formula
    as :func:`sparkfusion.llm.dedup.base_hash32`).
    """
    total = sum(p for _, p in fractions)
    if total != 100:
        raise ValueError(f"assign_split: fractions must sum to 100, got {total}")
    bucket = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100
    )
    cum = 0
    expr = None
    for label, pct in fractions[:-1]:
        cum += pct
        cond = bucket < F.lit(cum)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last_label = fractions[-1][0]
    return (expr.otherwise(F.lit(last_label)) if expr is not None else F.lit(last_label)).alias(
        "split"
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-Res): each row draws a pseudo-uniform u from md5(id) and is
    ranked by u^(1/w) — equivalently ln(u)/w, descending; the top-k win.
    Inclusion probability is proportional to weight, yet the draw is a pure
    key function: identical across runs, engines, partitionings, and cluster
    sizes (unlike ``df.sample``, whose output depends on partition layout).

    Scale: the ranking key is computed map-side in whole-stage codegen; the
    top-k is ``orderBy().limit(k)`` → TakeOrderedAndProject (per-partition
    heaps + driver merge of k rows), never a global sort.
    """
    # md5 first 8 hex chars → integer in [0, 2^32) → u in (0, 1]
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(4294967296.0)
    key = F.log(u) / F.col(weight_col)
    return (
        df.withColumn("__wkey", key)
        .orderBy(F.col("__wkey").desc(), F.col(id_col))
        .limit(k)
        .drop("__wkey")
    )
