"""Broadcast bloom-bitmap runtime filter — semi-join scan pruning.

The reference engine gets row-group pruning from its native parquet reader
(``src/utils/datasets.rs`` scan options); DataFusion and Spark both ship
*internal* runtime bloom filters (Spark's ``spark.sql.optimizer.runtime.
bloomFilter.enabled`` injects ``BloomFilterAggregate`` under a shuffle join),
but Spark does not expose ``bloom_filter_agg`` / ``might_contain`` as public
SQL functions. This module builds the same primitive from public column
expressions so a pipeline can prune a 100 TB probe side BEFORE the shuffle of
an exact semi-join:

- **Build**: hash every build-side key with ``num_hashes`` seeded ``xxhash64``
  calls, mod ``num_bits`` → bit positions; aggregate positions into a *sparse
  bitmap* of 64-bit words ``(bucket, mask)`` via ``bit_or(shiftleft(1L, pos %
  64))``. At most ``num_bits / 64`` rows — kilobytes, broadcastable — and the
  aggregation is map-side combinable (one tiny shuffle of word-rows).
- **Probe**: ``num_hashes`` broadcast left joins on ``pos div 64 = bucket``
  (bucket is unique in the bitmap, so no fanout), keep rows with **all** k
  bits set. Pure map-side work: no shuffle of the probe side at all.
- **Exactness**: a bloom pass has false positives, never false negatives, so
  callers finish with an exact semi-join over the (much smaller) survivor set
  — the final result is exactly the plain semi-join, the bloom only prunes.

All hashing is JVM-side (``xxhash64``) inside whole-stage codegen; nothing
here touches Python per row.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..errors import PlanError

__all__ = [
    "bloom_bitmap",
    "bloom_might_contain",
    "bloom_semi_join",
    "false_positive_rate",
]


def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k seeded hash positions in [0, num_bits) for one key expression.

    ``xxhash64`` has a fixed seed in the public API, so the per-hash seed is
    mixed in as a leading literal column (same trick minhash uses for its
    permutation family, llm/dedup.py).
    """
    if num_bits % 64 != 0:
        raise PlanError(f"num_bits must be a multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise PlanError(f"num_hashes must be >= 1, got {num_hashes}")
    return [F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits)) for i in range(num_hashes)]


def bloom_bitmap(
    build: DataFrame, key: str, num_bits: int = 1 << 16, num_hashes: int = 3
) -> DataFrame:
    """Aggregate the build side's keys into a sparse bloom bitmap.

    Returns ``(bucket BIGINT, mask BIGINT)`` — one row per 64-bit word that
    has at least one bit set (≤ ``num_bits/64`` rows regardless of build
    cardinality, so the result is always broadcastable).
    """
    pos = F.explode(
        F.array(*_bit_positions(F.col(key), num_bits, num_hashes))
    ).alias("pos")
    return (
        build.where(F.col(key).isNotNull())
        .select(pos)
        .groupBy(F.expr("pos div 64").alias("bucket"))
        .agg(F.expr("bit_or(shiftleft(1L, int(pos % 64)))").alias("mask"))
    )


def bloom_might_contain(
    probe: DataFrame,
    bitmap: DataFrame,
    key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """Filter ``probe`` to rows whose ``key`` *might* be in the bloom bitmap.

    Guaranteed superset of the true matches (no false negatives); false
    positives bounded by :func:`false_positive_rate`. Executes as
    ``num_hashes`` broadcast hash joins + one filter — the probe side is
    never shuffled.
    """
    out = probe
    conds: list[Column] = []
    # every hash joins the SAME broadcast frame (disambiguated by dataset
    # alias, not by renamed projections) so the canonicalized
    # BroadcastExchange is identical across the k joins and Spark's
    # ReuseExchange computes the bitmap build ONCE — without this, each join
    # re-scans and re-aggregates the build side k times
    for i, pos in enumerate(_bit_positions(F.col(key), num_bits, num_hashes)):
        pcol, t = f"__bf_pos{i}", f"__bf{i}"
        bm = F.broadcast(bitmap.alias(t))
        out = out.withColumn(pcol, pos).join(
            bm, F.expr(f"{pcol} div 64") == F.col(f"{t}.bucket"), "left"
        )
        # missing word-row or unset bit → not present; coalesce(NULL)=0 → drop
        conds.append(
            F.coalesce(
                F.expr(f"shiftright({t}.mask, int({pcol} % 64)) & 1"), F.lit(0)
            )
            == F.lit(1)
        )
    keep = conds[0]
    for c in conds[1:]:
        keep = keep & c
    out = out.where(keep)
    for i in range(num_hashes):
        out = out.drop(F.col(f"__bf{i}.bucket")).drop(F.col(f"__bf{i}.mask")).drop(
            f"__bf_pos{i}"
        )
    return out


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """Exact semi-join with a broadcast bloom prefilter on the probe side.

    Semantically identical to ``big.join(small, on, "left_semi")`` — the
    bloom stage only prunes probe rows before the exact join, so false
    positives are eliminated and false negatives cannot occur. At 100 TB this
    is the difference between shuffling the full fact table into the
    semi-join and shuffling only the ~matching fraction: the bitmap is
    kilobytes broadcast to every task, and pruning happens inside the scan
    stage (map-side), composing with parquet predicate pushdown.
    """
    keys = small.select(F.col(small_key).alias(small_key)).where(
        F.col(small_key).isNotNull()
    )
    # the bitmap feeds num_hashes probe joins, so the build side must be
    # computed once, not once per hash (plan-level ReuseExchange is not
    # guaranteed across the per-join dataset aliases). localCheckpoint, not
    # cache(): a cache() entry lives in the CacheManager until an explicit
    # unpersist — repeated invocations (correctness sweeps, bench REPEATS)
    # would accumulate pinned storage for the session lifetime — whereas
    # checkpoint blocks are released by the ContextCleaner when the frame is
    # garbage collected. The bitmap is ≤ num_bits/64 rows (kilobytes), so the
    # eager materialization is negligible.
    bitmap = bloom_bitmap(keys, small_key, num_bits, num_hashes).localCheckpoint(
        eager=True
    )
    pruned = bloom_might_contain(big, bitmap, big_key, num_bits, num_hashes)
    return pruned.join(keys, pruned[big_key] == keys[small_key], "left_semi")


def false_positive_rate(n_keys: int, num_bits: int, num_hashes: int) -> float:
    """Theoretical FP rate ``(1 - e^(-kn/m))^k`` for sizing the bitmap."""
    if n_keys <= 0:
        return 0.0
    return (1.0 - math.exp(-num_hashes * n_keys / num_bits)) ** num_hashes
