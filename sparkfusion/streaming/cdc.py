"""Streaming CDC apply: maintain an upserted parquet snapshot from a change
stream via ``foreachBatch`` + :func:`sparkfusion.operators.merge.merge_upsert`.

The reference engine's sinks are append-only parquet writers
(``src/utils/io.rs:118-170``); a change-data-capture consumer on top of it
must hand-roll snapshot maintenance. This module is that loop as a reusable
sink: each micro-batch is merged onto the latest snapshot version and
written as a NEW immutable version directory, then a marker file is flipped
— copy-on-write, so readers never observe a half-written snapshot and a
replayed batch (restart-after-crash) is idempotent by version name.

Scale posture (100 TB): the merge itself is one key-hashed join (see
operators/merge.py). Full-snapshot COW per batch is correct but rewrites
everything; at scale you partition the snapshot (e.g. by key range or date)
and rewrite ONLY partitions containing batch keys under dynamic partition
overwrite — the join already prunes to those partitions when the snapshot
is partitioned by a key prefix. The versioned-marker protocol is unchanged.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import merge_upsert

_MARKER = "_LATEST"


def latest_version(path: str) -> int | None:
    """Committed snapshot version at ``path``, or None before first commit.
    The marker holds ``version`` or ``version batch_id`` (one atomic file —
    see :class:`AggregateRollupSink` on why both facts must commit together)."""
    marker = os.path.join(path, _MARKER)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().split()[0])


def read_snapshot(spark: SparkSession, path: str) -> DataFrame | None:
    """Latest committed snapshot, or None before first commit."""
    v = latest_version(path)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(path, f"v{v}"))


class ParquetUpsertSink:
    """``foreachBatch`` callable applying CDC batches onto a parquet snapshot.

    Batches carry the snapshot's value columns plus ``op_col``
    ('U' upsert / ``delete_val`` delete). Commit protocol per batch:
    write ``v{batch_id}`` fully, then flip the ``_LATEST`` marker —
    a replayed batch id overwrites its own (uncommitted or identical)
    version directory, never duplicating rows (exactly-once downstream).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str],
        op_col: str = "op",
        delete_val: str = "D",
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.op_col = op_col
        self.delete_val = delete_val

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        committed = latest_version(self.path)
        if committed is not None and committed >= batch_id:
            return  # replay of an already-committed batch
        snap = read_snapshot(self.spark, self.path)
        if snap is None:
            # first batch bootstraps the snapshot schema (minus the op column)
            snap = batch_df.drop(self.op_col).limit(0)
        merged = merge_upsert(
            snap, batch_df, self.keys, op_col=self.op_col, delete_val=self.delete_val
        )
        target = os.path.join(self.path, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(target)
        tmp = os.path.join(self.path, _MARKER + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, os.path.join(self.path, _MARKER))


class AggregateRollupSink:
    """``foreachBatch`` callable maintaining a MATERIALIZED AGGREGATE from an
    append stream: each micro-batch is reduced to its partial-aggregate
    state (:func:`sparkfusion.operators.incremental.aggregate_state`) and
    merged onto the snapshot with
    :func:`sparkfusion.operators.incremental.merge_states` — the streaming
    form of incremental MV refresh (mv1). Per-batch cost is
    O(batch + groups), never O(history); the snapshot commits through the
    same versioned copy-on-write + marker protocol as
    :class:`ParquetUpsertSink`.

    Unlike an upsert (naturally idempotent), an ADDITIVE merge replayed
    after crash-restart would double-count — so the commit marker also
    records the last applied ``batch_id``, and a batch at or below it is
    SKIPPED. foreachBatch guarantees monotonically increasing batch ids,
    which makes that ledger sufficient for exactly-once aggregation.
    """

    def __init__(self, spark: SparkSession, path: str, keys: Sequence[str], aggs_fn):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        # aggs_fn: () -> {name: (kind, Column)} built lazily per call — a
        # Column captured at init would bind to a stale session
        self.aggs_fn = aggs_fn

    def _last_applied(self) -> int:
        p = os.path.join(self.path, _MARKER)
        if not os.path.exists(p):
            return -1
        with open(p) as f:
            parts = f.read().split()
        return int(parts[1]) if len(parts) > 1 else -1

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.incremental import aggregate_state, merge_states

        if batch_id <= self._last_applied():
            return  # replayed batch: already merged, adding again would double-count
        aggs = self.aggs_fn()
        delta = aggregate_state(batch_df, self.keys, aggs)
        prev = read_snapshot(self.spark, self.path)
        merged = delta if prev is None else merge_states(prev, delta, self.keys, aggs)
        v = (latest_version(self.path) or 0) + 1
        out = os.path.join(self.path, f"v{v}")
        merged.write.mode("overwrite").parquet(out)
        # ONE atomic replace commits BOTH facts: a marker holding only the
        # version with a separate batch ledger has a crash window between
        # the two writes in which a replayed batch double-counts
        tmp = os.path.join(self.path, f"_LATEST.tmp.{v}")
        with open(tmp, "w") as f:
            f.write(f"{v} {batch_id}")
        os.replace(tmp, os.path.join(self.path, _MARKER))


class KeepLatestSink:
    """``foreachBatch`` callable maintaining a KEEP-LATEST-per-key snapshot
    from an append event stream — the streaming materialization of
    ``m2_keep_latest`` (change-log compaction): each micro-batch is first
    compacted to its per-key latest row, then merged with the snapshot by
    the SAME latest-wins rule.

    Latest-wins on a total (order_by) key is idempotent AND commutative, so
    the final snapshot is independent of batch boundaries, arrival order,
    and replays — stronger than :class:`ParquetUpsertSink`'s change-wins
    rule (which is only replay-idempotent) and exactly what makes the
    result batch-oracle-checkable. Commit protocol is the shared versioned
    copy-on-write + ``_LATEST`` marker.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str],
        order_by: Sequence[str],
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.order_by = list(order_by)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.quality import keep_latest

        committed = latest_version(self.path)
        if committed is not None and committed >= batch_id:
            return  # replay of an already-committed batch
        reduced = keep_latest(batch_df, self.keys, self.order_by)
        snap = read_snapshot(self.spark, self.path)
        merged = (
            reduced
            if snap is None
            else keep_latest(
                snap.unionByName(reduced), self.keys, self.order_by
            )
        )
        target = os.path.join(self.path, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(target)
        tmp = os.path.join(self.path, _MARKER + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, os.path.join(self.path, _MARKER))


def vacuum_versions(path: str, keep_last: int = 2) -> list[str]:
    """Garbage-collect superseded snapshot versions under ``path``: keep the
    committed version (whatever ``_LATEST`` points at) plus up to
    ``keep_last - 1`` immediately preceding versions for time-travel /
    in-flight readers, delete the rest. NEVER touches versions newer than
    the marker (an in-flight uncommitted write) and is a no-op before the
    first commit — so it is safe to run concurrently with the sinks above
    at any cadence. Returns the deleted directory names (the reference's
    append-only sinks have no retention story; this is the missing GC half
    of the COW protocol)."""
    import re
    import shutil

    committed = latest_version(path)
    if committed is None:
        return []
    versions = sorted(
        int(m.group(1))
        for name in os.listdir(path)
        if (m := re.fullmatch(r"v(\d+)", name))
    )
    keep = {v for v in versions if v > committed}  # in-flight: never touch
    keep.update(v for v in versions if v <= committed)
    retained = sorted(v for v in keep if v <= committed)[-max(keep_last, 1):]
    doomed = [v for v in versions if v <= committed and v not in retained]
    removed = []
    for v in doomed:
        target = os.path.join(path, f"v{v}")
        shutil.rmtree(target, ignore_errors=True)
        removed.append(f"v{v}")
    return removed


def read_snapshot_at(spark: SparkSession, path: str, version: int) -> DataFrame:
    """TIME-TRAVEL read: the snapshot as of a PAST committed version — the
    read half of the versioned copy-on-write protocol (every ``v{N}``
    directory is immutable once the marker moves past it, so historical
    reads need no locks and see no torn state). Raises if ``version`` is
    newer than the committed marker (an in-flight write is not a readable
    version) or its directory was vacuumed (:func:`vacuum_versions`
    documents the retention budget)."""
    committed = latest_version(path)
    if committed is None or version > committed:
        raise ValueError(
            f"version {version} is not committed at {path} "
            f"(committed={committed})"
        )
    target = os.path.join(path, f"v{version}")
    if not os.path.isdir(target):
        raise ValueError(
            f"version {version} was vacuumed from {path} — "
            "raise vacuum_versions(keep_last=...) to retain more history"
        )
    return spark.read.parquet(target)
