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
    """Committed snapshot version at ``path``, or None before first commit."""
    marker = os.path.join(path, _MARKER)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().strip())


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
