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
therefore widens ONLY when the input is narrower than the core count, and is
a plan no-op otherwise. The repartition key is the caller's row key
(deterministic hash placement — never ``rand()``-derived, see SPARK-38388);
keyless calls use round-robin, which Spark makes retry-deterministic via its
sort-before-repartition.

Width is derived from INPUT FILE METADATA (bytes → the scan's split
arithmetic, parquet footers → rows), NOT from ``df.rdd.getNumPartitions()``:
accessing ``.rdd`` on an AdaptiveSparkPlan finalizes it, EXECUTING every
upstream shuffle query stage, and that work is thrown away when the caller's
rebuilt plan runs (r13 advisor finding). Both helpers therefore assume a
SCAN-ROOTED input (every current call site selects straight off a parquet
table); a frame with no resolvable input files is treated as narrow, which
costs at most one extra exchange and never a double execution.

The rows estimate also bounds the fan-out (``min_rows_per_part``): widening
a 5k-row input to 32 partitions is pure per-task overhead when each task
then spins a Python/Arrow worker for ~150 rows of work (r13 driver bench:
the multimodal paths showed the suite's worst 32-core scaling ratios,
0.28-0.38 — 32 workers spun up for ~1s of decode). The cap is derived from
the data (rows ÷ per-row-cost floor), never a constant partition count, so
at 10× the rows the same call fans out the full core width.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: how many parquet footers to open when estimating rows — beyond this the
#: mean of the sample is extrapolated (footer reads are metadata-only but
#: still one open() per file; thousands of part files need no exactness here)
_FOOTER_SAMPLE = 16


def _input_meta(df: DataFrame) -> tuple[int, int | None]:
    """(estimated scan splits, estimated rows | None) from the frame's input
    files — pure metadata, runs no Spark job. Splits follow the scan's own
    packing arithmetic (``maxPartitionBytes`` / ``openCostInBytes``); rows
    come from parquet footers (sampled + extrapolated past
    ``_FOOTER_SAMPLE`` files). A frame with no input files (in-memory or
    checkpoint-rooted) reports (1, None): treated as narrow-input."""
    files = [f[7:] if f.startswith("file://") else f for f in df.inputFiles()]
    files = [f for f in files if os.path.exists(f)]
    if not files:
        return 1, None
    conf = df.sparkSession.conf

    def _bytes_conf(key: str, default: int) -> int:
        # Spark renders byte confs as "<n>b" / "128m" / "1g" etc.
        raw = str(conf.get(key, str(default))).strip().lower()
        if raw.endswith("b"):
            raw = raw[:-1]
        mult = 1
        for suffix, m in (("k", 1024), ("m", 1024**2), ("g", 1024**3)):
            if raw.endswith(suffix):
                raw, mult = raw[:-1], m
                break
        try:
            return int(raw) * mult
        except ValueError:
            return default

    max_split = _bytes_conf("spark.sql.files.maxPartitionBytes", 128 * 1024**2)
    open_cost = _bytes_conf("spark.sql.files.openCostInBytes", 4 * 1024**2)
    total_cost = sum(os.path.getsize(f) + open_cost for f in files)
    est_splits = max(1, -(-total_cost // max_split))
    rows: int | None = None
    try:
        import pyarrow.parquet as pq

        sample = files[:_FOOTER_SAMPLE]
        sampled = sum(pq.ParquetFile(f).metadata.num_rows for f in sample)
        rows = sampled * len(files) // len(sample)
    except Exception:  # non-parquet input: bytes estimate still stands
        rows = None
    return int(est_splits), rows


def _target_parts(df: DataFrame, min_rows_per_part: int) -> tuple[int, int]:
    """(input width estimate, capped target) — shared by both helpers."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    est_splits, rows = _input_meta(df)
    target = max(cores, est_splits)
    if rows is not None and min_rows_per_part > 1:
        target = min(target, max(1, -(-rows // min_rows_per_part)))
    return est_splits, target


def spread_for_compute(
    df: DataFrame, *key_cols: str, min_rows_per_part: int = 1
) -> DataFrame:
    """Repartition ``df`` up to the session's core count iff its input is
    narrower; identity otherwise. Result-invariant: only placement changes,
    never values (callers are per-row maps or partitioning-invariant integer
    folds). ``min_rows_per_part`` caps the fan-out by the input's estimated
    rows (see module doc)."""
    est_splits, target = _target_parts(df, min_rows_per_part)
    if est_splits >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)


def repartition_for_compute(
    df: DataFrame, *key_cols: str, min_rows_per_part: int = 1
) -> DataFrame:
    """``df.repartition(key_cols)`` with an EXPLICIT partition count of
    ``max(session cores, input width)`` — for pipelines that need the hash
    co-partitioning downstream (their groupBys on the same key reuse the
    exchange) AND the pre-explode compute parallelism.

    A bare ``repartition(col)`` carries no user partition count, so AQE's
    coalescer is free to shrink it by bytes — and on the small single-split
    test parquet it shrinks to ONE partition, serializing the very
    hash/shingle stage the repartition was written to parallelize (measured
    r13: exploded_shingles ran 1-partition at sf0.1 despite its docstring).
    An explicit count is exempt from AQE coalescing; deriving it from the
    input width and core count keeps it scale-adaptive — at production the
    scan is already ≥ cores partitions and the count simply preserves that
    width, never a local constant. ``min_rows_per_part`` caps the count by
    estimated input rows (see module doc)."""
    _, target = _target_parts(df, min_rows_per_part)
    return df.repartition(target, *[F.col(c) for c in key_cols])
