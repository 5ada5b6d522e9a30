"""Writers / sinks (SURVEY.md §2.1 S11-S13, S15, S18).

``mode("overwrite")`` everywhere mirrors the reference's put-semantics
(DataFrameWriteOptions default). All writers accept ``s3a://`` URIs, which
covers the reference's S3 sink (``src/utils/aws.rs:198-236``) — multipart
upload, chunking, and retry are the S3A committer's job, not application code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """Parquet sink (S11/S12; reference ``df.write_parquet``,
    ``src/utils/datasets.rs:112-114`` and the manual stream→buffer writer at
    ``src/utils/dataframe.rs:693-705`` — engine-internal in Spark).

    ``partition_by`` adds hive-style directory partitioning — the 100 TB
    layout lever the reference lacks entirely.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (S18 analog of ``df_to_json_bytes``,
    ``src/utils/dataframe.rs:813-823`` — distributed file form)."""
    df.write.mode(mode).json(path)


def df_to_json_rows(df: DataFrame) -> list[str]:
    """DF → JSON strings on the driver (S18/C3 exact form;
    reference ``df_to_json_bytes`` and ``record_batches_to_json_rows``,
    ``examples/dataframe/actions.rs:112-133``). Driver-side by contract —
    use :func:`write_json` for anything large."""
    return df.toJSON().collect()


def write_bucketed_table(
    df: DataFrame,
    name: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist as a bucketed (+optionally sorted) managed table.

    The 100 TB join lever the reference has no analog for: two tables
    bucketed on the same key with the same bucket count join WITHOUT any
    shuffle — the Exchange disappears from the plan (asserted in
    tests/test_plans.py). Bucket pruning also serves point lookups.
    """
    import shutil

    def _strip_file_scheme(p: str) -> str:
        for prefix in ("file://", "file:"):
            if p.startswith(prefix):
                return p[len(prefix) :]
        return p

    spark = df.sparkSession
    # a managed table's warehouse directory outlives the default in-memory
    # catalog: a FRESH session (the external driver's, a new check run) sees
    # no table but an existing location, and overwrite-saveAsTable fails
    # with LOCATION_ALREADY_EXISTS. Clear both layers before writing
    # (tests/test_plans.py regression):
    #  - catalog entry known → resolve its REAL location + type from the
    #    catalog; sweep files only for managed tables (DROP already removes
    #    managed data on most catalogs, rmtree is the in-memory-catalog
    #    belt-and-braces) — never delete an EXTERNAL table's data.
    #  - no catalog entry (orphan dir from a previous session) → sweep only
    #    the default-warehouse path, including the `db.db/tbl` layout for
    #    db-qualified names.
    if mode == "overwrite":
        location = table_type = None
        if spark.catalog.tableExists(name):
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect():
                if r.col_name == "Location":
                    location = r.data_type
                elif r.col_name == "Type":
                    table_type = r.data_type
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        if location is not None:
            if table_type != "EXTERNAL":
                shutil.rmtree(_strip_file_scheme(location), ignore_errors=True)
        else:
            warehouse = _strip_file_scheme(
                spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            )
            parts = name.lower().split(".")
            rel = parts[-1] if len(parts) == 1 else os.path.join(
                f"{parts[-2]}.db", parts[-1]
            )
            shutil.rmtree(os.path.join(warehouse, rel), ignore_errors=True)

    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    return df.sparkSession.table(name)


def ensure_bucketed_table(
    df: DataFrame,
    name: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Idempotent form of :func:`write_bucketed_table`: skip the (expensive)
    ingest when ``name`` already exists in this session's catalog with the
    same bucket count, bucket columns, sort columns, schema, AND content —
    so repeated invocations (bench REPEATS, correctness sweeps) time the
    shuffle-free JOIN, not the table rewrite (ADVICE r6). "Same content" is
    an order-independent full-row fingerprint (``bit_xor(xxhash64(*))`` +
    count), not just cardinality: testdata is regenerated between rounds
    (CLAUDE.md), and an equal-rowcount regeneration must NOT silently reuse
    stale bucketed bytes (ADVICE r7). Any drift falls through to a full
    overwrite; a fingerprint that can't be computed (exotic types) is
    treated as drift — correctness over the skip."""
    spark = df.sparkSession
    if spark.catalog.tableExists(name):
        desc = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        }

        def _want(cols):
            return "[" + ", ".join(f"`{c}`" for c in cols) + "]"

        existing = spark.table(name)

        def _fingerprint(frame: DataFrame):
            # xor alone cancels on even multiplicities ({A,A} == {B,B} == 0);
            # the overflow-free DECIMAL sum breaks that symmetry
            row = frame.selectExpr(
                "bit_xor(xxhash64(*)) AS fp",
                "sum(CAST(xxhash64(*) AS DECIMAL(38,0))) AS fps",
                "count(*) AS n",
            ).collect()[0]
            return (row.fp, row.fps, row.n)

        try:
            same = (
                desc.get("Num Buckets") == str(n_buckets)
                and desc.get("Bucket Columns") == _want(bucket_cols)
                and desc.get("Sort Columns", "[]") == _want(sort_cols or [])
                and existing.schema == df.schema
                and _fingerprint(existing) == _fingerprint(df)
            )
        except Exception:  # noqa: BLE001 - unhashable type etc. → rewrite
            same = False
        if same:
            return existing
    return write_bucketed_table(df, name, n_buckets, bucket_cols, sort_cols)


def compact_parquet(spark: SparkSession, path: str, target_files: int) -> int:
    """Small-file compaction: rewrite a parquet dataset into ``target_files``
    files (staging dir + atomic-ish swap).

    The operational op every long-running 100 TB ingest needs — streaming and
    per-task writers accrete small files that destroy scan throughput
    (per-file open cost, tiny row groups). ``coalesce`` avoids a shuffle.
    Returns the file count after compaction.
    """
    import os
    import shutil

    staging = path.rstrip("/") + "__compacting"
    retired = path.rstrip("/") + "__old"
    df = spark.read.parquet(path)
    df.coalesce(target_files).write.mode("overwrite").parquet(staging)
    # Swap order matters for crash safety: park the live dir aside FIRST, then
    # promote staging, then delete the parked copy — a crash at any point
    # leaves either the old or the new data at (or one rename from) `path`,
    # never an empty path. (rmtree-before-rename would.)
    if os.path.exists(retired):
        shutil.rmtree(retired)
    os.rename(path, retired)
    os.rename(staging, path)
    shutil.rmtree(retired)
    return len([f for f in os.listdir(path) if f.endswith(".parquet")])


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with schema evolution by merge — the reference's
    ``Schema::try_merge`` behavior (``src/utils/helpers.rs:231,279,334,387``):
    files written with different (compatible) schemas union into one frame,
    absent columns null-filled. Costs a footer scan of every file — turn on
    only for evolving datasets."""
    return spark.read.option("mergeSchema", True).parquet(path)


def write_csv_to_parquet(spark: SparkSession, csv_path: str, out_path: str,
                         header: bool = True) -> DataFrame:
    """CSV→Parquet materialization (S13; reference ``write_csv_to_parquet``,
    ``src/utils/datasets.rs:87-120``). Returns the re-read parquet frame."""
    from .readers import read_csv

    df = read_csv(spark, csv_path, header=header)
    write_parquet(df, out_path)
    return spark.read.parquet(out_path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Dynamic partition overwrite: replace ONLY the hive partitions present
    in ``df``, leaving all other partitions of the table untouched — the
    idempotent daily-backfill write (static overwrite mode would clobber the
    whole table; append would duplicate the re-run day).

    Uses Spark's ``partitionOverwriteMode=dynamic`` scoped to this write via
    the DataFrameWriter option (no session-level conf mutation, so
    concurrent writers keep their own semantics).
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )
