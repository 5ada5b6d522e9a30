"""Readers (SURVEY.md §2.1 S1-S10).

Every reader returns a lazy DataFrame whose scan participates in Catalyst
pushdown; registration variants bind a temp-view name, mirroring the
reference's ``ctx.register_*`` catalog calls.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from ..errors import SchemaError


def read_csv(spark: SparkSession, path: str, header: bool = True, infer_schema: bool = True,
             schema: str | None = None) -> DataFrame:
    """CSV scan with schema inference (S1).

    Reference: ``ctx.read_csv(path, CsvReadOptions::default())`` at
    ``src/utils/datasets.rs:54-56`` (DataFusion infers types by default).
    Pass an explicit ``schema`` DDL string in production — inference scans the
    file twice, which is wasteful at 100 TB.
    """
    reader = spark.read.option("header", header)
    if schema:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_csv_no_header(spark: SparkSession, path: str, n_cols: int | None = None,
                       schema: str | None = None) -> DataFrame:
    """Headerless CSV scan with DataFusion-style auto column names (S2).

    Reference: ``CsvReadOptions::new().has_header(false)`` auto-names columns
    ``column_1..column_n`` (``examples/algo/one_billion_row_challenge.rs:121-123``);
    Spark auto-names ``_c0..`` — renamed here to match the reference contract.
    """
    reader = spark.read.option("header", False)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    renames = {c: f"column_{i + 1}" for i, c in enumerate(df.columns) if c.startswith("_c")}
    return df.withColumnsRenamed(renames) if renames else df


def register_csv(spark: SparkSession, name: str, path: str, **kwargs) -> DataFrame:
    """CSV table registration (S3; reference
    ``ctx.register_csv``, ``examples/algo/one_billion_row_challenge.rs:122``)."""
    df = read_csv(spark, path, **kwargs)
    df.createOrReplaceTempView(name)
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (S4; reference ``ctx.read_parquet``,
    ``src/utils/datasets.rs:184-185``). Also serves S6 — Spark's vectorized
    reader *is* the byte→batch decoder the reference hand-rolls at
    ``src/utils/dataframe.rs:669-689``. Works on ``s3a://`` URIs for S14."""
    return spark.read.parquet(path)


def register_parquet(spark: SparkSession, name: str, path: str) -> DataFrame:
    """Parquet table registration (S5; reference ``ctx.register_parquet``,
    ``examples/dataframe/query.rs:118-123``)."""
    df = read_parquet(spark, path)
    df.createOrReplaceTempView(name)
    return df


def read_batch(spark: SparkSession, data, schema=None, name: str | None = None) -> DataFrame:
    """In-memory batch source (S7).

    Reference: ``ctx.read_batch(batch)`` / ``register_batch``
    (``examples/dataframe/query.rs:41``). Accepts rows, pandas DataFrames
    (Arrow-converted, the closest analog of a RecordBatch), or pyarrow tables.
    """
    if isinstance(data, pd.DataFrame):
        df = spark.createDataFrame(data, schema=schema)
    elif hasattr(data, "to_pandas"):  # pyarrow.Table — true RecordBatch parity
        df = spark.createDataFrame(data.to_pandas(), schema=schema)
    else:
        df = spark.createDataFrame(data, schema=schema)
    if name:
        df.createOrReplaceTempView(name)
    return df


def read_literal(spark: SparkSession, **columns: Sequence) -> DataFrame:
    """Literal dataframe builder (S8) — the ``dataframe!`` macro analog.

    Reference: ``dataframe!("id" => [1,2,3], "name" => ["foo","bar","baz"])``
    at ``examples/dataframe/create.rs:258-261``, e.g.
    ``read_literal(spark, id=[1, 2], name=["a", "b"])``.
    """
    if not columns:
        raise SchemaError("read_literal: need at least one column")
    lengths = {len(v) for v in columns.values()}
    if len(lengths) > 1:
        raise SchemaError(f"read_literal: column length mismatch {lengths}")
    rows = list(zip(*columns.values()))
    return spark.createDataFrame(pd.DataFrame(rows, columns=list(columns)))
