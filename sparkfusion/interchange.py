"""Client-interchange surface (SURVEY.md §2.11 C1-C6, plus S6/U2/O2/P19).

These are deliberately driver-side APIs — the reference's record/JSON
round-trip helpers. Anything bulk belongs in :mod:`sparkfusion.sources`
writers instead; each function documents its scalability contract.
"""

from __future__ import annotations

import dataclasses
import io
from collections.abc import Sequence
from typing import Any, TypeVar

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

T = TypeVar("T")


def df_to_records(df: DataFrame) -> list[dict[str, Any]]:
    """DF → list of plain dicts (C1; reference zipped-iterator and
    downcast-loop deserializers, ``examples/dataframe/deserialize_to_struct.rs:45-122``).
    Driver-side by contract — bounded result sets only.

    >>> df_to_records(spark.createDataFrame([(1, "red")], "id INT, color STRING"))
    [{'id': 1, 'color': 'red'}]
    """
    return [row.asDict(recursive=True) for row in df.collect()]


def df_to_typed(df: DataFrame, cls: type[T]) -> list[T]:
    """DF → dataclass instances, missing-column tolerant (C1 third style,
    ``examples/dataframe/deserialize_to_struct.rs:125-201``): absent columns
    become None, extra columns are ignored."""
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"df_to_typed: {cls!r} is not a dataclass")
    names = [f.name for f in dataclasses.fields(cls)]
    out = []
    for row in df.collect():
        d = row.asDict(recursive=True)
        out.append(cls(**{n: d.get(n) for n in names}))
    return out


def records_to_df(spark: SparkSession, records: Sequence[Any], schema=None) -> DataFrame:
    """Records → DF (C2; serde-decoder / TryFrom constructors,
    ``examples/dataframe/convert_vec_structs_to_df.rs``). Accepts dataclass
    instances, dicts, or Rows/tuples.

    >>> out = records_to_df(spark, [{"id": 7, "name": "x"}], "id INT, name STRING")
    >>> df_to_records(out)
    [{'id': 7, 'name': 'x'}]
    """
    if records and dataclasses.is_dataclass(records[0]):
        records = [dataclasses.asdict(r) for r in records]
    return spark.createDataFrame(records, schema=schema)


def df_to_json_rows(df: DataFrame) -> list[str]:
    """DF → JSON strings (C3/S18; ``record_batches_to_json_rows``,
    ``examples/dataframe/actions.rs:112-133``).

    >>> df_to_json_rows(spark.createDataFrame([(1, "a")], "id INT, s STRING"))
    ['{"id":1,"s":"a"}']
    """
    return df.toJSON().collect()


def scalar_at(df: DataFrame, row_idx: int, col: str):
    """Single-cell extraction (P19/C4; ``ScalarValue::try_from_array``
    wrapper, ``src/utils/scalarvalue.rs:10-12``). Collects ``row_idx + 1``
    rows — fine for probes, not for iteration.

    >>> scalar_at(spark.createDataFrame([(10,), (20,)], "v INT").orderBy("v"), 1, "v")
    20
    """
    rows = df.take(row_idx + 1)
    if len(rows) <= row_idx:
        raise IndexError(f"scalar_at: row {row_idx} out of range")
    return rows[row_idx][col]


def get_column_names(df: DataFrame) -> list[str]:
    """Column-name introspection (C5; ``get_column_names``,
    ``src/utils/dataframe.rs:131-142`` — its empty-schema ``None`` maps to
    ``[]`` here).

    >>> get_column_names(spark.createDataFrame([(1, 2)], "a INT, b INT"))
    ['a', 'b']
    """
    return df.columns


def is_empty(df: DataFrame) -> bool:
    """Emptiness probe (C6; ``is_empty``, ``src/utils/dataframe.rs:104-111``).
    Spark's ``isEmpty`` short-circuits on the first non-empty partition, the
    same behavior as the reference's first-batch stream probe.

    >>> is_empty(spark.range(0)), is_empty(spark.range(3))
    (True, False)
    """
    return df.isEmpty()


def concat_df_batches(df: DataFrame) -> DataFrame:
    """Collapse to a single partition (U2; ``concat_df_batches``,
    ``src/utils/dataframe.rs:251-256``). ``coalesce`` not ``repartition`` —
    no shuffle, partitions are concatenated on one task. A deliberate
    anti-scale operation (single-file export etc.); never in a hot path."""
    return df.coalesce(1)


def read_parquet_bytes(spark: SparkSession, raw: bytes) -> DataFrame:
    """Decode an in-memory parquet byte buffer into a DataFrame (S6;
    reference's manual file→bytes→batch decode, ``src/utils/dataframe.rs:669-689``).
    Spark has no user-level byte decoder, so the bytes are decoded via
    pandas/pyarrow on the driver and re-entered as an Arrow-backed frame."""
    import pandas as pd

    return spark.createDataFrame(pd.read_parquet(io.BytesIO(raw)))


def execute_stream(df: DataFrame, max_records_per_batch: int = 10_000):
    """Pull-based incremental batch consumption — the reference's
    ``df.execute_stream()`` / ``RecordBatchStream`` (SURVEY.md §1.1,
    ``src/utils/dataframe.rs:105``): yields pyarrow RecordBatches one at a
    time without materializing the full result on the driver.

    Implemented over ``toLocalIterator`` (partition-at-a-time pull; executors
    compute ahead of the consumer) re-batched through pandas→Arrow. This is
    execution streaming, NOT event streaming (that's
    :mod:`sparkfusion.streaming`).
    """
    import pandas as pd
    import pyarrow as pa

    schema = pa.Schema.from_pandas(df.limit(0).toPandas(), preserve_index=False)
    rows_iter = df.toLocalIterator(prefetchPartitions=True)
    buf: list = []
    for row in rows_iter:
        buf.append(row.asDict(recursive=True))
        if len(buf) >= max_records_per_batch:
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame(buf), schema=schema, preserve_index=False
            )
            buf = []
    if buf:
        yield pa.RecordBatch.from_pandas(
            pd.DataFrame(buf), schema=schema, preserve_index=False
        )


def sort_df(df: DataFrame, col: str, asc: bool = True, nulls_first: bool = True) -> DataFrame:
    """Two-flag sort matching the reference's ``col.sort(asc, nulls_first)``
    (O1/O2; ``src/utils/dataframe.rs:229``). Spark's nulls placement defaults
    are asymmetric, so both flags are always emitted explicitly
    (SURVEY.md §7 risk 4).

    >>> df = spark.createDataFrame([(2,), (None,), (1,)], "v INT")
    >>> [r["v"] for r in sort_df(df, "v").collect()]
    [None, 1, 2]
    >>> [r["v"] for r in sort_df(df, "v", asc=False, nulls_first=False).collect()]
    [2, 1, None]
    """
    c = F.col(col)
    if asc:
        expr: Column = c.asc_nulls_first() if nulls_first else c.asc_nulls_last()
    else:
        expr = c.desc_nulls_first() if nulls_first else c.desc_nulls_last()
    return df.orderBy(expr)
