"""Schema-manipulation operators: columns→JSON, columns→struct (SURVEY.md §2.2
P14/P15 — the reference's signature helpers).

The reference implements both by collecting batches to the client, rebuilding
arrays, and re-registering a MemTable (``src/utils/dataframe.rs:362-415`` and
``:471-518``). Here they are single-expression plan transforms — ``to_json``
and ``struct`` run inside whole-stage codegen, fully distributed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..errors import SchemaError


def _require_columns(df: DataFrame, cols: Sequence[str]) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        # mirrors the reference's missing-column error (tests at
        # src/utils/dataframe.rs:1051-1063)
        raise SchemaError(f"columns not found in dataframe: {missing}")


def df_cols_to_json(df: DataFrame, cols: Sequence[str], new_col: str, drop: bool = True) -> DataFrame:
    """Serialize ``cols`` row-wise into a JSON-text column, dropping sources.

    Reference: ``df_cols_to_json`` at ``src/utils/dataframe.rs:362-415``.
    Contract (from its test cases ``:1067-1075``): null fields are omitted
    from the JSON object; key order is the column order given. Spark's
    ``to_json(struct(...))`` matches both behaviors (null fields dropped,
    struct field order preserved).

    >>> df = spark.createDataFrame([(1, None, "x")], "a INT, b INT, c STRING")
    >>> df_cols_to_json(df, ["a", "b"], "j").collect()
    [Row(c='x', j='{"a":1}')]
    """
    _require_columns(df, cols)
    out = df.withColumn(new_col, F.to_json(F.struct(*[F.col(c) for c in cols])))
    return out.drop(*cols) if drop else out


def df_cols_to_struct(df: DataFrame, cols: Sequence[str], new_col: str, drop: bool = True) -> DataFrame:
    """Pack ``cols`` into a single struct column, dropping sources.

    Reference: ``df_cols_to_struct`` at ``src/utils/dataframe.rs:471-518``;
    SQL form ``struct(name as name, ...)`` noted at ``:466-467`` and
    ``examples/dataframe/operations.rs:201``.

    >>> df = spark.createDataFrame([(1, 2, "x")], "a INT, b INT, c STRING")
    >>> out = df_cols_to_struct(df, ["a", "b"], "ab")
    >>> out.columns
    ['c', 'ab']
    >>> out.collect()[0]["ab"]
    Row(a=1, b=2)
    """
    _require_columns(df, cols)
    out = df.withColumn(new_col, F.struct(*[F.col(c) for c in cols]))
    return out.drop(*cols) if drop else out
