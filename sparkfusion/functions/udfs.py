"""UDF surface (SURVEY.md §2.10 X1-X4).

The reference registers scalar Arrow-native UDFs processing whole columns at
a time (``ColumnarValue::Array``). The Spark analog with the same execution
shape is the **pandas UDF** — Arrow batches in, Arrow batches out — not the
row-at-a-time Python UDF. For each reference UDF we also provide the pure
built-in expression form, which stays in whole-stage codegen and is the
perf-sane default (no Python worker round-trip at all).
"""

from __future__ import annotations

import pandas as pd
from collections.abc import Iterator
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# X1/X2 — split_text: Utf8 -> Utf8 (first token before the separator)
# Reference: create_udf("split_text", ...) at examples/udf/udf.rs:17-59;
# SQL registration at examples/udf/udf.rs:96-106.
# ---------------------------------------------------------------------------


def split_text_builtin(col: Column | str, sep: str = r"\.") -> Column:
    """Built-in form — ``F.split(c, sep)[0]`` (no UDF, codegen'd).

    This is the production path (SURVEY.md §2.8 F7): identical semantics to
    the reference UDF without leaving the JVM.
    """
    return F.split(F.col(col) if isinstance(col, str) else col, sep).getItem(0)


def make_split_text_pandas_udf(sep: str = "."):
    """Vectorized pandas UDF form — Arrow batch in/out, mirroring the
    reference's whole-array ``ColumnarValue::Array`` processing (X1)."""

    @F.pandas_udf(StringType())
    def split_text(s: pd.Series) -> pd.Series:
        return s.str.split(sep).str[0]

    return split_text


def register_split_text(spark: SparkSession, name: str = "split_text", sep: str = ".") -> None:
    """Register for SQL use (X2; reference ``ctx.register_udf`` →
    ``select split_text(name) from t``, ``examples/udf/udf.rs:96-106``).

    Registered deterministic — the analog of ``Volatility::Immutable`` (X4,
    ``examples/udf/udf.rs:47``); Spark pandas UDFs are deterministic unless
    ``.asNondeterministic()`` is called.
    """
    spark.udf.register(name, make_split_text_pandas_udf(sep))


# ---------------------------------------------------------------------------
# X3 — split_row: Utf8 -> Struct{city: Utf8, temperature: Float64}
# Reference: examples/algo/one_billion_row_challenge.rs:125-197 (null-safe
# per-field builders).
# ---------------------------------------------------------------------------

SPLIT_ROW_SCHEMA = StructType(
    [
        StructField("city", StringType(), True),
        StructField("temperature", DoubleType(), True),
    ]
)


def split_row_builtin(col: Column | str, sep: str = ";") -> Column:
    """Built-in form: ``struct(split[0] AS city, try_cast(split[1]) AS temperature)``.

    Null-safe exactly like the reference's per-field builders: a malformed row
    yields null fields, not an error (try_cast under Spark 4 ANSI mode).
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, sep)
    return F.struct(
        parts.getItem(0).alias("city"),
        F.try_element_at(parts, F.lit(2)).try_cast("double").alias("temperature"),
    )


@F.pandas_udf(SPLIT_ROW_SCHEMA)
def split_row_pandas_udf(s: pd.Series) -> pd.DataFrame:
    """Struct-returning pandas UDF form (X3): Arrow batch → pandas DataFrame
    with one column per struct field."""
    parts = s.str.split(";", n=1, expand=True)
    if parts.shape[1] < 2:
        parts[1] = None
    return pd.DataFrame(
        {
            "city": parts[0],
            "temperature": pd.to_numeric(parts[1], errors="coerce"),
        }
    )


def make_iter_scoring_udf(load_acc=None):
    """Iterator-of-Series pandas UDF — the LLM-inference shape: the
    "model" loads ONCE per executor task (per partition), then scores every
    Arrow batch of that partition with it. A plain pandas UDF would reload
    per batch; at 100 TB with a real checkpoint that difference is the whole
    job cost. The stub model is deterministic (score = token count × a
    weight from the "checkpoint") so the output is oracle-checkable;
    ``load_acc`` (a SparkContext accumulator) lets tests assert
    load-once-per-partition (not per-batch) semantics.
    """
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # expensive one-time setup happens HERE, before the batch loop
        if load_acc is not None:
            load_acc.add(1)
        weight = 0.5  # stands in for loaded model weights
        for s in batches:
            yield s.str.split().str.len().astype("float64") * weight

    return score
