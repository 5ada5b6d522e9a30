"""Projection / filter / column-mutation operators (SURVEY.md §2.2).

All pure plan transforms. The reference's ``add_column_to_df`` family
materializes batches on the client (``src/utils/dataframe.rs:572-597``); here
positional attach is expressed as a deterministic ordinal zip-join so it stays
distributed (SURVEY.md §7 risk 1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..errors import SchemaError


def df_sql(df: DataFrame, predicate: str) -> DataFrame:
    """Filter a DataFrame with a SQL expression string.

    Reference: ``df_sql`` / ``df.parse_sql_expr`` at
    ``src/utils/dataframe.rs:67-71`` (e.g. ``"speed > 10 and car in
    ('red','green')"``). Spark parses SQL predicate strings natively, and the
    parsed predicate participates in pushdown like any Column expression.

    >>> df = spark.createDataFrame([("red", 15), ("blue", 5)], "car STRING, speed INT")
    >>> df_sql(df, "speed > 10 and car in ('red','green')").collect()
    [Row(car='red', speed=15)]
    """
    return df.filter(predicate)


def select_all_exclude(df: DataFrame, exclude: Sequence[str]) -> DataFrame:
    """Negative projection — keep every column except ``exclude``.

    Reference: ``select_all_exclude`` at ``src/utils/helpers.rs:505-515`` and
    ``df.drop_columns`` at ``src/utils/dataframe.rs:413``. Unknown names are
    ignored, matching Spark's (and the reference's) drop semantics.

    >>> df = spark.createDataFrame([(1, 2, 3)], "a INT, b INT, c INT")
    >>> select_all_exclude(df, ["b", "zzz"]).columns
    ['a', 'c']
    """
    return df.drop(*exclude)


def with_typed_null(df: DataFrame, name: str, data_type: str) -> DataFrame:
    """Add a literal NULL column with an explicit type.

    Reference: typed-null literals ``ScalarValue::Utf8(None)`` /
    ``Int32(None)`` at ``examples/dataframe/operations.rs:128-131``.

    >>> with_typed_null(spark.range(1), "note", "string").dtypes
    [('id', 'bigint'), ('note', 'string')]
    """
    return df.withColumn(name, F.lit(None).cast(data_type))


def add_pk_to_df(df: DataFrame, name: str = "pk", order_by: Sequence[str] | None = None) -> DataFrame:
    """Add a contiguous 0..n-1 auto-increment key column.

    Reference: ``add_pk_to_df`` at ``src/utils/helpers.rs:161-185`` (Int32
    0..n-1 in batch order). Spark has no stable row ordinal, so the contract
    here is explicit: ``order_by`` names the deterministic ordering the key
    follows (defaults to all columns). ``monotonically_increasing_id`` is NOT
    used — it is non-contiguous across partitions.

    Scale note: a global ``row_number`` over one unpartitioned window is a
    single-reducer sort — correct but serial. For 100 TB assignments use
    :func:`zip_with_index` below (partition-offset arithmetic, fully parallel).

    >>> df = spark.createDataFrame([("b",), ("a",)], "k STRING")
    >>> [(r["k"], r["pk"]) for r in add_pk_to_df(df, order_by=["k"]).orderBy("pk").collect()]
    [('a', 0), ('b', 1)]
    """
    cols = list(order_by) if order_by else df.columns
    w = Window.orderBy(*[F.col(c) for c in cols])
    return df.withColumn(name, (F.row_number().over(w) - F.lit(1)).cast("int"))


def zip_with_index(df: DataFrame, name: str = "pk") -> DataFrame:
    """Contiguous 0..n-1 ids without a global sort — the 100 TB-scale variant.

    Two-pass partition-offset scheme (same trick as RDD ``zipWithIndex`` but
    staying in DataFrame land): count rows per partition, prefix-sum the
    offsets on the driver (tiny — one int per partition), then add the
    within-partition position. Order follows current partition order, so it is
    deterministic only after an explicit sort/repartition — callers who need a
    *stable* key should sort first or use :func:`add_pk_to_df`.
    """
    from pyspark.sql.types import StructType

    spark = df.sparkSession
    rdd = df.rdd.zipWithIndex()
    # copy before .add — StructType.add mutates in place, and df.schema is a
    # cached object: mutating it corrupts the source frame for later calls
    out_schema = StructType(list(df.schema.fields)).add(name, "long", False)
    return spark.createDataFrame(rdd.map(lambda pair: (*pair[0], pair[1])), out_schema)


def zip_with_index_df(df: DataFrame, name: str = "pk") -> DataFrame:
    """Contiguous 0..n-1 ids, pure-DataFrame (Spark Connect-safe) variant of
    :func:`zip_with_index` — no RDD API, so it works where the RDD surface is
    unavailable (Connect) and stays inside Catalyst.

    Same two-pass partition-offset scheme, expressed relationally: tag each
    row with its partition id and a within-partition ordinal
    (``monotonically_increasing_id`` is strictly increasing *within* a
    partition, so a window ordered by it yields the intra-partition position);
    compute per-partition counts (one row per partition — tiny), prefix-sum
    them with a window over that tiny frame, broadcast-join the offsets back.
    No global sort, no single reducer: the only total ordering is over the
    partition-count frame (#partitions rows).

    Determinism caveat (same as :func:`zip_with_index`): ids follow current
    partition layout, so they are stable only for a deterministic source scan;
    sort first or use :func:`add_pk_to_df` for an order-defined key.
    """
    # localCheckpoint: counts and the main branch both read `tagged`; if the
    # input contains a non-user-specified shuffle, AQE can coalesce the two
    # re-executions differently and spark_partition_id()/__mid disagree
    # between branches (the r11 ranks.py sf1 bug class) — materialize once.
    tagged = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    counts = tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).drop("__cnt")
    w_pos = Window.partitionBy("__pid").orderBy("__mid")
    return (
        tagged.join(F.broadcast(offsets), "__pid")
        .withColumn(name, (F.row_number().over(w_pos) - 1 + F.col("__off")).cast("long"))
        .drop("__pid", "__mid", "__off")
    )


def add_column(df: DataFrame, values_df: DataFrame, order_by: Sequence[str]) -> DataFrame:
    """Positionally attach the (single-column) ``values_df`` to ``df``.

    Reference: ``add_column_to_df`` (``src/utils/dataframe.rs:572-597``) glues
    a client-built Arrow array onto a DataFrame by position, erroring on
    length mismatch (``:585-591``). Spark has no positional attach, so both
    sides get a deterministic ordinal (``row_number`` over ``order_by`` on the
    left, natural order of ``values_df`` via the same window on its columns)
    and are equi-joined on it. Errors on length mismatch, mirroring the
    reference — but *lazily*: instead of two eager ``count()`` driver jobs
    (two full passes before any useful work), the ordinal join is FULL OUTER
    with a presence marker on each side, and the attached value is wrapped in
    a ``raise_error`` guard that fires during the same single pass that
    produces the result. Zero extra jobs; the mismatch check is free.
    """
    if len(values_df.columns) != 1:
        raise SchemaError("add_column: values_df must have exactly one column")
    val_col = values_df.columns[0]
    w_left = Window.orderBy(*[F.col(c) for c in order_by])
    w_right = Window.orderBy(*[F.col(c) for c in values_df.columns])
    left = df.withColumn("__ord", F.row_number().over(w_left)).withColumn(
        "__l", F.lit(1)
    )
    right = values_df.withColumn("__ord", F.row_number().over(w_right)).withColumn(
        "__r", F.lit(1)
    )
    joined = left.join(right, "__ord", "full_outer")
    guarded = F.when(
        F.col("__l").isNull() | F.col("__r").isNull(),
        F.raise_error(F.lit("add_column: length mismatch between df and values_df")),
    ).otherwise(F.col(val_col))
    return joined.withColumn(val_col, guarded.cast(right.schema[val_col].dataType)).drop(
        "__ord", "__l", "__r"
    )
