"""``SessionContext`` — a facade giving the reference's entry-point API
(DataFusion ``SessionContext``; SURVEY.md §1.1) over a ``SparkSession``.

Method-for-method parity with the surface the reference exercises:
``sql``, ``read_csv``/``read_parquet``/``read_batch``/``read_empty``,
``register_csv``/``register_parquet``/``register_batch``/``register_table``/
``register_udf``, ``table``, ``deregister_table``. Everything stays lazy —
registered names are temp views (plan aliases, the reference's ``ViewTable``
semantics, ``src/utils/dataframe.rs:781-790``); ``cache_table`` gives the
materialized ``MemTable`` behavior (``:738-748``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import get_session
from .errors import PlanError
from .sources import (
    get_empty_df,
    read_batch,
    read_csv,
    read_csv_no_header,
    read_parquet,
)


class SessionContext:
    """Spark-backed analog of DataFusion's ``SessionContext``
    (``examples/dataframe/query.rs:39`` and throughout the reference)."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_session()

    # -- queries ----------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Entry A — SQL string → lazy DataFrame (``ctx.sql``,
        ``examples/dataframe/query.rs:43-48``)."""
        return self.spark.sql(query)

    # -- readers ----------------------------------------------------------
    def read_csv(self, path: str, header: bool = True, schema: str | None = None) -> DataFrame:
        if header:
            return read_csv(self.spark, path, header=True, schema=schema)
        return read_csv_no_header(self.spark, path, schema=schema)

    def read_parquet(self, path: str) -> DataFrame:
        return read_parquet(self.spark, path)

    def read_batch(self, data, schema=None) -> DataFrame:
        return read_batch(self.spark, data, schema=schema)

    def read_batches(self, batches, schema=None) -> DataFrame:
        """Multiple in-memory batches → one frame (``ctx.read_batches``,
        ``src/utils/dataframe.rs:300``)."""
        from functools import reduce

        dfs = [read_batch(self.spark, b, schema=schema) for b in batches]
        if not dfs:
            raise PlanError("read_batches: need at least one batch")
        return reduce(DataFrame.unionByName, dfs)

    def read_empty(self) -> DataFrame:
        """1 row × 0 cols (``ctx.read_empty``, ``src/utils/helpers.rs:27-30``)."""
        return self.spark.range(1).drop("id")

    def empty_df(self) -> DataFrame:
        """0 rows × 0 cols (``get_empty_df``, ``src/utils/helpers.rs:34-38``)."""
        return get_empty_df(self.spark)

    # -- catalog ----------------------------------------------------------
    def register_csv(self, name: str, path: str, **kwargs) -> None:
        self.read_csv(path, **kwargs).createOrReplaceTempView(name)

    def register_parquet(self, name: str, path: str) -> None:
        self.read_parquet(path).createOrReplaceTempView(name)

    def register_batch(self, name: str, data, schema=None) -> None:
        self.read_batch(data, schema=schema).createOrReplaceTempView(name)

    def register_table(self, name: str, df: DataFrame) -> None:
        """Lazy view over a plan (``df.into_view()`` + ``register_table``,
        ``examples/dataframe/query.rs:147-149``)."""
        df.createOrReplaceTempView(name)

    def cache_table(self, name: str, df: DataFrame) -> DataFrame:
        """Materialized table — the ``MemTable`` path
        (``src/utils/dataframe.rs:738-748``): cached on first action, then
        served from memory."""
        cached = df.cache()
        cached.createOrReplaceTempView(name)
        return cached

    def register_udf(self, name: str, fn, return_type) -> None:
        """SQL-callable UDF (``ctx.register_udf``, ``examples/udf/udf.rs:96-106``)."""
        self.spark.udf.register(name, fn, return_type)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def deregister_table(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)

    def table_names(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables()]
