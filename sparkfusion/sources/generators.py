"""Frame generators (SURVEY.md §2.1 S9-S10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from ..errors import PlanError

#: random-string alphabet matching the reference's ascii-alphanumeric sampler
_ALPHANUM = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"


def get_empty_df(spark: SparkSession) -> DataFrame:
    """0 rows × 0 columns (S9; reference ``get_empty_df``,
    ``src/utils/helpers.rs:34-38``)."""
    return spark.createDataFrame([], StructType([]))


def read_empty(spark: SparkSession) -> DataFrame:
    """1 row × 0 columns — the distinct ``ctx.read_empty()`` shape the
    reference documents at ``src/utils/helpers.rs:27-30``."""
    return spark.range(1).drop("id")


def get_random_df(spark: SparkSession, types: list[str], rows: int) -> DataFrame:
    """Random dataframe: columns named ``column_i`` of the requested types
    (S10; reference ``get_random_df``, ``src/utils/helpers.rs:69-127`` —
    int32 / float32 / utf8(len 1-50) / bool).

    Fully distributed: ``spark.range`` partitions the id space; every random
    column is a JVM-side expression (no Python UDF), so generation scales
    linearly with executors.
    """
    df = spark.range(rows)
    for i, t in enumerate(types):
        name = f"column_{i + 1}"
        if t in ("int", "int32"):
            col = (F.rand() * (2**31 - 1)).cast("int")
        elif t in ("float", "float32"):
            col = F.rand().cast("float")
        elif t in ("utf8", "string"):
            # random length 1..50, random alphanumeric chars (reference parity)
            length = (F.rand() * 49 + 1).cast("int")
            full = F.concat(*[
                F.substr(F.lit(_ALPHANUM), (F.rand() * 62 + 1).cast("int"), F.lit(1))
                for _ in range(50)
            ])
            col = F.substr(full, F.lit(1), length)
        elif t in ("bool", "boolean"):
            col = F.rand() > 0.5
        else:
            raise PlanError(f"get_random_df: unsupported type {t!r}")
        df = df.withColumn(name, col)
    return df.drop("id")


def build_calendar(spark, start: str, end: str):
    """Calendar dimension generator: one row per day in [start, end] with the
    derived attributes (year/month/quarter/ISO week/ISO weekday/weekend
    flag) every warehouse joins against. Fully distributed: the spine is a
    ``sequence()`` explode (no driver loop, no collect); at any span the
    frame is tiny next to fact tables and broadcasts into joins."""
    from pyspark.sql import functions as F

    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr("INTERVAL 1 DAY")
            )
        ).alias("d")
    )
    return spine.select(
        F.date_format("d", "yyyy-MM-dd").alias("iso"),
        F.year("d").cast("long").alias("y"),
        F.month("d").cast("long").alias("m"),
        (F.weekday("d") + 1).cast("long").alias("dow"),
        ((F.weekday("d") + 1) >= 6).alias("is_weekend"),
        F.weekofyear("d").cast("long").alias("woy"),
        F.quarter("d").cast("long").alias("q"),
    )
