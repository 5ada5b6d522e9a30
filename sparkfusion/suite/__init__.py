"""Query-suite registry.

Every implemented operator from SURVEY.md §2 registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
``__spark_entry__.py`` re-exports this registry as the driver contract.

Determinism contract (SURVEY.md §7 risks): every registered query must be
row-set deterministic, and numerically exact — money aggregates go through
DECIMAL so Spark's parallel sum order cannot flip low-order float bits vs the
oracle's sequential sum. Columns are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the suite registry."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import all suite modules (each registers its queries on import)."""
    global _LOADED
    if _LOADED:
        return
    # unconditional imports: a broken suite module must fail loudly, not
    # silently drop its queries from the driver contract
    from . import (  # noqa: F401
        llm_suite,
        relational,
        relational_ext,
        schema_ops,
        sources_suite,
        streaming_suite,
        temporal_suite,
        tpch_like,
        udaf_suite,
        udfs,
    )

    _LOADED = True
