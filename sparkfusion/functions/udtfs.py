"""Python user-defined TABLE functions (Spark 4 extension point).

The reference registers scalar UDFs with its session (SURVEY.md §2.8 X1-X4,
``src/utils/udfs.rs``); Spark 4 additionally exposes UDTFs — functions that
return a RELATION and compose with ``LATERAL`` joins in SQL
(``pyspark.sql.functions.udtf``). This module ships the table-valued
counterpart of the X1 split UDF: a word tokenizer that emits one row per
token with its 1-based position, preserving the RAW split index so the
output is a pure function of the input string and reproducible in any
engine (``string_split`` + ``generate_subscripts`` in DuckDB).

Scale notes: a UDTF evaluates per input row on the executor (Python worker,
Arrow-batched transfer like any pandas UDF path) — the expansion happens
distributed, never on the driver. The hot-path alternative remains the
builtin ``split`` + ``posexplode`` (pure JVM); the UDTF exists for logic a
builtin composition cannot express (stateful per-row expansion, external
lookups) and this demo keeps its contract builtin-mirrorable so it can be
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, word string")
class SplitWords:
    """One row per space-separated token: (1-based raw split position,
    token). Empty tokens (from doubled spaces) are skipped but their
    positions are NOT reassigned — ``pos`` stays the raw split index, so
    the result matches ``generate_subscripts(string_split(s, ' '), 1)``
    filtered to non-empty in any engine."""

    def eval(self, text: str):
        if text is None:
            return
        for i, w in enumerate(text.split(" "), 1):
            if w != "":
                yield (i, w)


def register_udtfs(spark) -> None:
    """Idempotent session registration (``spark.udtf.register``) so SQL can
    use ``LATERAL split_words(col)``."""
    spark.udtf.register("split_words", SplitWords)
