"""User-defined aggregates & table functions — the §2.10 'not present'
extensions (the reference uses only engine-provided UDAF handles and has no
UDTF; SURVEY.md notes pandas GROUPED_AGG and Python UDTF as the Spark
equivalents when extended).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def weighted_mean(values: pd.Series, weights: pd.Series) -> float:  # type: ignore[misc]
    """GROUPED_AGG pandas UDAF: Σ(v·w)/Σ(w). Arrow-batched per group —
    usable in ``groupBy().agg()`` and as a window function."""
    total_w = float(weights.sum())
    if total_w == 0:
        return float("nan")
    return float((values * weights).sum() / total_w)


def register_udtf(spark) -> None:
    """Register ``split_to_rows`` — a Python UDTF (Spark 3.5+) exploding a
    delimited string into rows: the table-function shape the reference lacks.

    SQL: ``SELECT s.* FROM t, LATERAL split_to_rows(t.text, ' ') s``
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitToRows:
        def eval(self, text: str, sep: str = " "):
            if text is None:
                return
            for pos, token in enumerate(text.split(sep)):
                if token:
                    yield pos, token

    spark.udtf.register("split_to_rows", SplitToRows)
    return SplitToRows
