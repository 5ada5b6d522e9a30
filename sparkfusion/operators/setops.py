"""Set operations (SURVEY.md §2.7).

Reference exercises union-all only (``concat_dfs``,
``src/utils/dataframe.rs:290-308`` — collects every input and re-reads them as
one MemTable, duplicates preserved). Here it is a lazy ``UNION ALL`` plan
node; Spark also gives ``intersect`` / ``exceptAll`` / ``distinct`` for free,
which we expose as thin aliases for surface completeness.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from ..errors import PlanError


def concat_dfs(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union-all N DataFrames by column name, duplicates preserved.

    Reference: ``concat_dfs`` (``src/utils/dataframe.rs:290-308``; 25+25→50
    duplicate-preservation test at ``tests/api/dataframe_tests.rs:202-275``).
    ``unionByName`` is used (not positional ``union``) to match the
    reference's schema-by-name batch concat.
    """
    if not dfs:
        raise PlanError("concat_dfs: need at least one DataFrame")
    return reduce(DataFrame.unionByName, dfs)
