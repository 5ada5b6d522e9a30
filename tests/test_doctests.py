"""Doctests-as-specs (reference test layer 3, SURVEY.md §5.3 — e.g. the
runnable examples at ``src/utils/dataframe.rs:24-66``): helper docstrings
carry executable examples, run here against the shared test session.

``doctest.testmod`` uses each module's own globals plus ``spark`` injected
via ``extraglobs`` so examples read exactly like user code.
"""

from __future__ import annotations

import doctest

import sparkfusion.interchange
import sparkfusion.operators.projection
import sparkfusion.operators.schema

MODULES = [
    sparkfusion.interchange,
    sparkfusion.operators.projection,
    sparkfusion.operators.schema,
]


def test_helper_doctests(spark):
    from pyspark.sql import Row  # noqa: F401 — examples print Row reprs

    attempted = 0
    for mod in MODULES:
        res = doctest.testmod(
            mod,
            extraglobs={"spark": spark, "Row": Row},
            optionflags=doctest.NORMALIZE_WHITESPACE,
            verbose=False,
        )
        assert res.failed == 0, f"{mod.__name__}: {res.failed} doctest failures"
        attempted += res.attempted
    # the suite must actually exercise examples — a silent zero would mean
    # the docstrings lost their examples (or testmod found nothing)
    assert attempted >= 15, f"only {attempted} doctest examples ran"
