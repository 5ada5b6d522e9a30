"""Shared helper: capture a DataFrame's formatted physical plan as a string
(used by dump_plans.py and explain_query.py — one place to absorb any
PySpark-internal rename)."""

from __future__ import annotations


def plan_string(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)
