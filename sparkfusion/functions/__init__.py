"""Scalar-function & UDF surface (SURVEY.md §2.8, §2.10)."""

from .udfs import (
    make_split_text_pandas_udf,
    register_split_text,
    split_row_builtin,
    split_row_pandas_udf,
    split_text_builtin,
)

__all__ = [
    "split_text_builtin",
    "make_split_text_pandas_udf",
    "register_split_text",
    "split_row_builtin",
    "split_row_pandas_udf",
]
