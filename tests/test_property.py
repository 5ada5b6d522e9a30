"""Property-based tests (hypothesis) — a rigor layer the reference lacks
(SURVEY.md §5: 'no property-based tests'). Example counts are kept small:
each example is a Spark job.
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from sparkfusion.operators import add_pk_to_df, df_cols_to_json
from sparkfusion.llm.similarity import cosine_r9
from pyspark.sql import functions as F

SETTINGS = dict(max_examples=8, deadline=None)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.one_of(st.none(), st.text(alphabet=st.characters(codec="ascii", exclude_characters='\x00'), max_size=20)),
    ),
    min_size=1,
    max_size=8,
)


@settings(**SETTINGS)
@given(rows=rows_strategy)
def test_cols_to_json_always_valid_json(spark, rows):
    df = spark.createDataFrame(rows, "id int, name string")
    out = df_cols_to_json(df, ["id", "name"], "packed").collect()
    assert len(out) == len(rows)
    for r in out:
        obj = json.loads(r.packed)  # parses
        assert "name" not in obj or obj["name"] is not None  # nulls omitted
        assert set(obj) <= {"id", "name"}


@settings(**SETTINGS)
@given(n=st.integers(min_value=1, max_value=50))
def test_add_pk_contiguous_any_size(spark, n):
    df = spark.range(n).withColumnRenamed("id", "v")
    out = add_pk_to_df(df, "pk", order_by=["v"]).collect()
    assert sorted(r.pk for r in out) == list(range(n))


@settings(**SETTINGS)
@given(
    vec=st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    ).filter(lambda v: sum(x * x for x in v) > 1e-6)
)
def test_cosine_self_similarity_is_one(spark, vec):
    df = spark.createDataFrame([(vec,)], "e array<float>")
    out = df.select(cosine_r9(F.col("e"), F.col("e")).alias("c")).collect()
    assert abs(out[0].c - 1.0) < 1e-9
