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


@settings(**SETTINGS)
@given(
    b1=st.lists(st.tuples(st.sampled_from("abc"), st.integers(-1000, 1000)), min_size=0, max_size=8),
    b2=st.lists(st.tuples(st.sampled_from("abc"), st.integers(-1000, 1000)), min_size=0, max_size=8),
)
def test_incremental_merge_equals_scratch_property(spark, b1, b2):
    """merge(state(b1), state(b2)) == state(b1 + b2) for ANY batch split."""
    from sparkfusion.operators.incremental import aggregate_state, merge_states

    if not b1 and not b2:
        return
    aggs = lambda: {
        "total": ("sum", F.col("v").cast("decimal(18,6)")),
        "n": ("count", F.col("v")),
        "lo": ("min", F.col("v")),
        "hi": ("max", F.col("v")),
    }
    mk = lambda rows: spark.createDataFrame(rows, "k string, v long")
    key = lambda df: {
        r["k"]: (float(r["total"]), r["n"], r["lo"], r["hi"]) for r in df.collect()
    }
    scratch = key(aggregate_state(mk(b1 + b2), ["k"], aggs()))
    if not b1 or not b2:
        merged = key(aggregate_state(mk(b1 or b2), ["k"], aggs()))
    else:
        merged = key(
            merge_states(
                aggregate_state(mk(b1), ["k"], aggs()),
                aggregate_state(mk(b2), ["k"], aggs()),
                ["k"],
                aggs(),
            )
        )
    assert merged == scratch


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 5), st.integers(0, 3)),
        min_size=1,
        max_size=10,
    )
)
def test_keep_latest_is_idempotent_and_singleton_per_key(spark, rows):
    from sparkfusion.operators.quality import keep_latest

    df = spark.createDataFrame(
        [(k, t, i, n) for n, (k, t, i) in enumerate(rows)], "k string, t int, i int, n int"
    )
    once = keep_latest(df, ["k"], ["t", "i", "n"])
    got = once.collect()
    # exactly one row per key present in the input
    assert sorted({r["k"] for r in got}) == sorted({k for k, _, _ in rows})
    assert len(got) == len({k for k, _, _ in rows})
    # idempotent: compacting a compacted log is a no-op
    twice = keep_latest(once, ["k"], ["t", "i", "n"])
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, got))


@settings(**SETTINGS)
@given(
    lefts=st.lists(st.tuples(st.integers(0, 500), st.integers(0, 300)), min_size=1, max_size=10),
    rights=st.lists(st.tuples(st.integers(0, 500), st.integers(0, 300)), min_size=1, max_size=10),
    width=st.sampled_from([7, 50, 1000]),
)
def test_interval_overlap_equals_brute_force(spark, lefts, rights, width):
    """Bucketed interval-overlap join == cross-join + filter, for ANY bucket
    width (canonical-bucket dedup must emit each pair exactly once)."""
    from sparkfusion.operators.temporal import interval_overlap_join

    L = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(lefts)], "l_id int, ls long, le long"
    )
    R = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(rights)], "r_id int, rs long, re long"
    )
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(L, R, "ls", "le", "rs", "re", width).collect()
    )
    want = sorted(
        (i, j)
        for i, (s1, d1) in enumerate(lefts)
        for j, (s2, d2) in enumerate(rights)
        if s1 <= s2 + d2 and s2 <= s1 + d1
    )
    assert got == want


@settings(**SETTINGS)
@given(
    old=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3)), min_size=0, max_size=8, unique_by=lambda t: t[0]),
    new=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3)), min_size=0, max_size=8, unique_by=lambda t: t[0]),
)
def test_snapshot_diff_roundtrip_property(spark, old, new):
    """merge(old, diff(old, new)) == new for ANY pair of keyed versions."""
    from sparkfusion.operators.merge import merge_upsert, snapshot_diff

    if not old and not new:
        return
    o = spark.createDataFrame(old or [(99, 0)], "k int, v int")
    n = spark.createDataFrame(new or [(98, 0)], "k int, v int")
    if not old:
        o = o.filter("k < 0")
    if not new:
        n = n.filter("k < 0")
    diff = snapshot_diff(o, n, ["k"], ["v"])
    rebuilt = merge_upsert(o, diff, keys=["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, n.collect()))
