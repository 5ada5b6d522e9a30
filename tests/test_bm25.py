"""BM25 retrieval: hand-computed fixture scores + structural properties."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkfusion.llm.text import bm25_scores

K1, B = 1.2, 0.75


def _bm25(tf: int, df: int, n: int, dl: int, avgdl: float) -> float:
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark joins data"),          # tf(spark)=2, dl=4
        (2, "data pipeline and more data here"),  # no query terms? 'data' is one
        (3, "quality filter"),                   # dl=2
        (4, "nothing relevant at all"),          # no hits
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_matches_hand_computation(corpus):
    out = {
        r["doc_id"]: (r["bm25"], r["n_terms"])
        for r in bm25_scores(corpus, ["spark", "data"], k1=K1, b=B).collect()
    }
    n, avgdl = 4, (4 + 6 + 2 + 4) / 4.0
    # df(spark)=1 (doc1), df(data)=2 (docs 1,2)
    want1 = _bm25(2, 1, n, 4, avgdl) + _bm25(1, 2, n, 4, avgdl)
    want2 = _bm25(2, 2, n, 6, avgdl)
    assert out[1][1] == 2 and out[2][1] == 1
    assert out[1][0] == pytest.approx(round(want1, 6), abs=1e-6)
    assert out[2][0] == pytest.approx(round(want2, 6), abs=1e-6)
    assert 4 not in out and 3 not in out  # non-matching docs absent


def test_bm25_case_insensitive(spark):
    df = spark.createDataFrame([(1, "Spark SPARK spark")], ["doc_id", "text"])
    out = bm25_scores(df, ["SPARK"]).collect()
    assert len(out) == 1 and out[0]["n_terms"] == 1


def test_bm25_requires_terms(corpus):
    with pytest.raises(ValueError):
        bm25_scores(corpus, [])


def test_bm25_tf_saturation(spark):
    """BM25's tf term saturates: doubling tf must gain less than double."""
    df = spark.createDataFrame(
        [(1, "term " * 2 + "pad pad"), (2, "term " * 4)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["term"]).collect()}
    assert out[2] > out[1]
    assert out[2] < 2 * out[1]


def test_bm25_suite_plan_one_scan_no_global_sort(spark, sf_dir):
    from sparkfusion.session import table

    docs = table(spark, sf_dir, "documents")
    plan = (
        bm25_scores(docs, ["vector", "stream"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # df/avgdl side-aggregates join back by broadcast, never shuffle-join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
