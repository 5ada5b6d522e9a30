"""Quantized Lloyd's k-means: the algorithmic invariants the oracle can't
express (monotone inertia across iteration counts, determinism, partition
invariance)."""

import pytest
from pyspark.sql import functions as F

from sparkfusion.operators.kmeans import kmeans_quantized, _trunc_div
from sparkfusion.session import table


def _inertia(spark, sf_dir, iterations):
    emb = table(spark, sf_dir, "embeddings")
    rows = kmeans_quantized(emb, k=8, iterations=iterations, scale=6).collect()
    return sum(r["inertia"] for r in rows), rows


def test_lloyds_inertia_monotone_nonincreasing(spark, sf_dir):
    """Each Lloyd's round can only lower (or keep) total inertia — the
    textbook convergence guarantee, which survives integer quantization up
    to the +-k*d rounding slack of the truncated centroid mean. We assert
    plain non-increase, which holds comfortably on this data."""
    i0, _ = _inertia(spark, sf_dir, 0)
    i1, _ = _inertia(spark, sf_dir, 1)
    i3, rows3 = _inertia(spark, sf_dir, 3)
    assert i0 >= i1 >= i3
    assert i0 > i3  # and it actually improved
    assert sum(r["n_points"] for r in rows3) == table(
        spark, sf_dir, "embeddings"
    ).count()


def test_kmeans_partitioning_invariant(spark, sf_dir):
    """Integer arithmetic makes the trajectory identical under any input
    partitioning — the property float k-means (MLlib) lacks."""
    emb = table(spark, sf_dir, "embeddings")
    a = {
        r["cid"]: (r["n_points"], r["inertia"], r["centroid_l1"])
        for r in kmeans_quantized(emb, k=4, iterations=2).collect()
    }
    b = {
        r["cid"]: (r["n_points"], r["inertia"], r["centroid_l1"])
        for r in kmeans_quantized(emb.repartition(17), k=4, iterations=2).collect()
    }
    assert a == b and len(a) == 4


@pytest.mark.parametrize(
    "s,n,want",
    [(7, 2, 3), (-7, 2, -3), (6, 3, 2), (-6, 3, -2), (0, 5, 0), (1, 7, 0), (-1, 7, 0)],
)
def test_trunc_div_matches_sql_semantics(s, n, want):
    """Truncation toward zero for either sign — what Spark `div` and
    DuckDB `//`-on-positives compute (Python // alone would floor)."""
    assert _trunc_div(s, n) == want


def test_empty_cluster_carries_previous_centroid(spark):
    """k=3 over 2 distinct points: one cluster never receives members and
    must keep its initial centroid instead of crashing or going NULL."""
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = kmeans_quantized(df, k=3, iterations=2, scale=6).collect()
    got = {r["cid"]: r["n_points"] for r in rows}
    # clusters 1 and 2 start at the same point; the lower cid wins both
    # members, cluster 2 is empty and is simply absent from the report
    assert got[0] == 1 and got[1] == 2 and 2 not in got


def test_numpy_argmin_path_matches_literal_expression(spark, sf_dir):
    """assign_quantized switches to the Arrow-batched numpy argmin above
    k=128 (the r12 200k-point probe: the k=782 literal plan took ~390s
    where the batch path is seconds). Both paths must produce the identical
    assignment — exact int64 distances, first-minimum == lower-cid
    tie-break — so the Lloyd's trajectory is path-invariant."""
    from sparkfusion.operators import kmeans as km
    from sparkfusion.session import table

    emb = table(spark, sf_dir, "embeddings").limit(400)
    pts = km.quantize_points(emb, "vec_id", "embedding", 6)
    cents = [list(r["xq"]) for r in pts.orderBy("vec_id").limit(150).collect()]
    assert len(cents) == 150  # > _LITERAL_ARGMIN_MAX_K -> numpy path

    via_numpy = {
        r["vec_id"]: (r["cid"], r["dist"])
        for r in km.assign_quantized(pts, cents).collect()
    }
    lit = pts.withColumn("__m", km._argmin_struct(cents))
    via_literal = {
        r["vec_id"]: (r["__m"]["cid"], r["__m"]["d"]) for r in lit.collect()
    }
    assert via_numpy == via_literal

    # duplicate centroids: equidistant ties must resolve to the LOWER cid
    # on the numpy path too (np.argmin first-occurrence semantics)
    dup = [cents[0]] * 130
    got = {r["vec_id"]: r["cid"] for r in km.assign_quantized(pts, dup).collect()}
    assert set(got.values()) == {0}


def test_sub_cluster_cells_deterministic_and_partition_invariant(spark, sf_dir):
    """The fine level of two-level clustering must be a pure function of the
    cell contents: same (vec_id, xq, cell) rows -> same (cell, sub) labels
    regardless of input partitioning, and sub ids stay inside [0, k2)."""
    from sparkfusion.operators import kmeans as km
    from sparkfusion.session import table

    emb = table(spark, sf_dir, "embeddings").limit(300)
    pts = km.quantize_points(emb, "vec_id", "embedding", 6)
    cents = km.lloyd_centroids(pts, 5, 1)
    coarse = km.assign_quantized(pts, cents).select(
        "vec_id", "xq", F.col("cid").alias("cell")
    )
    k2 = 7
    a = {
        (r["vec_id"]): (r["cell"], r["sub"])
        for r in km.sub_cluster_cells(coarse, k2, 2).collect()
    }
    b = {
        (r["vec_id"]): (r["cell"], r["sub"])
        for r in km.sub_cluster_cells(coarse.repartition(11), k2, 2).collect()
    }
    assert a == b
    assert len(a) == 300
    assert all(0 <= sub < k2 for _, sub in a.values())
    # identical points always land in the same (cell, sub): pick a cell and
    # check each point's sub equals the argmin against its cell's final
    # centroids implicitly via duplicate embeddings below


def test_sub_cluster_cells_duplicates_share_sub(spark):
    """Bit-identical embeddings can never split across sub-clusters."""
    from sparkfusion.operators import kmeans as km

    rows = [(i, [float(i % 3), float((i * 2) % 3)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pts = km.quantize_points(df, "vec_id", "embedding", 6)
    coarse = pts.withColumn("cell", (F.col("vec_id") % 2).cast("int"))
    out = km.sub_cluster_cells(coarse, 4, 2).collect()
    label = {}
    for r in out:
        key = (r["cell"], r["vec_id"] % 3)  # same residue -> same embedding
        label.setdefault(key, r["sub"])
        assert label[key] == r["sub"]


def test_quantization_envelope_bounds():
    """The static envelope check must accept the documented-safe regimes
    (unit-norm embeddings at scale 6 up to d=4096) and reject combinations
    whose worst int64 intermediate 4·d·Q² crosses 2^63 (r13 verdict #2 —
    the d=768 production-dimension posture)."""
    import pytest as _pytest

    from sparkfusion.errors import PlanError
    from sparkfusion.operators.kmeans import (
        _safe_scale,
        check_quantization_envelope,
    )

    for d in (64, 768, 4096):
        check_quantization_envelope(d, 6, 1.0)  # unit-norm: always safe
    # d=768 at scale 6 tolerates |x| up to ~54 but not 100
    check_quantization_envelope(768, 6, 50.0)
    with _pytest.raises(PlanError, match="envelope"):
        check_quantization_envelope(768, 6, 100.0)
    # scale 9 at production dims with unnormalized features overflows
    with _pytest.raises(PlanError, match="envelope"):
        check_quantization_envelope(768, 9, 10.0)
    # _safe_scale is consistent with the check: safe passes, +1 fails.
    # The last two tuples force NEGATIVE safe scales — int() truncation
    # rounded those toward zero (UP), returning a scale that failed its own
    # check; floor() is required (r15 advice)
    for d, m in ((64, 1.0), (768, 1.0), (768, 50.0), (4096, 10.0),
                 (768, 1e9), (64, 1e12)):
        s = _safe_scale(d, m)
        check_quantization_envelope(d, s, m)
        with _pytest.raises(PlanError):
            check_quantization_envelope(d, s + 1, m)
    assert _safe_scale(768, 1e9) < 0  # the truncation-trap regime is covered


def test_runtime_int64_guard_fires(spark):
    """The per-batch runtime guard inside the numpy argmin kernel must turn
    would-be int64 wraparound into a named error instead of silently wrong
    assignments."""
    import pytest as _pytest

    from sparkfusion.llm.similarity import semdedup

    # |x| = 1e3 at scale 9 → Q = 1e12, 4·d·Q² = 8e24 >> 2^63
    df = spark.createDataFrame(
        [(i, [1000.0 + i, -1000.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="int64 distance overflow"):
        semdedup(df, k=20, iterations=1, scale=9, two_level=True).collect()


def test_exact_dot_int_blas_path_is_bitexact_and_falls_back():
    """The float64-BLAS dot fast path must be bit-identical to the int64
    matmul inside its proven envelope (d·Qx·Qc < 2^53: every product and
    partial sum is an exactly-representable integer), and must FALL BACK to
    int64 past it — values near the envelope edge are the adversarial case."""
    import numpy as np

    from sparkfusion.operators.kmeans import _exact_dot_int

    rng = np.random.default_rng(7)
    # inside the envelope: unit-norm scale-6 magnitudes at production dims
    X = rng.integers(-(10**6), 10**6, size=(500, 768), dtype=np.int64)
    C = rng.integers(-(10**6), 10**6, size=(64, 768), dtype=np.int64)
    assert 768 * 10**6 * 10**6 < 2**53  # the envelope this case exercises
    assert (_exact_dot_int(X, C) == X @ C.T).all()
    # past the 2^53 envelope (but int64-safe): must still be exact — i.e.
    # the implementation must NOT have taken the lossy float64 path
    q = 3 * 10**7
    Xb = rng.integers(q - 100, q, size=(40, 768), dtype=np.int64)
    Cb = rng.integers(q - 100, q, size=(8, 768), dtype=np.int64)
    assert 768 * q * q >= 2**53
    want = Xb @ Cb.T
    got = _exact_dot_int(Xb, Cb)
    assert (got == want).all()
    # and the float64 route would actually have been lossy here (sanity
    # that the boundary test is adversarial, not vacuous)
    lossy = (Xb.astype(np.float64) @ Cb.astype(np.float64).T).astype(np.int64)
    assert (lossy != want).any()
