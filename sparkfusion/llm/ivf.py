"""IVF (inverted-file) approximate nearest-neighbor search.

The second ANN scale path next to sign-bucket LSH (:mod:`.similarity`):
a coarse quantizer (seeded KMeans over a sample) partitions the corpus into
cells; a query probes only the ``nprobe`` nearest cells, scanning
``~nprobe/k`` of the data. This is the classic IVF-Flat layout: at 100 TB the
assigned corpus is written partitioned by ``cell`` so a probe is a partition-
pruned scan, and the centroid table (k rows) broadcasts. ``k`` is
caller-chosen and MUST grow with the corpus (the FAISS rule of thumb is
k ≈ √n, keeping per-probe scan cost √n instead of linear — the same
pinned-constant-goes-superlinear class the r12 sf1 sweep caught in
semdedup/cosine_pairs; the suite's small fixed k exists only for the
deterministic oracle).

KMeans is iterative → not SQL-expressible; the suite query is registered
rows-only (the driver's weaker check), while recall vs the exact scan is
asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_r9


def ivf_build(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Train the coarse quantizer and assign every vector to a cell.

    Returns ``(assigned, centroids)``: the corpus with a ``cell`` column, and
    the k centroid vectors as ``(cell, centroid array<double>)``. Seeded →
    deterministic. Training cost is one MLlib KMeans over the corpus (sample
    at real scale; the assignment pass is a broadcast-join-free transform).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    featurized = df.select(
        F.col(id_col),
        F.col(emb_col),
        array_to_vector(F.col(emb_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="cell").fit(
        featurized
    )
    assigned = model.transform(featurized).select(id_col, emb_col, "cell")
    spark = df.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    return assigned, centroids


def euclid_r9(a, b):
    """Euclidean distance of two float-array columns: sequential fold of
    squared diffs in double, sqrt, rounded to 9 decimals — the rounding
    absorbs ≤1-ulp summation-order differences vs DuckDB's ``list_distance``
    so argmin cell assignment is cross-engine identical."""
    diff2 = F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.round(F.sqrt(diff2), 9)


def ivf_seeded_topk(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-Flat top-k with a *deterministic* data-derived coarse quantizer:
    the centroids are the embeddings of the first ``n_cells`` ids (a
    degenerate but fully SQL-expressible KMeans init — both engines can name
    the exact same centroid rows, so assignment, probe selection, and ranking
    are cross-engine reproducible). :func:`ivf_build`'s seeded KMeans is the
    production quantizer (better-balanced cells); its recall and determinism
    are covered in tests/test_ivf.py. Same plan shape either way: broadcast
    centroids, argmin-assign (one map pass), probe = ``nprobe`` nearest cells
    by centroid cosine, rank only vectors in probed cells.

    At 100 TB the assigned corpus is written partitioned by ``cell`` so the
    probe is a partition-pruned scan; here the cell filter is a broadcast
    semi-join with the probed-cell frame (nprobe rows).
    """
    cents = df.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).cast("int").alias("cell"), F.col(emb_col).alias("c_emb")
    )
    pairs = (
        df.select(id_col, emb_col)
        .crossJoin(F.broadcast(cents))
        .withColumn("d", euclid_r9(F.col(emb_col), F.col("c_emb")))
    )
    assigned = (
        pairs.groupBy(id_col)
        .agg(
            F.min(F.struct("d", "cell")).alias("m"),
            F.first(emb_col).alias(emb_col),
        )
        .select(id_col, emb_col, F.col("m.cell").alias("cell"))
    )
    q = query_df.select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb"))
    probe = (
        cents.crossJoin(F.broadcast(q))
        .withColumn("c_cos", cosine_r9(F.col("c_emb"), F.col("q_emb")))
        .orderBy(F.col("c_cos").desc(), F.col("cell"))
        .limit(nprobe)
        .select("cell", "q_id", "q_emb")
    )
    scored = (
        assigned.join(F.broadcast(probe), "cell")
        .filter(F.col(id_col) != F.col("q_id"))
        .withColumn("cos", cosine_r9(F.col(emb_col), F.col("q_emb")))
        .select("q_id", F.col(id_col), "cos")
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col)).limit(k)


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe the ``nprobe`` cells whose centroids are nearest the query (by
    cosine), then rank only vectors in those cells. Recall < 1 by design —
    the IVF trade; raise ``nprobe`` to trade scan cost for recall."""
    q = query_df.select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb"))
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .withColumn("c_cos", cosine_r9(F.col("centroid"), F.col("q_emb")))
        .orderBy(F.col("c_cos").desc(), F.col("cell"))
        .limit(nprobe)
        .select("cell", "q_id", "q_emb")
    )
    candidates = assigned.join(F.broadcast(probe_cells), "cell").filter(
        F.col(id_col) != F.col("q_id")
    )
    scored = candidates.withColumn(
        "cos", cosine_r9(F.col(emb_col), F.col("q_emb"))
    ).select("q_id", F.col(id_col), "cos")
    return scored.orderBy(F.col("cos").desc(), F.col(id_col)).limit(k)
