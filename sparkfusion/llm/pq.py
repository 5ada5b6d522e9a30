"""Product-quantization (PQ) approximate nearest-neighbor search.

Completes the ANN ladder next to brute-force (:mod:`.similarity`), sign/RP
LSH, IVF (:mod:`.ivf`) and int8 scalar quantization: the D-dim embedding is
split into ``m`` subspaces, each subvector replaced by the id of its nearest
codeword from a per-subspace codebook of ``n_codes`` entries. A vector
compresses to ``m`` small codes (here m·1 bytes vs D·4 — 64× for D=64,m=4,
256 codes), and query-to-vector distance is approximated **asymmetrically**
(ADC, Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011): the query precomputes an ``m × n_codes`` table of exact
subspace distances to every codeword, and a vector's approximate distance is
the sum of ``m`` table lookups — no float math per corpus row at query time.

Scale shape (100 TB posture):
- Codebooks are ``m·n_codes`` rows — always broadcast; encoding is one scan
  (broadcast join + per-(id, subspace) argmin with a map-side-combinable
  min(struct) aggregate, shuffling only (id, j, d, code) slivers).
- The encoded corpus (id, m codes) is what production stores/scans — the
  distance-table join at query time is a broadcast equi-join on
  (subspace, code) followed by one groupBy(id) DECIMAL sum: one shuffle of
  the candidate sliver, never the raw vectors.
- Like :func:`..llm.ivf.ivf_seeded_topk`, the suite path derives codewords
  from the first ``n_codes`` vectors' subvectors (deterministic, fully
  SQL-expressible, so DuckDB names the same codebook); production would
  train per-subspace KMeans exactly as ``ivf_build`` does.

Determinism: every subspace distance is rounded to 9 dp (absorbs sub-ulp
summation-order variance vs DuckDB's ``list_distance``), argmin ties break on
code id, and the final ADC sum runs in DECIMAL(18,9) so addition order
cannot flip low bits — the approximate distance is bit-identical across
engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import euclid_r9
from ..errors import PlanError

__all__ = ["pq_subvectors", "pq_encode", "pq_adc_topk"]


def pq_subvectors(
    df: DataFrame, id_col: str, emb_col: str, m: int, dim: int
) -> DataFrame:
    """Explode each vector into ``m`` subvectors: ``(id, j, sub)`` with
    ``j ∈ [0, m)`` and ``sub`` the j-th contiguous ``dim/m`` slice."""
    if dim % m != 0:
        raise PlanError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    subs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.slice(F.col(emb_col), j * d + 1, d).alias("sub"))
            for j in range(m)
        ]
    )
    return df.select(F.col(id_col), F.explode(subs).alias("s")).select(
        id_col, F.col("s.j").alias("j"), F.col("s.sub").alias("sub")
    )


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Encode every vector to ``(id, j, code)`` rows — nearest codeword per
    subspace (rounded-euclid argmin, code-id tiebreak). ``codebook`` must be
    ``(code, j, csub)`` rows (``m × n_codes`` total — broadcast)."""
    subs = pq_subvectors(df, id_col, emb_col, m, dim)
    scored = subs.join(F.broadcast(codebook), "j").withColumn(
        "d", euclid_r9(F.col("sub"), F.col("csub"))
    )
    return (
        scored.groupBy(id_col, "j")
        .agg(F.min(F.struct("d", "code")).alias("best"))
        .select(id_col, "j", F.col("best.code").alias("code"))
    )


def seeded_codebook(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m: int = 4,
    dim: int = 64,
    n_codes: int = 8,
) -> DataFrame:
    """Deterministic data-derived codebook: codeword ``c`` of subspace ``j``
    is the j-th subvector of the vector with ``id = c`` (degenerate KMeans
    init both engines can name — see module docstring)."""
    cents = df.filter(F.col(id_col) < n_codes)
    return pq_subvectors(cents, id_col, emb_col, m, dim).select(
        F.col(id_col).cast("int").alias("code"), "j", F.col("sub").alias("csub")
    )


def pq_adc_topk(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m: int = 4,
    dim: int = 64,
    n_codes: int = 8,
    k: int = 10,
) -> DataFrame:
    """Top-k nearest (smallest approximate L2) to the single query vector via
    PQ + ADC with the seeded codebook. Returns ``(q_id, id, adist)`` —
    ``adist`` is the DECIMAL-exact sum of per-subspace codeword distances
    cast to double."""
    codebook = seeded_codebook(df, id_col, emb_col, m, dim, n_codes)
    codes = pq_encode(df, codebook, id_col, emb_col, m, dim)
    q = query_df.select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb"))
    q_subs = pq_subvectors(q, "q_id", "q_emb", m, dim)
    dtab = (
        q_subs.join(F.broadcast(codebook), "j")
        .withColumn("qd", euclid_r9(F.col("sub"), F.col("csub")).cast("decimal(18,9)"))
        .select("q_id", "j", "code", "qd")
    )
    scored = (
        codes.join(F.broadcast(dtab), ["j", "code"])
        .filter(F.col(id_col) != F.col("q_id"))
        .groupBy("q_id", id_col)
        .agg(F.sum("qd").cast("double").alias("adist"))
    )
    return scored.orderBy(F.col("adist").asc(), F.col(id_col).asc()).limit(k)
