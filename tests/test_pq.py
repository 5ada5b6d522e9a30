"""PQ ANN: encoding shape, ADC math vs numpy brute force, recall sanity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfusion.llm.pq import pq_adc_topk, pq_encode, pq_subvectors, seeded_codebook
from sparkfusion.session import table

M, DIM, NC = 4, 64, 8


def test_subvectors_shape(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    subs = pq_subvectors(emb, "vec_id", "embedding", M, DIM)
    assert subs.count() == n * M
    one = subs.filter((F.col("vec_id") == 0)).collect()
    assert sorted(r["j"] for r in one) == list(range(M))
    assert all(len(r["sub"]) == DIM // M for r in one)


def test_subvectors_rejects_bad_split():
    with pytest.raises(ValueError):
        pq_subvectors(None, "id", "emb", 5, 64)


def test_encode_one_code_per_subspace(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    cb = seeded_codebook(emb, m=M, dim=DIM, n_codes=NC)
    assert cb.count() == M * NC
    codes = pq_encode(emb, cb, m=M, dim=DIM)
    n = emb.count()
    assert codes.count() == n * M
    assert codes.groupBy("vec_id").count().filter(F.col("count") != M).count() == 0
    rng = codes.agg(F.min("code"), F.max("code")).first()
    assert rng[0] >= 0 and rng[1] < NC
    # a codebook vector encodes to itself in every subspace (distance 0)
    self_codes = codes.filter(F.col("vec_id") == 3).collect()
    assert all(r["code"] == 3 for r in self_codes)


def test_adc_matches_numpy(spark, sf_dir):
    """Spark's ADC distances equal a straight numpy reimplementation."""
    emb = table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    d = DIM // M
    cb = {
        (c, j): vecs[c][j * d : (j + 1) * d] for c in range(NC) for j in range(M)
    }

    def enc(v):
        out = []
        for j in range(M):
            sub = v[j * d : (j + 1) * d]
            dists = [
                (round(float(np.sqrt(((sub - cb[(c, j)]) ** 2).sum())), 9), c)
                for c in range(NC)
            ]
            out.append(min(dists)[1])
        return out

    q = vecs[0]
    dtab = {
        (j, c): round(float(np.sqrt(((q[j * d : (j + 1) * d] - cb[(c, j)]) ** 2).sum())), 9)
        for j in range(M)
        for c in range(NC)
    }
    want = {}
    for vid, v in vecs.items():
        if vid == 0:
            continue
        want[vid] = round(sum(dtab[(j, c)] for j, c in enumerate(enc(v))), 9)
    top = sorted(want.items(), key=lambda kv: (kv[1], kv[0]))[:10]

    got = pq_adc_topk(
        emb, emb.filter(F.col("vec_id") == 0), m=M, dim=DIM, n_codes=NC, k=10
    ).collect()
    assert [(r["vec_id"], round(r["adist"], 9)) for r in got] == [
        (vid, pytest.approx(ad, abs=1e-9)) for vid, ad in top
    ]


def test_pq_recall_overlaps_exact(spark, sf_dir):
    """PQ with a tiny 8-codeword codebook is coarse, but its top-10 must
    still overlap the exact top-10 (same corpus, query vec 0)."""
    from sparkfusion.llm.similarity import brute_force_topk

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    approx = {r["vec_id"] for r in pq_adc_topk(emb, q, m=M, dim=DIM, n_codes=NC, k=10).collect()}
    assert len(exact & approx) >= 1


def test_ivfpq_matches_numpy_reference(spark, sf_dir):
    """The full IVF-PQ pipeline (assign → residual → encode → probe → ADC)
    equals a straight numpy reimplementation of the same deterministic
    construction — assignment, codebook, probe set, codes and distances."""
    from sparkfusion.llm.pq import ivfpq_adc_topk

    emb = table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    n_cells, nprobe, k = 8, 2, 10
    d = DIM // M
    cents = {c: vecs[c] for c in range(n_cells)}

    def assign(v):
        dists = sorted(
            (round(float(np.sqrt(((v - cv) ** 2).sum())), 9), c)
            for c, cv in cents.items()
        )
        return dists[0][1]

    resid = {i: v - cents[assign(v)] for i, v in vecs.items()}
    cb = {
        (c, j): resid[n_cells + c][j * d : (j + 1) * d]
        for c in range(NC)
        for j in range(M)
    }

    def enc(r):
        return [
            min(
                (round(float(np.sqrt(((r[j * d : (j + 1) * d] - cb[(c, j)]) ** 2).sum())), 9), c)
                for c in range(NC)
            )[1]
            for j in range(M)
        ]

    q = vecs[0]
    qn = float(np.sqrt((q * q).sum()))

    def cos(v):
        return round(float((v @ q) / (np.sqrt((v * v).sum()) * qn)), 9)

    probed = [
        c for _, c in sorted(((-cos(cv), c) for c, cv in cents.items()))[:nprobe]
    ]
    expected = []
    for i, v in vecs.items():
        cell = assign(v)
        if i == 0 or cell not in probed:
            continue
        qr = q - cents[cell]
        codes = enc(resid[i])
        adist = sum(
            round(
                float(
                    np.sqrt(
                        ((qr[j * d : (j + 1) * d] - cb[(codes[j], j)]) ** 2).sum()
                    )
                ),
                9,
            )
            for j in range(M)
        )
        expected.append((round(adist, 9), i))
    expected.sort()
    want = [(i, a) for a, i in expected[:k]]

    got = ivfpq_adc_topk(
        emb, emb.filter(F.col("vec_id") == 0), n_cells=n_cells, nprobe=nprobe,
        m=M, dim=DIM, n_codes=NC, k=k,
    ).collect()
    assert [(r["vec_id"], round(r["adist"], 9)) for r in got] == want


def test_ivfpq_residual_beats_raw_pq_recall(spark, sf_dir):
    """Residual encoding must buy recall@k against ground-truth L2 neighbors
    vs the same-budget raw-vector PQ — the whole point of the IVF-PQ
    composition. Compared on the probed cells' candidate set so the coarse
    filter is common to both."""
    from sparkfusion.llm.pq import ivfpq_adc_topk

    emb = table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    truth = sorted(
        (float(np.sqrt(((v - q) ** 2).sum())), i) for i, v in vecs.items() if i != 0
    )
    top_true = {i for _, i in truth[:20]}
    got = ivfpq_adc_topk(
        emb, emb.filter(F.col("vec_id") == 0), n_cells=8, nprobe=4, m=M,
        dim=DIM, n_codes=NC, k=20,
    ).collect()
    recall = len({r["vec_id"] for r in got} & top_true) / 20
    assert recall >= 0.3, f"ivfpq recall@20 {recall}"


def test_literal_encoder_matches_distributed_assignment(spark, sf_dir):
    """The streaming-safe literal encoder (bounded-driver params, in-row
    argmin) must produce the same cell for every vector as the distributed
    broadcast-join assignment inside ivfpq_adc_topk, and codes must be
    self-consistent: every codebook-source vector encodes its own residual
    to its own code."""
    from sparkfusion.llm.pq import derive_ivfpq_params, ivfpq_encode_literal
    from sparkfusion.llm.ivf import euclid_r9

    emb = table(spark, sf_dir, "embeddings")
    cents, cb = derive_ivfpq_params(emb)
    out = ivfpq_encode_literal(emb, cents, cb).collect()
    assert len(out) == emb.count()
    got = {r["vec_id"]: r for r in out}
    # centroid vectors assign to their own cell with zero distance
    for c in range(8):
        assert got[c]["cell"] == c
    # codebook-source vectors (ids 8..15) encode to their own code
    for c in range(8):
        r = got[8 + c]
        assert (r["code0"], r["code1"], r["code2"], r["code3"]) == (c, c, c, c)
    # cross-check cells against the distributed argmin
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cell int, cvec array<double>"
    )
    dist = (
        v.crossJoin(F.broadcast(cents_df))
        .withColumn("d", euclid_r9(F.col("v"), F.col("cvec")))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d", "cell")).alias("b"))
        .select("vec_id", F.col("b.cell").alias("cell"))
    )
    for r in dist.collect():
        assert got[r["vec_id"]]["cell"] == r["cell"], r["vec_id"]


def test_batch_encoder_matches_literal(spark, sf_dir):
    """ivfpq_encode_batch is the production (numpy mapInPandas) twin of the
    literal expression encoder: identical (id, cell, code*) output on the
    canonical embeddings table — the sequential-fold parity argument in its
    docstring, pinned here row-for-row."""
    from sparkfusion.llm.pq import (
        derive_ivfpq_params,
        ivfpq_encode_batch,
        ivfpq_encode_literal,
    )

    emb = table(spark, sf_dir, "embeddings")
    cents, cb = derive_ivfpq_params(emb)
    lit = {r["vec_id"]: r for r in ivfpq_encode_literal(emb, cents, cb).collect()}
    bat = ivfpq_encode_batch(emb, cents, cb).collect()
    assert len(bat) == len(lit) > 0
    for r in bat:
        assert tuple(r) == tuple(lit[r["vec_id"]]), r["vec_id"]


def test_batch_encoder_guards(spark, sf_dir):
    from sparkfusion.errors import PlanError
    from sparkfusion.llm.pq import derive_ivfpq_params, ivfpq_encode_batch

    emb = table(spark, sf_dir, "embeddings")
    cents, cb = derive_ivfpq_params(emb)
    with pytest.raises(PlanError, match="!= centroid dim"):
        ivfpq_encode_batch(emb, [c[: DIM // 2] for c in cents], cb)
    bad = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: F.lit(float("nan"))).alias(
            "embedding"
        ),
    )
    with pytest.raises(Exception, match="non-finite"):
        ivfpq_encode_batch(bad, cents, cb).collect()


def test_encode_row_block_budget():
    """The batched-encode row block must keep block·max(n_cells, n_codes,
    dim) within the 2^24-double accumulator budget for EVERY index size —
    the old fixed floor of 64 overshot 4× at n_cells=2^20 (r15 advice)."""
    from sparkfusion.llm.pq import _encode_row_block

    for n_cells, n_codes, dim in (
        (8, 8, 64), (256, 256, 768), (1 << 20, 256, 768), (1 << 26, 256, 768),
    ):
        blk = _encode_row_block(n_cells, n_codes, dim)
        assert blk >= 1
        assert blk * max(n_cells, n_codes, dim) <= (1 << 24) or blk == 1
    # small indexes still get large blocks (vectorization intact)
    assert _encode_row_block(8, 8, 64) >= 1 << 18


def test_store_adc_topk_bit_parity_with_inplan(spark, sf_dir, tmp_path):
    """The pruned-store numpy ADC kernel must return the BIT-IDENTICAL
    (q_id, vec_id, adist) top-10 as the in-plan ivfpq_adc_topk composite:
    the int64 table keys are the DECIMAL(18,9) numerators the in-plan path
    sums, and total/1e9 in float64 reproduces the DECIMAL→double cast
    (r14 verdict #1)."""
    from sparkfusion.llm.pq import (
        derive_ivfpq_params,
        ivfpq_adc_topk,
        ivfpq_encode_batch,
        ivfpq_store_adc_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    inplan = ivfpq_adc_topk(
        emb, q, "vec_id", "embedding",
        n_cells=8, nprobe=2, m=M, dim=DIM, n_codes=NC, k=10,
    ).collect()

    cents, cb = derive_ivfpq_params(emb)
    path = str(tmp_path / "codes")
    ivfpq_encode_batch(emb, cents, cb).write.partitionBy("cell").parquet(path)
    stored = spark.read.parquet(path).select(
        "vec_id", F.col("cell").cast("int").alias("cell"),
        *[f"code{j}" for j in range(M)],
    )
    qv = [float(x) for x in q.select("embedding").first()[0]]
    store = ivfpq_store_adc_topk(
        stored, qv, cents, cb, q_id=0, nprobe=2, k=10
    ).collect()

    assert [tuple(r) for r in store] == [tuple(r) for r in inplan]
    # adist is bit-identical, not just close
    assert [r["adist"] for r in store] == [r["adist"] for r in inplan]


def test_adc_table_keys_match_decimal_path(spark, sf_dir):
    """ivfpq_adc_table's int64 keys equal the engine-side DECIMAL(18,9)
    numerators: rebuild the in-plan dtab for the probed cells and compare
    every (cell, j, code) entry."""
    from decimal import Decimal

    from sparkfusion.llm.pq import derive_ivfpq_params, ivfpq_adc_table

    emb = table(spark, sf_dir, "embeddings")
    cents, cb = derive_ivfpq_params(emb)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    tabs = ivfpq_adc_table(qv, cents, cb, nprobe=2)

    from sparkfusion.llm.ivf import euclid_r9

    for cell, tab in tabs.items():
        qr = [a - b for a, b in zip(qv, cents[cell])]
        d = DIM // M
        rows = []
        for j in range(M):
            for code in range(NC):
                rows.append((j, code, qr[j * d:(j + 1) * d], cb[j][code]))
        rdf = spark.createDataFrame(
            rows, "j int, code int, qsub array<double>, csub array<double>"
        ).select(
            "j", "code",
            euclid_r9(F.col("qsub"), F.col("csub"))
            .cast("decimal(18,9)").alias("qd"),
        )
        for r in rdf.collect():
            assert int(r["qd"].scaleb(9)) == int(tab[r["j"], r["code"]]), (
                cell, r["j"], r["code"]
            )


def test_gram_encode_matches_exact_fold(spark, sf_dir):
    """exact=False (BLAS3 gram expansion) must produce the same codes as
    the bit-parity fold on the canonical frames — the error envelope
    (~3·d·eps·B², four orders below the round-9 half-quantum at unit
    scale) predicts zero mismatches outside measure-zero boundary
    straddles; this pins the prediction empirically."""
    from sparkfusion.llm.pq import derive_ivfpq_params, ivfpq_encode_batch

    emb = table(spark, sf_dir, "embeddings")
    cents, cb = derive_ivfpq_params(emb)
    exact = {r["vec_id"]: tuple(r) for r in ivfpq_encode_batch(emb, cents, cb).collect()}
    gram = ivfpq_encode_batch(emb, cents, cb, exact=False).collect()
    assert len(gram) == len(exact)
    for r in gram:
        assert tuple(r) == exact[r["vec_id"]], r["vec_id"]
