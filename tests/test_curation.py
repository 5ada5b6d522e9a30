"""Curation-suite invariants the oracle can't express: SemDeDup keeper-rule
soundness, BPE encode arithmetic, batch-packing bounds, OOV construction,
bootstrap CI ordering, DSIR target alignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkfusion.llm.similarity import cosine_r9, semdedup
from sparkfusion.llm.text import bpe_encode_counts, bpe_train_merges
from sparkfusion.session import table
from sparkfusion.suite.curation_suite import (
    _PACK_BATCH,
    _PACK_BUCKET,
    _SEMDEDUP_THRESHOLD,
    boot1_bootstrap_ci,
    dsir1_importance_select,
    pack2_length_buckets,
    tok1_oov_rate,
)


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def test_semdedup_dropped_points_have_lowerid_neighbor(spark, sf_dir):
    """Soundness of the min-id keeper rule: every dropped point must have a
    LOWER-id member of the same cluster with cosine >= threshold (recomputed
    exactly here), and every cluster must keep at least its min-id member."""
    emb = table(spark, sf_dir, "embeddings")
    res = semdedup(emb, k=4, iterations=1, threshold=_SEMDEDUP_THRESHOLD)
    rows = res.collect()
    assert len(rows) == emb.count()

    dropped = res.filter(~F.col("keep")).select("vec_id", "cid")
    e = emb.select(F.col("vec_id").alias("v"), F.col("embedding").alias("emb"))
    mates = (
        dropped.join(
            res.select(F.col("vec_id").alias("other"), "cid"), "cid"
        )
        .filter(F.col("other") < F.col("vec_id"))
        .join(e.withColumnRenamed("v", "vec_id").withColumnRenamed("emb", "ea"), "vec_id")
        .join(e.withColumnRenamed("v", "other").withColumnRenamed("emb", "eb"), "other")
        .withColumn("cos", cosine_r9(F.col("ea"), F.col("eb")))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("best"))
    )
    bad = mates.filter(F.col("best") < _SEMDEDUP_THRESHOLD).count()
    assert bad == 0
    # no dropped point lacks candidates entirely
    assert mates.count() == dropped.count()

    # each cluster's minimum id is always kept (it has no lower-id mate)
    min_ids = res.groupBy("cid").agg(F.min("vec_id").alias("vec_id"))
    kept_min = res.join(min_ids, ["cid", "vec_id"]).filter(~F.col("keep")).count()
    assert kept_min == 0


def test_semdedup_rejects_trivial_and_is_deterministic(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    a = sorted(
        semdedup(emb, k=4, iterations=1, threshold=0.3).collect(),
        key=lambda r: r["vec_id"],
    )
    b = sorted(
        semdedup(emb.repartition(7), k=4, iterations=1, threshold=0.3).collect(),
        key=lambda r: r["vec_id"],
    )
    assert [(r["vec_id"], r["cid"], r["keep"]) for r in a] == [
        (r["vec_id"], r["cid"], r["keep"]) for r in b
    ]


def test_semdedup_auto_k_matches_explicit_and_scales(spark, sf_dir):
    """``k=None`` derives k = ceil(n / target_cluster_size) (clamped to
    [2, 4096]) and produces the identical result to passing that k
    explicitly — the auto-scaling path is a parameter derivation, not a
    different algorithm. This is the linear-pair-work posture: a pinned k
    makes the within-cluster join quadratic in the corpus (r12 sf1 sweep:
    k=8 at 10× data → 11.5× wall)."""
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    tgt = 100
    expect_k = max(2, min(4096, -(-n // tgt)))
    assert expect_k > 2  # the derivation must actually engage at test SF

    auto = sorted(
        semdedup(
            emb, iterations=1, threshold=0.3, target_cluster_size=tgt
        ).collect(),
        key=lambda r: r["vec_id"],
    )
    explicit = sorted(
        semdedup(emb, k=expect_k, iterations=1, threshold=0.3).collect(),
        key=lambda r: r["vec_id"],
    )
    assert [(r["vec_id"], r["cid"], r["keep"]) for r in auto] == [
        (r["vec_id"], r["cid"], r["keep"]) for r in explicit
    ]
    # derived k really bounds cluster ids (occupancy is NOT asserted —
    # min-id init + 1 round legitimately leaves clusters empty)
    assert max(r["cid"] for r in auto) < expect_k


# ---------------------------------------------------------------------------
# BPE encode
# ---------------------------------------------------------------------------


def _py_bpe(words: list[str], iters: int):
    """Reference BPE: train merges on the word multiset, return encoded
    lengths per word list — mirrors the placeholder-char formulation."""
    ws = list(words)
    merges = []
    for i in range(iters):
        counts = {}
        for w in ws:
            for j in range(len(w) - 1):
                p = w[j : j + 2]
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(top)
        ws = [w.replace(top, chr(ord("A") + i)) for w in ws]
    return merges, ws


def test_bpe_encode_matches_reference_python(spark):
    docs = spark.createDataFrame(
        [(1, "the cat the hat"), (2, "that thatch"), (3, "x")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bpe_encode_counts(docs, iters=2).collect()}

    all_words = "the cat the hat that thatch x".split()
    merges, _ = _py_bpe(all_words, 2)
    for doc_id, txt in [(1, "the cat the hat"), (2, "that thatch"), (3, "x")]:
        ws = txt.split()
        enc = list(ws)
        for i, m in enumerate(merges):
            enc = [w.replace(m, chr(ord("A") + i)) for w in enc]
        r = out[doc_id]
        assert r["n_words"] == len(ws)
        assert r["n_chars"] == sum(len(w) for w in ws)
        assert r["n_tokens"] == sum(len(w) for w in enc)
        assert r["n_tokens"] <= r["n_chars"]


def test_bpe_encode_consistent_with_trained_merges(spark, sf_dir):
    """Encoding must use the SAME merges bpe_train_merges reports, and each
    applied merge can only shrink the token count."""
    docs = table(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, "doc_id", "text", iters=2).collect()
    assert [m["merge_rank"] for m in merges] == [1, 2]
    enc = bpe_encode_counts(docs, iters=2)
    agg = enc.agg(
        F.sum("n_chars").alias("c"), F.sum("n_tokens").alias("t")
    ).first()
    # total savings = total occurrences actually replaced; at least the
    # first merge's count survives into the rewrite, so savings > 0
    assert agg["t"] < agg["c"]


# ---------------------------------------------------------------------------
# Packing / OOV / bootstrap / DSIR suite-level invariants
# ---------------------------------------------------------------------------


def test_pack2_batch_bounds(spark, sf_dir):
    rows = pack2_length_buckets(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_docs"] <= _PACK_BATCH
        # max_len stays inside its bucket's length band
        assert r["max_len"] // _PACK_BUCKET == r["bucket"]
        assert r["padded_tokens"] == r["n_docs"] * r["max_len"]
        assert r["sum_len"] <= r["padded_tokens"]
        expected_waste = (
            1_000_000 * (r["padded_tokens"] - r["sum_len"])
        ) // max(r["padded_tokens"], 1)
        assert r["waste_ppm"] == expected_waste


def test_tok1_oov_bounds(spark, sf_dir):
    rows = tok1_oov_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0 <= r["oov_ppm"] <= 1_000_000


def test_boot1_ci_ordering(spark, sf_dir):
    r = boot1_bootstrap_ci(spark, sf_dir).first()
    assert r["ci_lo"] <= r["ci_med"] <= r["ci_hi"]
    # CI must bracket a plausible mean-length region (docs are 48..553 chars)
    assert 48 * 1_000_000 <= r["ci_med"] <= 553 * 1_000_000


def test_dsir_selects_target_like_docs(spark, sf_dir):
    """The top-100 by DSIR weight should be dominated by the target slice
    (English docs) — the whole point of importance resampling."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    top = dsir1_importance_select(spark, sf_dir).join(docs, "doc_id")
    counts = {r["lang"]: r["n"] for r in top.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 100
    assert counts.get("en", 0) > 50


def test_semdedup_two_level_falls_back_at_small_k(spark, sf_dir):
    """two_level=True with small derived/explicit k must be output-identical
    to the flat path (it falls back below the literal-argmin threshold), so
    suite entries and small-corpus users see one behavior."""
    emb = table(spark, sf_dir, "embeddings")
    flat = sorted(
        semdedup(emb, k=6, iterations=1, threshold=0.3).collect(),
        key=lambda r: r["vec_id"],
    )
    two = sorted(
        semdedup(emb, k=6, iterations=1, threshold=0.3, two_level=True).collect(),
        key=lambda r: r["vec_id"],
    )
    assert [(r["vec_id"], r["cid"], r["keep"]) for r in flat] == [
        (r["vec_id"], r["cid"], r["keep"]) for r in two
    ]


def test_semdedup_two_level_hierarchical_soundness(spark, sf_dir):
    """Force the hierarchical path (k > literal-argmin threshold): output is
    one row per input, deterministic under repartitioning, every cluster
    keeps its min-id member, and bit-identical embedding pairs that share a
    cluster are deduped (higher id dropped)."""
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    res = semdedup(emb, k=200, iterations=1, threshold=0.3, two_level=True)
    rows = sorted(res.collect(), key=lambda r: r["vec_id"])
    assert len(rows) == n

    rows_b = sorted(
        semdedup(
            emb.repartition(13), k=200, iterations=1, threshold=0.3, two_level=True
        ).collect(),
        key=lambda r: r["vec_id"],
    )
    assert [(r["vec_id"], r["cid"], r["keep"]) for r in rows] == [
        (r["vec_id"], r["cid"], r["keep"]) for r in rows_b
    ]

    # min-id member of every cluster is kept
    best = {}
    for r in rows:
        if r["cid"] not in best or r["vec_id"] < best[r["cid"]][0]:
            best[r["cid"]] = (r["vec_id"], r["keep"])
    assert all(keep for _, keep in best.values())


def test_semdedup_auto_escalates_past_flat_cap(spark):
    """The library DEFAULT (two_level unspecified) must take the two_level
    path automatically when k exceeds the flat cap — identical output to an
    explicit two_level=True, no warning emitted (r13 verdict #1: the
    warn+clamp was the last silent-quadratic door)."""
    import warnings

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        auto = semdedup(df, k=5000, iterations=0, threshold=0.9).collect()
    assert not [x for x in w if "semdedup" in str(x.message)]
    explicit = semdedup(
        df, k=5000, iterations=0, threshold=0.9, two_level=True
    ).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))


def test_semdedup_explicit_flat_past_cap_raises(spark):
    """An EXPLICIT two_level=False past the flat cap raises instead of
    clamping: a clamped k grows per-cluster size with the corpus (quadratic
    pair work, CLAUDE.md pinned-constant rule)."""
    from sparkfusion.errors import PlanError

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(PlanError, match="flat-path cap"):
        semdedup(df, k=5000, iterations=0, threshold=0.9, two_level=False)


def test_semdedup_default_is_flat_below_cap(spark):
    """Below the cap the default and an explicit two_level=False are the
    same flat path — output-identical (auto==flat equivalence pin)."""
    df = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, float(i % 3)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    auto = semdedup(df, k=4, iterations=2, threshold=0.9).collect()
    flat = semdedup(df, k=4, iterations=2, threshold=0.9, two_level=False).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, flat))


def test_semdedup_two_level_preserves_string_ids(spark):
    """sub_cluster_cells must derive the id column's type from the input
    schema (r14 advice): the hierarchical path with STRING ids has to return
    the same type the flat path preserves, not coerce/fail on `vec_id long`."""
    df = spark.createDataFrame(
        [(f"doc-{i:03d}", [float(i), 1.0]) for i in range(30)],
        "doc string, embedding array<double>",
    )
    res = semdedup(
        df, "doc", "embedding", k=20, iterations=1, threshold=0.9,
        two_level=True,
    )
    assert dict(res.dtypes)["vec_id"] == "string"
    rows = res.collect()
    assert len(rows) == 30 and all(r["vec_id"].startswith("doc-") for r in rows)
