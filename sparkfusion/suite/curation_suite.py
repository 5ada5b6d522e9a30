"""Training-data curation suite (round 9): semantic dedup (SemDeDup),
importance resampling (DSIR-style), tokenizer encode + OOV audit,
length-bucketed batch packing, and bootstrap confidence intervals — the
selection/curation layer that sits between the cleaning families
(llm_suite dedup/quality) and the packing/sharding families (llm/chunking).

Reference parity: the reference engine (Rust) has none of these — its users
hand-roll curation outside the engine; this suite makes them first-class
distributed operators. Determinism contract as everywhere in the repo:
integer ppm arithmetic, quantized-integer clustering, md5 membership keys,
round-9 cosines, identical column aliases in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..llm import similarity, text
from ..session import table
from . import register
from ..operators.localrel import inline_rows
from ..operators.partitioning import repartition_for_compute
from .llm_suite import _W, _kmeans_ctes

# ---------------------------------------------------------------------------
# SemDeDup — semantic near-dup pruning via cluster-then-pair
# ---------------------------------------------------------------------------

_SEMDEDUP_THRESHOLD = 0.3


@register(
    "semdedup1_cluster_prune",
    oracle=_kmeans_ctes(k=8, iterations=2, scale_pow=6)
    + f""",
    asg AS (SELECT vec_id, cid FROM af),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE round(list_cosine_similarity(ea.emb, eb.emb), 9)
            >= {_SEMDEDUP_THRESHOLD}
    )
    SELECT s.vec_id, s.cid, (d.vec_id IS NULL) AS keep
    FROM asg s LEFT JOIN dup d ON d.vec_id = s.vec_id
    """,
)
def semdedup1_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): quantized-integer
    k-means clusters the embeddings (k=8, 2 Lloyd's rounds — the bit-exact
    trajectory the km1 oracle already verifies), then near-duplicates are
    searched only WITHIN clusters (equi-join on cluster id — Σ|c|² pairs,
    never n²) and every point with a lower-id cluster-mate at cosine ≥ 0.3
    is dropped. The 100 TB posture is the paper's own: k grows ∝ corpus so
    per-cluster pair blocks stay bounded — the LIBRARY default (``k=None``)
    derives k = ceil(n / 256) for exactly that reason (the r12 sf1 sweep
    measured pinned-k going quadratic: 10× data → 11.5× wall). THIS suite
    entry pins k=8 because the oracle's unrolled Lloyd's CTE chain is a
    static SQL string — it verifies the trajectory bit-for-bit, which needs
    a compile-time k. Oracle replays the full Lloyd's trajectory via the
    shared unrolled CTE chain, then the same min-id keeper rule. See
    :func:`sparkfusion.llm.similarity.semdedup`."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.semdedup(
        emb, "vec_id", "embedding", k=8, iterations=2,
        threshold=_SEMDEDUP_THRESHOLD, scale=6,
    )


def _semdedup_auto_oracle(sf_dir: str) -> str:
    """Oracle for the AUTO-K semdedup entry: derives k exactly like the
    library default (k = max(2, ceil(n / target_cluster_size)) from the
    embeddings row count — parquet footer metadata, no scan) and unrolls the
    Lloyd's CTE chain for THAT k. Different sf → different derived k →
    different SQL, which is the point (r10 verdict #4): the driver-checked
    path is the auto-deriving library path, not a pinned twin."""
    from . import table_rows

    n = table_rows(sf_dir, "embeddings")
    # mirror the library FLAT path exactly. Past k=4096 (~262k embeddings ≈
    # sf100, far beyond every swept SF) the library DEFAULT auto-escalates
    # to the two-level hierarchy whose trajectory this flat unrolled CTE
    # does not model — that regime must FAIL LOUDLY here (degrading the
    # entry to an artifact-visible rows-only check), never produce a wrong
    # flat oracle against a two-level engine result (r15 advice; the clamp
    # that silently diverged is gone).
    k = max(2, -(-n // _SEMDEDUP_AUTO_TCS))
    if k > 4096:
        raise ValueError(
            f"_semdedup_auto_oracle: derived k={k} exceeds the flat-path cap "
            f"4096 (n={n}); the library default escalates to the two-level "
            f"hierarchy here, which this flat unrolled CTE does not model — "
            f"regenerate as a two-level unroll before sweeping this corpus"
        )
    return (
        _kmeans_ctes(k=k, iterations=2, scale_pow=6)
        + f""",
    asg AS (SELECT vec_id, cid FROM af),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE round(list_cosine_similarity(ea.emb, eb.emb), 9)
            >= {_SEMDEDUP_THRESHOLD}
    )
    SELECT s.vec_id, s.cid, (d.vec_id IS NULL) AS keep
    FROM asg s LEFT JOIN dup d ON d.vec_id = s.vec_id
    """
    )


_SEMDEDUP_AUTO_TCS = 64


@register("semdedup2_auto_k", oracle_fn=_semdedup_auto_oracle)
def semdedup2_auto_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup through the LIBRARY DEFAULT auto-k path (``k=None`` →
    k = ceil(n / target_cluster_size), the scale-with-corpus posture): the
    oracle SQL is GENERATED at oracle_sql() time with the same derivation
    from the same parquet footer count, so what the driver verifies is the
    deriving path itself — at sf0.01 (n=500, tcs=64) k=8 and at sf0.1
    (n=2000) k=32, and both must stay green (r10 verdict #4). Same
    cluster-then-pair plan as ``semdedup1_cluster_prune``; Spark's derived
    k counts the checkpointed quantized frame, bit-equal to the footer
    count the oracle uses."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.semdedup(
        emb, "vec_id", "embedding", iterations=2,
        threshold=_SEMDEDUP_THRESHOLD, scale=6,
        target_cluster_size=_SEMDEDUP_AUTO_TCS,
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting
# ---------------------------------------------------------------------------


@register(
    "dsir1_importance_select",
    oracle=f"""
    WITH dw AS (
      SELECT doc_id, lang, unnest({_W}) AS word FROM documents
    ),
    vocab AS (
      SELECT word, count(*) AS c_all,
             count(*) FILTER (WHERE lang = 'en') AS c_t
      FROM dw GROUP BY word
    ),
    tot AS (
      SELECT CAST(sum(c_all) AS BIGINT) AS t_all,
             CAST(sum(c_t) AS BIGINT) AS t_t
      FROM vocab
    ),
    wppm AS (
      SELECT word,
             CAST((1000000 * c_all) // t.t_all AS BIGINT) AS raw_ppm,
             CAST((1000000 * c_t) // t.t_t AS BIGINT) AS tgt_ppm
      FROM vocab CROSS JOIN tot t
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(tgt_ppm - raw_ppm) AS BIGINT) AS dsir_weight
    FROM dw JOIN wppm USING (word)
    GROUP BY doc_id
    ORDER BY dsir_weight DESC, doc_id
    LIMIT 100
    """,
)
def dsir1_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169): score
    every document by how much more its words look like a TARGET
    distribution (here the ``lang='en'`` slice) than like the raw corpus,
    then keep the top-100 by weight. The log-ratio importance weight is
    replaced by its integer surrogate Σ(target_ppm − raw_ppm) over the
    doc's word occurrences — same ranking intent, exact in any engine
    (the lm1/lm2 discipline). Shape: ONE explode (repartitioned by doc_id
    first), one vocab groupBy carrying both distributions' counts in the
    same pass (conditional aggregation — not two scans), scalar totals
    broadcast, AQE handles stopword skew on the scoring join, and the
    selection is a TakeOrderedAndProject."""
    docs = table(spark, sf_dir, "documents")
    w = (
        repartition_for_compute(docs, "doc_id")
        .select(
            "doc_id", "lang",
            F.explode(text.words(F.lower(F.col("text")))).alias("word"),
        )
    )
    vocab = w.groupBy("word").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c_t"),
    )
    tot = vocab.agg(
        F.sum("c_all").alias("t_all"), F.sum("c_t").alias("t_t")
    )
    wppm = vocab.crossJoin(F.broadcast(tot)).select(
        "word",
        F.expr("(1000000 * c_all) div t_all").alias("raw_ppm"),
        F.expr("(1000000 * c_t) div t_t").alias("tgt_ppm"),
    )
    return (
        w.join(wppm, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.col("tgt_ppm") - F.col("raw_ppm")).alias("dsir_weight"),
        )
        .orderBy(F.col("dsir_weight").desc(), "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# BPE encode — the apply half of the tokenizer lifecycle
# ---------------------------------------------------------------------------


@register(
    "bpe3_encode_counts",
    oracle=f"""
    WITH dw AS (
      SELECT doc_id, unnest({_W}) AS word FROM documents
    ),
    p1 AS (
      SELECT substr(word, CAST(t.i AS INT), 2) AS pair, count(*) AS n
      FROM dw, UNNEST(generate_series(1, length(word) - 1)) AS t(i)
      GROUP BY pair
    ),
    m1 AS (SELECT pair FROM p1 ORDER BY n DESC, pair LIMIT 1),
    w2 AS (SELECT replace(word, (SELECT pair FROM m1), 'A') AS word FROM dw),
    p2 AS (
      SELECT substr(word, CAST(t.i AS INT), 2) AS pair, count(*) AS n
      FROM w2, UNNEST(generate_series(1, length(word) - 1)) AS t(i)
      GROUP BY pair
    ),
    m2 AS (SELECT pair FROM p2 ORDER BY n DESC, pair LIMIT 1),
    enc AS (
      SELECT doc_id, count(*) AS n_words,
             sum(length(word)) AS n_chars,
             sum(length(replace(replace(word, (SELECT pair FROM m1), 'A'),
                                (SELECT pair FROM m2), 'B'))) AS n_tokens
      FROM dw GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(e.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(e.n_chars, 0) AS BIGINT) AS n_chars,
           CAST(COALESCE(e.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents d LEFT JOIN enc e USING (doc_id)
    """,
)
def bpe3_encode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer ENCODE: train two merges (the bpe2 loop) and apply them
    to every document, reporting per-doc word/char/BPE-token counts — the
    train → encode → count lifecycle a tokenizer build actually ships. The
    encode pass is map-only (merge ranks embedded as nested replace
    literals, sequential aggregate over the word array — no explode); the
    oracle replays training as chained CTEs (bpe2's pinned replace
    semantics) and encodes with scalar-subquery merge pairs. See
    :func:`sparkfusion.llm.text.bpe_encode_counts`."""
    docs = table(spark, sf_dir, "documents")
    return text.bpe_encode_counts(docs, "doc_id", "text", iters=2)


# ---------------------------------------------------------------------------
# Vocabulary OOV audit
# ---------------------------------------------------------------------------


@register(
    "tok1_oov_rate",
    oracle=f"""
    WITH dw AS (
      SELECT doc_id, unnest({_W}) AS word FROM documents
    ),
    vocab AS (
      SELECT word FROM (
        SELECT word, count(*) AS c FROM dw GROUP BY word
        ORDER BY c DESC, word LIMIT 500
      )
    )
    SELECT dw.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE v.word IS NULL) AS BIGINT) AS n_oov,
           CAST((1000000 * count(*) FILTER (WHERE v.word IS NULL))
                // count(*) AS BIGINT) AS oov_ppm
    FROM dw LEFT JOIN vocab v ON v.word = dw.word
    GROUP BY dw.doc_id
    """,
)
def tok1_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage audit: build a top-500 word vocabulary
    ((count DESC, word) total order — the boundary tie is deterministic) and
    report each document's out-of-vocabulary token fraction in integer ppm —
    the pre-training check that catches corpora whose tokenizer would
    explode into byte fallbacks. Shape: one vocab groupBy +
    TakeOrderedAndProject (bounded at 500 rows → broadcast), one broadcast
    LEFT join on the word stream, one per-doc aggregation."""
    docs = table(spark, sf_dir, "documents")
    w = repartition_for_compute(docs, "doc_id").select(
        "doc_id", F.explode(text.words(F.lower(F.col("text")))).alias("word")
    )
    vocab = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "word")
        .limit(500)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    return (
        w.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id", "n_tokens", "n_oov",
            F.expr("(1000000 * n_oov) div n_tokens").alias("oov_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Length-bucketed batch packing
# ---------------------------------------------------------------------------

_PACK_BUCKET = 32  # token-length bucket width
_PACK_BATCH = 8    # docs per training batch


@register(
    "pack2_length_buckets",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len({_W}) AS n_tok FROM documents
    ),
    r AS (
      SELECT doc_id, n_tok, n_tok // {_PACK_BUCKET} AS bucket,
             row_number() OVER (
               PARTITION BY n_tok // {_PACK_BUCKET} ORDER BY doc_id
             ) AS rn
      FROM d
    ),
    g AS (
      SELECT bucket, CAST((rn - 1) // {_PACK_BATCH} AS BIGINT) AS batch_id,
             n_tok
      FROM r
    )
    SELECT bucket, batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tok) AS BIGINT) AS max_len,
           CAST(sum(n_tok) AS BIGINT) AS sum_len,
           CAST(count(*) * max(n_tok) AS BIGINT) AS padded_tokens,
           CAST((1000000 * (count(*) * max(n_tok) - sum(n_tok)))
                // greatest(count(*) * max(n_tok), 1) AS BIGINT) AS waste_ppm
    FROM g GROUP BY bucket, batch_id
    """,
)
def pack2_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed BATCH packing — the padding-minimization step of
    every sequence-training loader: bucket documents by token-length band
    (width 32), form fixed-size batches of 8 inside each bucket in
    deterministic doc_id order, and report per-batch padded-token cost and
    waste ppm (what fraction of the batch tensor is pad). Complements
    ``pack_training_sequences`` (concat-and-chunk) with the
    variable-length/padded regime. Shape: one map pass for lengths, one
    per-bucket window (at 100 TB: repartitionByRange on (bucket, doc_id) —
    each bucket's row_number is a within-partition scan, no global sort),
    one batch groupBy. All-integer outputs."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(text.words(F.lower(F.col("text")))).cast("long").alias("n_tok"),
    ).withColumn("bucket", F.expr(f"n_tok div {_PACK_BUCKET}"))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    g = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "batch_id", F.expr(f"CAST((rn - 1) div {_PACK_BATCH} AS BIGINT)")
    )
    return (
        g.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tok").alias("max_len"),
            F.sum("n_tok").alias("sum_len"),
        )
        .select(
            "bucket", "batch_id", "n_docs", "max_len", "sum_len",
            (F.col("n_docs") * F.col("max_len")).alias("padded_tokens"),
            F.expr(
                "(1000000 * (n_docs * max_len - sum_len))"
                " div greatest(n_docs * max_len, 1)"
            ).alias("waste_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Bootstrap confidence interval
# ---------------------------------------------------------------------------

_BOOT_B = 100  # bootstrap replicates


@register(
    "boot1_bootstrap_ci",
    oracle=f"""
    WITH rep AS (
      SELECT d.doc_id, d.n_chars, t.b,
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '-' ||
                                 CAST(t.b AS VARCHAR)), 1, 8))::BIGINT % 3 AS w
      FROM documents d,
           UNNEST(generate_series(0, {_BOOT_B - 1})) AS t(b)
    ),
    means AS (
      SELECT b,
             CAST((1000000 * sum(w * n_chars))
                  // greatest(sum(w), 1) AS BIGINT) AS mean_u
      FROM rep GROUP BY b
    ),
    ranked AS (
      SELECT b, mean_u,
             row_number() OVER (ORDER BY mean_u, b) AS rn
      FROM means
    )
    SELECT CAST(max(CASE WHEN rn = 3 THEN mean_u END) AS BIGINT) AS ci_lo,
           CAST(max(CASE WHEN rn = 50 THEN mean_u END) AS BIGINT) AS ci_med,
           CAST(max(CASE WHEN rn = 98 THEN mean_u END) AS BIGINT) AS ci_hi
    FROM ranked
    """,
)
def boot1_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for a corpus statistic (mean document
    length), fully deterministic: {_BOOT_B} replicates where each document's
    multiplicity in replicate b is ``md5(doc_id-b) % 3`` ∈ {{0,1,2}} (mean 1
    — the integer surrogate for Poisson(1) resampling, the standard
    bag-of-little-bootstraps trick at scale), replicate means in exact
    integer micro-chars, and the CI endpoints read off the (mean, b)-ranked
    replicate list at ranks 3/50/98 (≈2.5%/50%/97.5% of B=100). Shape: ONE
    scan exploded ×B after a doc_id repartition, a B-group map-side-
    combinable aggregation (shuffle carries B×partitions partial rows), and
    a 100-row window. No RNG, no collect."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    rep = repartition_for_compute(docs, "doc_id").select(
        "doc_id", "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    w = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("-", F.col("doc_id").cast("string"),
                                  F.col("b").cast("string"))),
                1, 8,
            ), 16, 10,
        ).cast("long") % 3
    )
    means = (
        rep.withColumn("w", w)
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("n_chars")).alias("sx"),
            F.sum("w").alias("sw"),
        )
        .select(
            "b",
            F.expr("(1000000 * sx) div greatest(sw, 1)").alias("mean_u"),
        )
    )
    ranked = means.withColumn(
        "rn", F.row_number().over(Window.orderBy("mean_u", "b"))
    )
    return ranked.agg(
        F.max(F.when(F.col("rn") == 3, F.col("mean_u"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == 50, F.col("mean_u"))).alias("ci_med"),
        F.max(F.when(F.col("rn") == 98, F.col("mean_u"))).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Temperature mixture sampling
# ---------------------------------------------------------------------------


@register(
    "mix2_temperature_sample",
    oracle="""
    WITH actual AS (
      SELECT lang, count(*) AS n_l FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(sum(n_l) AS BIGINT) AS n FROM actual),
    q AS (
      SELECT lang, n_l, t.n,
             CAST(round(1000000000 * sqrt(CAST(n_l AS DOUBLE)
                                          / CAST(t.n AS DOUBLE))) AS BIGINT)
               AS ql
      FROM actual CROSS JOIN tot t
    ),
    qs AS (SELECT CAST(sum(ql) AS BIGINT) AS qsum FROM q),
    rates AS (
      SELECT lang,
             CAST(least(
               1000000,
               (CAST(1000000 AS HUGEINT) * ql * n) // (CAST(qsum AS HUGEINT) * n_l)
             ) AS BIGINT) AS rate_ppm
      FROM q CROSS JOIN qs
    )
    SELECT d.doc_id, d.lang, r.rate_ppm
    FROM documents d JOIN rates r USING (lang)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          % 1000000 < r.rate_ppm
    """,
)
def mix2_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sqrt-temperature (τ=0.5) multilingual mixture sampling: target shares
    DERIVED as p ∝ √(actual share) — the XLM-R-style low-resource upsampling
    rule — with no hand-written target table (contrast mix1). √ is the one
    power that is IEEE-correctly-rounded in every engine, and it is
    quantized to an integer before the normalizer sum, so rates and
    membership are bit-identical across engines and partitionings. See
    :func:`sparkfusion.llm.chunking.temperature_rebalance`."""
    from ..llm.chunking import temperature_rebalance

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_rebalance(docs).select("doc_id", "lang", "rate_ppm")


@register(
    "tok2_vocab_sweep",
    oracle=f"""
    WITH dw AS (
      SELECT doc_id, unnest({_W}) AS word FROM documents
    ),
    vocab AS (
      SELECT word, count(*) AS c,
             row_number() OVER (ORDER BY count(*) DESC, word) AS rnk
      FROM dw GROUP BY word
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM vocab),
    sizes AS (SELECT unnest([100, 200, 300, 400, 500]) AS vocab_size)
    SELECT s.vocab_size,
           t.n_tok,
           CAST(sum(CASE WHEN v.rnk > s.vocab_size THEN v.c ELSE 0 END)
                AS BIGINT) AS n_oov,
           CAST((1000000 * sum(CASE WHEN v.rnk > s.vocab_size THEN v.c
                                    ELSE 0 END)) // t.n_tok AS BIGINT)
             AS oov_ppm
    FROM sizes s CROSS JOIN vocab v CROSS JOIN tot t
    GROUP BY s.vocab_size, t.n_tok
    """,
)
def tok2_vocab_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-size sweep: corpus-wide OOV rate at candidate vocab sizes
    100/200/…/500 from ONE frequency pass — the qf1-style grid that picks a
    tokenizer vocab size without re-scanning 100 TB per candidate. Every
    word carries its frequency rank ((count DESC, word) total order); a
    word's occurrences are OOV at size s iff rank > s, so the whole curve
    is a conditional aggregation over the vocab × 5-row grid (the grid
    joins the VOCAB aggregate, never the token stream — the cross join is
    |vocab|×5, shuffle-free after broadcast)."""
    docs = table(spark, sf_dir, "documents")
    w = repartition_for_compute(docs, "doc_id").select(
        "doc_id", F.explode(text.words(F.lower(F.col("text")))).alias("word")
    )
    from ..operators.ranks import global_rank

    # frequency rank via the distributable global_rank (unique (c, word)
    # composite ⇒ rank == row_number); the vocab frame no longer funnels
    # through a single-reducer window at any corpus size
    vocab = global_rank(
        w.groupBy("word").agg(F.count(F.lit(1)).alias("c")),
        ["c", "word"],
        ascending=[False, True],
        out="rnk",
    )
    tot = vocab.agg(F.sum("c").alias("n_tok"))
    sizes = inline_rows(
        spark, [(100,), (200,), (300,), (400,), (500,)], "vocab_size int"
    )
    return (
        vocab.crossJoin(F.broadcast(sizes))
        .crossJoin(F.broadcast(tot))
        .groupBy("vocab_size", "n_tok")
        .agg(
            F.sum(
                F.when(F.col("rnk") > F.col("vocab_size"), F.col("c")).otherwise(
                    F.lit(0)
                )
            ).alias("n_oov")
        )
        .select(
            "vocab_size", "n_tok", "n_oov",
            F.expr("(1000000 * n_oov) div n_tok").alias("oov_ppm"),
        )
    )
